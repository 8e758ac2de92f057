"""Microbenchmark: hot-apply variants for the condensed 3D MCS operator.

Round-3 perf work (VERDICT.md next-round item 1).  Measures candidate
formulations of y = A u (per-element dense blocks) on the real chip at
exact bench shapes, with CHAINED applies inside one jitted fori_loop so
dispatch overhead and async-queue artifacts cannot pollute the numbers,
under both matmul precision settings (the Krylov path needs 'highest';
'default' silently computes in bf16 on TPU).

Run:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/microbench_apply.py [maxh]
"""

import sys
import time
from functools import partial

import jax

jax.config.update("jax_platforms", "axon,cpu")
try:
    if jax.devices()[0].platform != "cpu":
        jax.config.update("jax_compilation_cache_dir", "/tmp/nstpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
except Exception:
    pass
import jax.numpy as jnp
import numpy as np

from navier_stokes_tpu.fem.hdiv3d import HDiv3D
from navier_stokes_tpu.mesh import channel_with_cylinder_mesh_3d
from navier_stokes_tpu.models.stokes_hybrid3d import (
    HybridVelocitySpace3D,
    VectorFacet3D,
)
from navier_stokes_tpu.ops import assembly as asm

MAXH = float(sys.argv[1]) if len(sys.argv) > 1 else 0.09
K = 50  # chained applies per timed call


def timed_chain(apply_fn, u, k=K, reps=3):
    """Median seconds per apply, measured as k chained applies in one jit."""

    @jax.jit
    def chain(u):
        def body(i, v):
            w = apply_fn(v)
            return w / jnp.linalg.norm(w)

        return jax.lax.fori_loop(0, k, body, u)

    out = chain(u)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = chain(u)
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) / k)
    return sorted(ts)[len(ts) // 2], out


def build_face_apply(mesh, V, F, Xv, A_np):
    """Scatter-free face-block apply: block gathers + sibling sums."""
    ne, nface = mesh.ne, mesh.nface
    nfd_v, n_int, nfd_f = V.n_face_dofs, V.bases[0].n_cell, F.n_face
    nfb = nfd_v + nfd_f
    off_c = nface * nfd_v
    nhd = V.ndof
    efaces = np.asarray(mesh.element_faces)

    perm = np.concatenate(
        [
            np.concatenate(
                [lf * nfd_v + np.arange(nfd_v),
                 4 * nfd_v + n_int + lf * nfd_f + np.arange(nfd_f)]
            )
            for lf in range(4)
        ]
        + [4 * nfd_v + np.arange(n_int)]
    )
    A_perm = jnp.asarray(A_np[:, perm[:, None], perm[None, :]])

    pos = np.full((nface, 2), ne * 4, np.int64)
    cnt = np.zeros(nface, np.int64)
    flat = efaces.ravel()
    order = np.argsort(flat, kind="stable")
    srt = flat[order]
    first = np.searchsorted(srt, np.arange(nface), side="left")
    last = np.searchsorted(srt, np.arange(nface), side="right")
    pos[:, 0] = np.where(last > first, order[np.minimum(first, len(order) - 1)], ne * 4)
    pos[:, 1] = np.where(
        last - first > 1, order[np.minimum(first + 1, len(order) - 1)], ne * 4
    )
    pos_j = jnp.asarray(pos, jnp.int32)
    efaces_j = jnp.asarray(efaces, jnp.int32)

    def face_apply(u):
        uf1 = u[:off_c].reshape(nface, nfd_v)
        ui = u[off_c:nhd].reshape(ne, n_int)
        uf2 = u[nhd:].reshape(nface, nfd_f)
        uF = jnp.concatenate([uf1, uf2], axis=1)
        ue = jnp.concatenate([uF[efaces_j].reshape(ne, 4 * nfb), ui], axis=1)
        ye = jnp.einsum("eij,ej->ei", A_perm, ue)
        yf = ye[:, : 4 * nfb].reshape(ne * 4, nfb)
        yf = jnp.concatenate([yf, jnp.zeros((1, nfb), yf.dtype)])
        yF = yf[pos_j[:, 0]] + yf[pos_j[:, 1]]
        return jnp.concatenate(
            [yF[:, :nfd_v].reshape(-1), ye[:, 4 * nfb:].reshape(-1),
             yF[:, nfd_v:].reshape(-1)]
        )

    return face_apply


def main():
    mesh = channel_with_cylinder_mesh_3d(MAXH)
    V = HDiv3D(mesh, 2)
    F = VectorFacet3D(mesh, 1)
    Xv = HybridVelocitySpace3D(V, F)
    ne, nface, n = mesh.ne, mesh.nface, Xv.ndof
    eldofs = np.asarray(Xv.element_dofs)
    nb = eldofs.shape[1]
    mb = ne * nb * nb * 4 / 1e6
    print(f"maxh={MAXH} ne={ne} nface={nface} ndof={n} nb={nb} "
          f"A={mb:.0f}MB -> SoL ~{mb/819e3*1e3:.3f} ms", flush=True)

    rng = np.random.default_rng(0)
    A_np = rng.standard_normal((ne, nb, nb)).astype(np.float32)
    A = jnp.asarray(A_np)
    u = jnp.asarray(rng.standard_normal(n), jnp.float32)
    eldofs_j = jnp.asarray(eldofs)
    print("device:", jax.devices()[0], flush=True)

    face_apply = build_face_apply(mesh, V, F, Xv, A_np)

    for prec in ["default", "highest"]:
        jax.config.update("jax_default_matmul_precision", prec)
        print(f"--- matmul precision = {prec}", flush=True)

        t, y1 = timed_chain(
            lambda v: asm.apply_local_matrices(A, eldofs_j, n, v), u
        )
        print(f"  gather-einsum-scatter: {t*1e3:.3f} ms", flush=True)

        t, y3 = timed_chain(face_apply, u)
        err = float(jnp.linalg.norm(y3 - y1) / jnp.linalg.norm(y1))
        print(f"  face-block apply:      {t*1e3:.3f} ms  chain-dev {err:.2e}",
              flush=True)

        # einsum-only lower bound (no gather/scatter, fake locality)
        ue0 = u[eldofs_j]

        @jax.jit
        def chain_e(ue):
            def body(i, v):
                w = jnp.einsum("eij,ej->ei", A, v)
                return w / jnp.linalg.norm(w)

            return jax.lax.fori_loop(0, K, body, ue)

        out = chain_e(ue0)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = chain_e(ue0)
        jax.block_until_ready(out)
        print(f"  einsum only:           {(time.perf_counter()-t0)/K*1e3:.3f} ms",
              flush=True)


if __name__ == "__main__":
    main()
