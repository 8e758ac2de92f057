"""Microbenchmark phase 2: batched-matvec layout variants.

Phase 1 (microbench_apply.py) showed the face-block gather/scatter fix
(7.0 -> 1.05 ms) and left the batched matvec einsum (ne,54,54)x(ne,54) as
the bottleneck at 0.67 ms — 6x off the 0.11 ms HBM bound, because the
54-wide minor dim wastes lanes.  This phase measures:

  1. SoA einsum:  A2 (nb,nb,ne) contracted as 'ije,je->ie' (ne on lanes)
  2. full face-block apply in SoA layout (gather AoS -> transpose)
  3. Pallas kernel over SoA tiles

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/microbench_apply2.py
"""

import sys
import time

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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from navier_stokes_tpu.fem.hdiv3d import HDiv3D
from navier_stokes_tpu.mesh import channel_with_cylinder_mesh_3d
from navier_stokes_tpu.models.stokes_hybrid3d import (
    HybridVelocitySpace3D,
    VectorFacet3D,
)
from navier_stokes_tpu.ops.faceblock import FaceBlockLayout

MAXH = float(sys.argv[1]) if len(sys.argv) > 1 else 0.09
K = 50


def timed_chain(apply_fn, u, k=K, reps=3):
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


def main():
    mesh = channel_with_cylinder_mesh_3d(MAXH)
    V = HDiv3D(mesh, 2)
    F = VectorFacet3D(mesh, 1)
    Xv = HybridVelocitySpace3D(V, F)
    lay = FaceBlockLayout(Xv)
    ne, n = mesh.ne, Xv.ndof
    nb = lay.nb
    print(f"ne={ne} ndof={n} nb={nb}", flush=True)
    print("device:", jax.devices()[0], flush=True)
    jax.config.update("jax_default_matmul_precision", "highest")

    rng = np.random.default_rng(0)
    A_np = rng.standard_normal((ne, nb, nb)).astype(np.float32)
    u = jnp.asarray(rng.standard_normal(n), jnp.float32)

    TILE = 256
    ne_p = ((ne + TILE - 1) // TILE) * TILE
    A_pad = np.zeros((ne_p, nb, nb), np.float32)
    A_pad[:ne] = lay.permute_blocks(A_np)
    A2 = jnp.asarray(np.ascontiguousarray(A_pad.transpose(1, 2, 0)))  # (nb,nb,nep)

    # 1. SoA einsum only
    ueT0 = jnp.asarray(rng.standard_normal((nb, ne_p)), jnp.float32)

    @jax.jit
    def chain_soa(ue):
        def body(i, v):
            w = jnp.einsum("ije,je->ie", A2, v)
            return w / jnp.linalg.norm(w)

        return jax.lax.fori_loop(0, K, body, ue)

    out = chain_soa(ueT0)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = chain_soa(ueT0)
    jax.block_until_ready(out)
    print(f"SoA einsum only:   {(time.perf_counter()-t0)/K*1e3:.3f} ms",
          flush=True)

    # 2. full apply, SoA einsum with transposes around the face gathers
    def face_apply_soa(u):
        uF, ui = lay.split(u)
        ue = lay.gather_elem(uF, ui)  # (ne, nb) AoS
        ueT = jnp.concatenate(
            [ue, jnp.zeros((ne_p - ne, nb), ue.dtype)]
        ).T  # (nb, nep)
        yeT = jnp.einsum("ije,je->ie", A2, ueT)
        ye = yeT.T[:ne]
        yF, yi = lay.scatter_elem(ye)
        return lay.join(yF, yi)

    t, y2 = timed_chain(face_apply_soa, u)
    print(f"face apply (SoA):  {t*1e3:.3f} ms", flush=True)

    # 3. Pallas kernel on SoA tiles: explicit multiply-reduce on the VPU
    # (Mosaic cannot lower a batched dot_general; 'ije,je->ie' has a batch
    # dim e).  y[i, e] = sum_j A[i, j, e] * u[j, e].
    def mv_kernel(a_ref, u_ref, o_ref):
        a = a_ref[:]
        u = u_ref[:]
        o_ref[:] = jnp.sum(a * u[None, :, :], axis=1)

    grid = (ne_p // TILE,)
    pallas_mv = pl.pallas_call(
        mv_kernel,
        out_shape=jax.ShapeDtypeStruct((nb, ne_p), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((nb, nb, TILE), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nb, TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
    )

    def face_apply_pallas(u):
        uF, ui = lay.split(u)
        ue = lay.gather_elem(uF, ui)
        ueT = jnp.concatenate(
            [ue, jnp.zeros((ne_p - ne, nb), ue.dtype)]
        ).T
        yeT = pallas_mv(A2, ueT)
        ye = yeT.T[:ne]
        yF, yi = lay.scatter_elem(ye)
        return lay.join(yF, yi)

    t, y3 = timed_chain(face_apply_pallas, u)
    dev = float(jnp.linalg.norm(y3 - y2) / jnp.linalg.norm(y2))
    print(f"face apply Pallas: {t*1e3:.3f} ms  dev {dev:.2e}", flush=True)


if __name__ == "__main__":
    main()
