"""Microbenchmark phase 3: tile-contiguous Pallas batched block matvec.

Phase 2 (microbench_apply2.py) measured the batched matvec einsum at
0.62-0.67 ms for 90 MB of element blocks (HBM bound 0.11 ms) in both AoS
(ne,nb,nb) and SoA (nb,nb,ne) layouts, and a naive SoA Pallas kernel at
0.85 ms — the (nb, nb, TILE) block of a (nb, nb, ne_p) array is ~3k
separate 1 KB DMA segments per grid step.  This phase measures the
TILE-CONTIGUOUS packing of ops/pallas_mv.py: (ntile, nb, nb, TILE) with
the element index innermost, one dense contiguous DMA per grid step.

Variants:
  1. einsum AoS (the current elem_apply)            -- baseline
  2. tiled_bmv kernel only (SoA in/out)
  3. full face apply via tiled_bmv (AoS<->SoA transposes included)
  4. split (hi+lo) apply: two einsums vs one tiled_bmv_multi

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/microbench_apply3.py [maxh] [tile]
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

from navier_stokes_tpu.fem.hdiv3d import HDiv3D
from navier_stokes_tpu.mesh import channel_with_cylinder_mesh_3d
from navier_stokes_tpu.models.stokes_hybrid3d import (
    HybridVelocitySpace3D,
    VectorFacet3D,
)
from navier_stokes_tpu.ops.faceblock import FaceBlockLayout
from navier_stokes_tpu.ops.pallas_mv import pack_tiles, tiled_bmv, tiled_bmv_multi

MAXH = float(sys.argv[1]) if len(sys.argv) > 1 else 0.09
TILE = int(sys.argv[2]) if len(sys.argv) > 2 else 256
K = 50


def timed(fn, *args, k=K, reps=3):
    # marginal slope between two chain lengths: a single chain's t/K
    # carries the ~29 ms fixed tunnel-execution overhead (~0.6 ms/it at
    # K=50), which buried the kernel's true rate (505 vs the reported
    # 136 GB/s) in the session-4 runs
    def make_chain(K):
        @jax.jit
        def chain(*a):
            def body(i, v):
                w = fn(*((v,) + a[1:]))
                return w / jnp.linalg.norm(w.ravel()[:1024])

            return jax.lax.fori_loop(0, K, body, a[0])

        return chain

    k1, k2 = 10, k + 10
    c1, c2 = make_chain(k1), make_chain(k2)

    def best(chain):
        out = chain(*args)
        jax.block_until_ready(out)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = chain(*args)
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[len(ts) // 2], out

    t1, _ = best(c1)
    t2, out = best(c2)
    return (t2 - t1) / (k2 - k1), out


def main():
    mesh = channel_with_cylinder_mesh_3d(MAXH)
    V = HDiv3D(mesh, 2)
    F = VectorFacet3D(mesh, 1)
    Xv = HybridVelocitySpace3D(V, F)
    lay = FaceBlockLayout(Xv)
    ne, n, nb = mesh.ne, Xv.ndof, lay.nb
    ntile = -(-ne // TILE)
    ne_p = ntile * TILE
    gb = ne * nb * nb * 4 / 1e9
    print(f"ne={ne} ndof={n} nb={nb} tile={TILE} blocks={gb*1e3:.1f} MB",
          flush=True)
    print("device:", jax.devices()[0], flush=True)
    jax.config.update("jax_default_matmul_precision", "highest")

    rng = np.random.default_rng(0)
    A_np = lay.permute_blocks(
        rng.standard_normal((ne, nb, nb)).astype(np.float32))
    A_lo_np = (1e-7 * rng.standard_normal((ne, nb, nb))).astype(np.float32)
    u = jnp.asarray(rng.standard_normal(n), jnp.float32)

    A_aos = jnp.asarray(A_np)
    A_lo_aos = jnp.asarray(lay.permute_blocks(A_lo_np))
    A_t = jnp.asarray(pack_tiles(A_np, TILE))
    A_lo_t = jnp.asarray(pack_tiles(lay.permute_blocks(A_lo_np), TILE))
    x_soa = jnp.asarray(rng.standard_normal((nb, ne_p)), jnp.float32)

    # 1. einsum AoS (current elem_apply core)
    def mv_aos(ue):
        return jnp.einsum("eij,ej->ei", A_aos, ue)

    t, _ = timed(mv_aos, x_soa.T[:ne])
    print(f"einsum AoS matvec:      {t*1e3:.3f} ms "
          f"({gb/t:.0f} GB/s)", flush=True)

    # 2. tiled Pallas kernel only
    t, y_k = timed(lambda x: tiled_bmv(A_t, x), x_soa)
    want = jnp.einsum("eij,ej->ei", A_aos, x_soa.T[:ne])
    dev = float(jnp.linalg.norm(y_k.T[:ne] - want) / jnp.linalg.norm(want))
    print(f"tiled_bmv kernel only:  {t*1e3:.3f} ms "
          f"({gb/t:.0f} GB/s)  dev {dev:.2e}", flush=True)

    # 3. full face apply via the kernel (transposes + gathers included)
    def face_apply_tiled(u):
        uF, ui = lay.split(u)
        ue = lay.gather_elem(uF, ui)
        ueT = jnp.concatenate(
            [ue, jnp.zeros((ne_p - ne, nb), ue.dtype)]).T
        yeT = tiled_bmv(A_t, ueT)
        ye = yeT.T[:ne]
        yF, yi = lay.scatter_elem(ye)
        return lay.join(yF, yi)

    def face_apply_einsum(u):
        uF, ui = lay.split(u)
        ue = lay.gather_elem(uF, ui)
        ye = jnp.einsum("eij,ej->ei", A_aos, ue)
        yF, yi = lay.scatter_elem(ye)
        return lay.join(yF, yi)

    t0, y_e = timed(face_apply_einsum, u)
    t1, y_t = timed(face_apply_tiled, u)
    dev = float(jnp.linalg.norm(y_t - y_e) / jnp.linalg.norm(y_e))
    print(f"face apply einsum:      {t0*1e3:.3f} ms", flush=True)
    print(f"face apply tiled_bmv:   {t1*1e3:.3f} ms  dev {dev:.2e}",
          flush=True)

    # 4. split (hi+lo) apply
    def split_einsum(ue):
        return (jnp.einsum("eij,ej->ei", A_aos, ue)
                + jnp.einsum("eij,ej->ei", A_lo_aos, ue))

    t0, _ = timed(split_einsum, x_soa.T[:ne])
    t1, y_m = timed(lambda x: tiled_bmv_multi(A_t, A_lo_t, x), x_soa)
    want = split_einsum(x_soa.T[:ne])
    dev = float(jnp.linalg.norm(y_m.T[:ne] - want) / jnp.linalg.norm(want))
    print(f"split einsum (2x):      {t0*1e3:.3f} ms ({2*gb/t0:.0f} GB/s)",
          flush=True)
    print(f"tiled_bmv_multi:        {t1*1e3:.3f} ms ({2*gb/t1:.0f} GB/s)  "
          f"dev {dev:.2e}", flush=True)


if __name__ == "__main__":
    main()
