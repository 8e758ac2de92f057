"""Microbenchmark phase 4: DMA/stream efficiency of the tiled batched matvec.

Phase 3 (ops/pallas_mv.py) got the tile-contiguous kernel to 0.80 ms for a
90 MB table stream — ~112 GB/s of the chip's 819 GB/s, and XLA's einsum
sits in the same band.  The compute is negligible; the hypothesis is that
ONE sequential block-DMA pipeline rides a single DMA engine/stream and
saturating HBM needs several DMAs in flight.  Variants measured here, all
on the same synthetic bench-shaped tables ((7740, 54, 54) f32 blocks):

  1. XLA colsum  — jnp reduction over the packed table (XLA's own stream)
  2. bmv tile=T  — the production kernel at tile sizes 128..1024
  3. splitK      — table pre-split into K interleaved operand arrays, one
                   kernel invocation, K block-DMAs in flight per grid step
  4. megablock   — K tiles per grid step as one bigger block (fewer, larger
                   DMAs)

Run: python -u scripts/microbench_dma.py [nblk [nb]]
"""

import functools
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

sys.path.insert(0, "/root/repo")
from navier_stokes_tpu.ops.pallas_mv import _bmv, pack_tiles  # noqa: E402

NBLK = int(sys.argv[1]) if len(sys.argv) > 1 else 7740
NB = int(sys.argv[2]) if len(sys.argv) > 2 else 54
K_CHAIN = 50


def timed(label, fn, x, gb):
    # MARGINAL per-apply cost from two chain lengths: each tunnel execution
    # carries a ~29 ms fixed overhead (dispatch + sync), so a single
    # chain's t/K overstates the apply several-fold at these sizes — the
    # round-3 session-4 numbers (~112 GB/s) were exactly that artifact;
    # the marginal slope puts the same kernel at ~505 GB/s of the chip's
    # 819 (measured 2026-08-18).
    def make_chain(K):
        @jax.jit
        def chain(v):
            def body(i, w):
                y = fn(w)
                return y / jnp.maximum(
                    jnp.linalg.norm(y.ravel()[:256]), 1e-30)

            return jax.lax.fori_loop(0, K, body, v)

        return chain

    K1, K2 = 10, K_CHAIN + 10
    try:
        c1, c2 = make_chain(K1), make_chain(K2)

        def best(chain):
            out = chain(x)
            jax.block_until_ready(out)
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                out = chain(x)
                jax.block_until_ready(out)
                ts.append(time.perf_counter() - t0)
            return sorted(ts)[1]

        t1, t2 = best(c1), best(c2)
        dt = (t2 - t1) / (K2 - K1)
        print(f"  {label:28s} {dt*1e3:7.3f} ms  {gb/dt:7.1f} GB/s  "
              f"(chain{K1} {t1*1e3:6.1f} ms)", flush=True)
    except Exception as e:
        print(f"  {label:28s} FAILED {repr(e)[:100]}", flush=True)


def _zero(i):
    return i - i


def _mv_kernel(x_ref, a_ref, o_ref):
    o_ref[:] = _bmv(a_ref[0], x_ref[:])


def make_bmv(A_t):
    ntile, m, nb, tile = A_t.shape

    @jax.jit
    def apply(x):
        return pl.pallas_call(
            _mv_kernel,
            out_shape=jax.ShapeDtypeStruct((m, ntile * tile), jnp.float32),
            grid=(ntile,),
            in_specs=[
                pl.BlockSpec((nb, tile), lambda i: (_zero(i), i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, m, nb, tile),
                             lambda i: (i, _zero(i), _zero(i), _zero(i)),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((m, tile), lambda i: (_zero(i), i),
                                   memory_space=pltpu.VMEM),
        )(x, A_t)

    return apply


def _mv_kernel_splitk_seq(k, x_ref, *refs):
    # sub j holds CONSECUTIVE tile groups: sub j tile i = global tile i*k+j
    a_refs, o_refs = refs[:k], refs[k:]
    for j, (a_ref, o_ref) in enumerate(zip(a_refs, o_refs)):
        o_ref[0] = _bmv(a_ref[0], x_ref[0, j])


def make_bmv_splitk_seq(A_np_t, k):
    """K consecutive-tile operands: global tile i*k+j lives in sub j at
    position i; x enters pre-grouped (ng, k, nb, tile)."""
    ntile, m, nb, tile = A_np_t.shape
    ng = ntile // k
    assert ntile % k == 0
    grp = A_np_t.reshape(ng, k, m, nb, tile)
    subs = [jnp.asarray(np.ascontiguousarray(grp[:, j])) for j in range(k)]
    sh = jax.ShapeDtypeStruct((ng, m, tile), jnp.float32)

    @jax.jit
    def apply(x):
        xg = x.reshape(nb, ng, k, tile).transpose(1, 2, 0, 3)  # (ng,k,nb,t)
        outs = pl.pallas_call(
            functools.partial(_mv_kernel_splitk_seq, k),
            out_shape=tuple(sh for _ in range(k)),
            grid=(ng,),
            in_specs=[
                pl.BlockSpec((1, k, nb, tile),
                             lambda i: (i, _zero(i), _zero(i), _zero(i)),
                             memory_space=pltpu.VMEM)
            ] + [
                pl.BlockSpec((1, m, nb, tile),
                             lambda i: (i, _zero(i), _zero(i), _zero(i)),
                             memory_space=pltpu.VMEM)
                for _ in range(k)
            ],
            out_specs=tuple(
                pl.BlockSpec((1, m, tile), lambda i: (i, _zero(i), _zero(i)),
                             memory_space=pltpu.VMEM)
                for _ in range(k)
            ),
        )(xg, *subs)
        # outs[j][i] is global tile i*k+j -> (m, ntile*tile)
        y = jnp.stack(outs, axis=1)  # (ng, k, m, tile)... stack axis: outs[j] (ng,m,tile)
        return y.transpose(2, 0, 1, 3).reshape(m, ntile * tile)

    return apply


def _mv_kernel_1d(x_ref, a_ref, o_ref):
    o_ref[:] = _bmv(a_ref[0], x_ref[0])


def make_bmv_mega(A_np_t, k):
    """K tiles per grid step as ONE (k*m, nb, tile)-shaped megablock —
    fewer, larger DMAs."""
    ntile, m, nb, tile = A_np_t.shape
    ng = ntile // k
    assert ntile % k == 0
    mega = jnp.asarray(np.ascontiguousarray(
        A_np_t.reshape(ng, k * m, nb, tile)))

    def kern(x_ref, a_ref, o_ref):
        a = a_ref[0].reshape(k, m, nb, tile)
        x = x_ref[0]  # (k, nb, tile)
        o = [
            _bmv(a[j], x[j]) for j in range(k)
        ]
        o_ref[0] = jnp.stack(o)

    @jax.jit
    def apply(x):
        xg = x.reshape(nb, ng, k, tile).transpose(1, 2, 0, 3)
        y = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((ng, k, m, tile), jnp.float32),
            grid=(ng,),
            in_specs=[
                pl.BlockSpec((1, k, nb, tile),
                             lambda i: (i, _zero(i), _zero(i), _zero(i)),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, k * m, nb, tile),
                             lambda i: (i, _zero(i), _zero(i), _zero(i)),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, k, m, tile),
                                   lambda i: (i, _zero(i), _zero(i),
                                              _zero(i)),
                                   memory_space=pltpu.VMEM),
        )(xg, mega)
        return y.transpose(2, 0, 1, 3).reshape(m, ntile * tile)

    return apply


def make_bmv_manual(A_np_t, nbuf=4):
    """Manual multi-buffer pipeline: the table stays in HBM (ANY memory
    space) and the kernel keeps ``nbuf`` block DMAs in flight — tests
    whether a deeper prefetch queue (vs the automatic double buffering)
    lifts the single-stream ~112 GB/s."""
    ntile, m, nb, tile = A_np_t.shape
    A_j = jnp.asarray(A_np_t)

    def kern(x_ref, a_hbm, o_ref):
        def body(scratch, sems):
            def get_dma(slot, i):
                return pltpu.make_async_copy(
                    a_hbm.at[i], scratch.at[slot], sems.at[slot]
                )

            for j in range(min(nbuf, ntile)):
                get_dma(j, j).start()

            def loop_body(i, _):
                slot = jax.lax.rem(i, nbuf)
                get_dma(slot, i).wait()
                o_ref[i] = _bmv(scratch[slot], x_ref[i])
                nxt = i + nbuf

                @pl.when(nxt < ntile)
                def _():
                    get_dma(slot, nxt).start()

                return ()

            jax.lax.fori_loop(0, ntile, loop_body, (), unroll=False)

        pl.run_scoped(
            body,
            scratch=pltpu.VMEM((nbuf, m, nb, tile), jnp.float32),
            sems=pltpu.SemaphoreType.DMA((nbuf,)),
        )

    @jax.jit
    def apply(x):
        xg = x.reshape(nb, ntile, tile).transpose(1, 0, 2)  # (ntile,nb,t)
        y = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((ntile, m, tile), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(xg, A_j)
        return y.transpose(1, 0, 2).reshape(m, ntile * tile)

    return apply


def main():
    dev = jax.devices()[0]
    print(f"device: {dev}  nblk={NBLK} nb={NB}", flush=True)
    rng = np.random.default_rng(0)
    A = rng.standard_normal((NBLK, NB, NB)).astype(np.float32)
    gb = A.nbytes / 1e9
    print(f"table: {A.nbytes/1e6:.1f} MB", flush=True)

    # ceiling: XLA reduction over the whole table
    A_flat = jnp.asarray(A)
    x_dummy = jnp.ones((NB,), jnp.float32)
    timed("XLA einsum (AoS)",
          lambda v: jnp.einsum("eij,ej->ei", A_flat, v)[:, 0:NB],
          jnp.ones((NBLK, NB), jnp.float32), gb)

    for tile in (128, 256, 512, 1024):
        At = pack_tiles(A, tile)
        x = jnp.ones((NB, At.shape[0] * tile), jnp.float32)
        timed(f"bmv tile={tile}", make_bmv(jnp.asarray(At)), x, gb)

    for k in (2, 4, 8):
        for tile in (128, 256):
            At = pack_tiles(A, tile)
            nt = At.shape[0] - (At.shape[0] % k)
            At = At[:nt]
            x = jnp.ones((NB, nt * tile), jnp.float32)
            timed(f"splitK k={k} tile={tile}",
                  make_bmv_splitk_seq(At, k), x, At.nbytes / 1e9)

    for k in (2, 4):
        for tile in (128, 256):
            At = pack_tiles(A, tile)
            nt = At.shape[0] - (At.shape[0] % k)
            At = At[:nt]
            x = jnp.ones((NB, nt * tile), jnp.float32)
            timed(f"mega k={k} tile={tile}", make_bmv_mega(At, k), x,
                  At.nbytes / 1e9)

    for nbuf in (2, 4, 8):
        for tile in (128, 256):
            At = pack_tiles(A, tile)
            x = jnp.ones((NB, At.shape[0] * tile), jnp.float32)
            timed(f"manual nbuf={nbuf} tile={tile}",
                  make_bmv_manual(At, nbuf), x, At.nbytes / 1e9)


if __name__ == "__main__":
    main()
