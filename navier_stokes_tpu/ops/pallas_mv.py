"""Pallas TPU kernels for the batched block matvecs of the hot solve path.

The flagship iteration (the hot loop of
/root/reference/solvers/bramblepasciak_new.py:200-241) is dominated by
batched dense block matvecs: the condensed element operator
(ne, nb, nb) x (ne, nb), the skeleton smoother's bucketed block solves,
and their split-precision (hi+lo) variants.  XLA's lowering of the
batched matvec einsum leaves ~6x on the table at bench shapes
(measured 0.62-0.67 ms for a 90 MB operand whose HBM-bandwidth bound is
0.11 ms, scripts/microbench_apply2.py): the (ne, nb, nb) layout pads the
54-wide minor dimension to 128 lanes, and the SoA (nb, nb, ne) variant
slices the minor axis into ~3k separate 1 KB DMA segments per tile.

The kernels here fix the memory system, not the compute (the op is
bandwidth-bound; the VPU multiply-reduce is ~30x faster than the
stream):

* tables are pre-packed TILE-CONTIGUOUS at setup: (ntile, nb, nb, TILE)
  with the element index innermost (lane axis, zero padding waste) and
  each grid step's block one dense contiguous DMA;
* the hi/lo split matrices ride in ONE kernel sharing the x tile, so the
  compensated f32 apply streams both tables in a single pass;
* the double-single variant emits its three f32 products
  (hi*x_hi, hi*x_lo, lo*x_hi) from one kernel — the f64 combination
  stays outside (TPU Pallas is f32-native).

Vectors enter/leave in SoA form (nb, ne_pad); the cheap AoS<->SoA
transposes (~1.7 MB) and the face gathers stay in XLA, where they are
already at bandwidth (ops/faceblock.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

try:  # Pallas TPU is optional: CPU runs use the XLA einsum path
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False

__all__ = ["pack_tiles", "tiled_bmv", "tiled_bmv_multi", "tiled_bmv_ds",
           "tiled_bmv_comp", "pallas_ok", "make_table_apply"]


def pallas_ok() -> bool:
    """True when the Pallas TPU path can run on the CURRENT default device
    (respects ``with jax.default_device(...)`` — the bench's CPU-fallback
    path re-builds operators under a CPU default device while the TPU
    backend still exists)."""
    if not HAVE_PALLAS:
        return False
    try:
        dev = jax.config.jax_default_device or jax.devices()[0]
        return getattr(dev, "platform", None) == "tpu"
    except Exception:
        return False


def pack_tiles(A_np: np.ndarray, tile: int) -> np.ndarray:
    """(nblk, m, nb) element blocks -> (ntile, m, nb, tile) tile-contiguous
    SoA tables (block index innermost = lane axis; zero-padded tail)."""
    nblk, m, nb = A_np.shape
    ntile = -(-nblk // tile)
    flat = np.zeros((ntile * tile, m, nb), A_np.dtype)
    flat[:nblk] = A_np
    # (ntile, tile, m, nb) -> (ntile, m, nb, tile): block index innermost
    return np.ascontiguousarray(
        flat.reshape(ntile, tile, m, nb).transpose(0, 2, 3, 1)
    )


def pack_tiles_dev(A, tile: int):
    """Device-side :func:`pack_tiles`: same layout transform as jnp ops.
    Used when the table was DERIVED on device (setup-time gathers from an
    already-uploaded parent table, models/auxspace3d.py round 4) — pulling
    it to host to pack would ship GBs through the tunnel's ~0-23 MB/s
    device->host direction."""
    nblk, m, nb = A.shape
    ntile = -(-nblk // tile)
    pad = ntile * tile - nblk
    if pad:
        A = jnp.concatenate([A, jnp.zeros((pad, m, nb), A.dtype)])
    return A.reshape(ntile, tile, m, nb).transpose(0, 2, 3, 1)


def _pack_splitk_dev(A_t, k: int):
    """Device-side :func:`_pack_splitk` for already-uploaded packed
    tables (sharing them across kernels must not round-trip the host)."""
    ntile, m, nb, tile = A_t.shape
    ng = -(-ntile // k)
    if ng * k != ntile:
        A_t = jnp.concatenate(
            [A_t, jnp.zeros((ng * k - ntile, m, nb, tile), A_t.dtype)]
        )
    grp = A_t.reshape(ng, k, m, nb, tile)
    return [grp[:, j] for j in range(k)], ng


def _bmv(a, x):
    # y[i, e] = sum_j a[i, j, e] * x[j, e].  Mosaic cannot lower a batched
    # dot_general (the element axis e is a batch dim), so this is an
    # explicit VPU broadcast-multiply-reduce; the op is bandwidth-bound on
    # the a-stream, so VPU FLOPs are free.  bf16-STORED tables are cast to
    # f32 in-register (the DMA stream is the half-width one; arithmetic
    # stays f32).
    if a.dtype != x.dtype:
        a = a.astype(x.dtype)
    return jnp.sum(a * x[None, :, :], axis=1)


def _mv_kernel(x_ref, a_ref, o_ref):
    # one dense contiguous DMA per tile brings in a_ref; that stream is
    # the whole cost of the apply
    o_ref[:] = _bmv(a_ref[0], x_ref[:])


def _mv2_kernel(x_ref, ahi_ref, alo_ref, o_ref):
    x = x_ref[:]
    o_ref[:] = _bmv(ahi_ref[0], x) + _bmv(alo_ref[0], x)


def _mv_ds_kernel(xhi_ref, xlo_ref, ahi_ref, alo_ref, ohh_ref, ohl_ref,
                  olh_ref):
    ahi = ahi_ref[0]
    xhi = xhi_ref[:]
    ohh_ref[:] = _bmv(ahi, xhi)
    ohl_ref[:] = _bmv(ahi, xlo_ref[:])
    olh_ref[:] = _bmv(alo_ref[0], xhi)


_SPLIT = 4097.0  # Dekker split constant for f32: 2^12 + 1 (weak-typed
# Python literal: a jnp scalar would be a captured constant in the kernel)


def _two_prod(a, b):
    """Exact product: returns (p, err) with p + err == a*b exactly (Dekker
    splitting; Mosaic exposes no fused multiply-add).

    Dekker splitting requires ``a*_SPLIT`` ROUNDED before the subtraction
    ``ca - a``; LLVM on the CPU interpret path otherwise contracts
    mul+sub into a fused multiply-subtract with the UNROUNDED product,
    silently destroying the error term (observed 2.9e-8 instead of
    1.3e-14 row-relative).  The product is laundered through abs*sign:
    the same f32 value, and even a contracted fms of the two ROUNDED
    factors |a*_SPLIT| and sign(a) is exact.  (optimization_barrier is
    not an option: fusion re-materializes the raw multiply past it, and
    Mosaic cannot lower the barrier at all.)"""
    p = a * b
    ca = jnp.abs(a * _SPLIT) * jnp.sign(a)
    a1 = ca - (ca - a)
    a2 = a - a1
    cb = jnp.abs(b * _SPLIT) * jnp.sign(b)
    b1 = cb - (cb - b)
    b2 = b - b1
    err = ((a1 * b1 - p) + a1 * b2 + a2 * b1) + a2 * b2
    return p, err


def _mv_comp_kernel(nb, xhi_ref, xlo_ref, ahi_ref, alo_ref, ohi_ref,
                    olo_ref):
    """Compensated double-single batched matvec.

    y = (A_hi + A_lo)(x_hi + x_lo) accumulated in DOUBLE-SINGLE arithmetic:
    the dominant products A_hi x_hi are computed exactly (two_prod) and
    accumulated with two_sum error capture, so row cancellation in the
    operator does NOT amplify f32 rounding — the failure mode of the plain
    3x-f32 double-single apply (bench.py header; floors ~1e-6).  Result
    error is O(eps_f32^2 * sum_j |a_ij x_j|), i.e. ~2^-45 relative to the
    uncancelled row sum — below the 1e-8 bench target even with ~1e4 row
    cancellation.  All at f32 streaming speed: the table stream is
    identical to tiled_bmv_multi; the extra VPU flops (~25/term) ride under
    the DMA."""
    ahi = ahi_ref[0]
    alo = alo_ref[0]
    m = ahi.shape[0]
    tile = ahi.shape[2]
    s = jnp.zeros((m, tile), jnp.float32)
    sl = jnp.zeros((m, tile), jnp.float32)
    for j in range(nb):  # static unroll; nb is small (<=64)
        ah = ahi[:, j, :]
        xh = xhi_ref[j, :][None, :]
        p, err = _two_prod(ah, xh)
        small = ah * xlo_ref[j, :][None, :] + alo[:, j, :] * xh + err
        # two_sum(s, p).  ``p`` is laundered through abs*sign: XLA's
        # fusion pass re-materializes the raw product next to its uses and
        # LLVM then contracts mul+sub into an FMS, substituting the
        # UNROUNDED product into (p - bb) — which silently destroys the
        # error capture (observed 2.9e-8 instead of 1.3e-14 row-relative
        # on the CPU interpret path; optimization_barrier is elided too
        # late to prevent the duplication).  abs(p)*sign(p) is the same
        # f32 value, and even a contracted fms of those two ROUNDED
        # factors yields exactly p.
        p_safe = jnp.abs(p) * jnp.sign(p)
        t = s + p_safe
        bb = t - s
        e = (s - (t - bb)) + (p_safe - bb)
        s = t
        sl = sl + (e + small)
    ohi_ref[:] = s
    olo_ref[:] = sl


@functools.partial(jax.jit, static_argnames=("interpret",))
def _call_mv_comp(A_hi_t, A_lo_t, x_hi, x_lo, interpret=False):
    ntile, m, nb, tile = A_hi_t.shape
    sh = jax.ShapeDtypeStruct((m, ntile * tile), jnp.float32)
    in_specs, out_specs = _specs(m, nb, tile, 2, 2, 2)
    return pl.pallas_call(
        functools.partial(_mv_comp_kernel, nb),
        out_shape=(sh, sh),
        grid=(ntile,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        interpret=interpret,
    )(x_hi, x_lo, A_hi_t, A_lo_t)


def tiled_bmv_comp(A_hi_t, A_lo_t, x_hi_soa, x_lo_soa,
                   interpret: bool = False):
    """Compensated double-single product: (y_hi, y_lo) f32 SoA pair with
    y_hi + y_lo ~ f64((A_hi+A_lo)(x_hi+x_lo)) to ~2^-45 of the row sum."""
    return _call_mv_comp(A_hi_t, A_lo_t, x_hi_soa, x_lo_soa,
                         interpret=interpret)


def _zero(i):
    # index-map zero with the SAME dtype as the grid index: under
    # jax_enable_x64 a Python literal 0 traces as i64 while the grid index
    # is i32, and Mosaic fails to legalize the mixed-type index-map return
    # ("func.return"(i64, i32) — observed on the first x64 bench run)
    return i - i


def _specs(m, nb, tile, n_mats, n_x, n_out):
    in_specs = [
        pl.BlockSpec((nb, tile), lambda i: (_zero(i), i),
                     memory_space=pltpu.VMEM)
        for _ in range(n_x)
    ] + [
        pl.BlockSpec((1, m, nb, tile),
                     lambda i: (i, _zero(i), _zero(i), _zero(i)),
                     memory_space=pltpu.VMEM)
        for _ in range(n_mats)
    ]
    out_specs = [
        pl.BlockSpec((m, tile), lambda i: (_zero(i), i),
                     memory_space=pltpu.VMEM)
        for _ in range(n_out)
    ]
    return in_specs, out_specs


@functools.partial(jax.jit, static_argnames=("interpret",))
def _call_mv(A_t, x, interpret=False):
    ntile, m, nb, tile = A_t.shape
    out_shape = jax.ShapeDtypeStruct((m, ntile * tile), jnp.float32)
    in_specs, out_specs = _specs(m, nb, tile, 1, 1, 1)
    return pl.pallas_call(
        _mv_kernel,
        out_shape=out_shape,
        grid=(ntile,),
        in_specs=in_specs,
        out_specs=out_specs[0],
        interpret=interpret,
    )(x, A_t)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _call_mv2(A_hi_t, A_lo_t, x, interpret=False):
    ntile, m, nb, tile = A_hi_t.shape
    out_shape = jax.ShapeDtypeStruct((m, ntile * tile), jnp.float32)
    in_specs, out_specs = _specs(m, nb, tile, 2, 1, 1)
    return pl.pallas_call(
        _mv2_kernel,
        out_shape=out_shape,
        grid=(ntile,),
        in_specs=in_specs,
        out_specs=out_specs[0],
        interpret=interpret,
    )(x, A_hi_t, A_lo_t)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _call_mv_ds(A_hi_t, A_lo_t, x_hi, x_lo, interpret=False):
    ntile, m, nb, tile = A_hi_t.shape
    sh = jax.ShapeDtypeStruct((m, ntile * tile), jnp.float32)
    in_specs, out_specs = _specs(m, nb, tile, 2, 2, 3)
    return pl.pallas_call(
        _mv_ds_kernel,
        out_shape=(sh, sh, sh),
        grid=(ntile,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        interpret=interpret,
    )(x_hi, x_lo, A_hi_t, A_lo_t)


def _mv_kernel_splitk(k, x_ref, *refs):
    # K tables ride as SEPARATE operands (consecutive-tile grouping:
    # global tile i*k+j lives in sub j at position i), so Mosaic's
    # pipeline keeps K block DMAs in flight per grid step instead of one —
    # the single-stream rate measured ~112 GB/s of the chip's 819.
    a_refs, o_refs = refs[:k], refs[k:]
    for j, (a_ref, o_ref) in enumerate(zip(a_refs, o_refs)):
        o_ref[0] = _bmv(a_ref[0], x_ref[0, j])


def _pack_splitk(A_t: np.ndarray, k: int):
    """(ntile, m, nb, tile) packed table -> k consecutive-tile sub-tables
    ((ng, m, nb, tile) each), zero-padding ntile up to a multiple of k."""
    ntile, m, nb, tile = A_t.shape
    ng = -(-ntile // k)
    if ng * k != ntile:
        pad = np.zeros((ng * k - ntile, m, nb, tile), A_t.dtype)
        A_t = np.concatenate([A_t, pad])
    grp = A_t.reshape(ng, k, m, nb, tile)
    return [np.ascontiguousarray(grp[:, j]) for j in range(k)], ng


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def _call_mv_splitk(k, x, *A_subs, interpret=False):
    ng, m, nb, tile = A_subs[0].shape
    sh = jax.ShapeDtypeStruct((ng, m, tile), jnp.float32)
    xg = x.reshape(nb, ng, k, tile).transpose(1, 2, 0, 3)  # (ng,k,nb,t)
    outs = pl.pallas_call(
        functools.partial(_mv_kernel_splitk, k),
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
        interpret=interpret,
    )(xg, *A_subs)
    # outs[j][i] = global tile i*k+j -> (m, ng*k*tile)
    y = jnp.stack(outs, axis=1)  # (ng, k, m, tile)
    return y.transpose(2, 0, 1, 3).reshape(m, ng * k * tile)


def _mv2_kernel_splitk(k, x_ref, *refs):
    # split (hi+lo) variant: operands [ahi_0..ahi_{k-1}, alo_0..alo_{k-1}]
    ahi, alo, outs = refs[:k], refs[k:2 * k], refs[2 * k:]
    for j in range(k):
        x = x_ref[0, j]
        outs[j][0] = _bmv(ahi[j][0], x) + _bmv(alo[j][0], x)


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def _call_mv2_splitk(k, x, *A_subs, interpret=False):
    # A_subs = (hi_0..hi_{k-1}, lo_0..lo_{k-1})
    ng, m, nb, tile = A_subs[0].shape
    sh = jax.ShapeDtypeStruct((ng, m, tile), jnp.float32)
    xg = x.reshape(nb, ng, k, tile).transpose(1, 2, 0, 3)
    outs = pl.pallas_call(
        functools.partial(_mv2_kernel_splitk, k),
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
            for _ in range(2 * k)
        ],
        out_specs=tuple(
            pl.BlockSpec((1, m, tile), lambda i: (i, _zero(i), _zero(i)),
                         memory_space=pltpu.VMEM)
            for _ in range(k)
        ),
        interpret=interpret,
    )(xg, *A_subs)
    y = jnp.stack(outs, axis=1)
    return y.transpose(2, 0, 1, 3).reshape(m, ng * k * tile)


def _mv_comp_kernel_splitk(k, nb, xhi_ref, xlo_ref, *refs):
    # compensated double-single variant, K sub-tables per matrix
    ahi, alo = refs[:k], refs[k:2 * k]
    ohi, olo = refs[2 * k:3 * k], refs[3 * k:]
    for j in range(k):
        m = ahi[j].shape[1]
        tile = ahi[j].shape[3]
        s = jnp.zeros((m, tile), jnp.float32)
        sl = jnp.zeros((m, tile), jnp.float32)
        for q in range(nb):
            ah = ahi[j][0, :, q, :]
            xh = xhi_ref[0, j, q, :][None, :]
            p, err = _two_prod(ah, xh)
            small = (ah * xlo_ref[0, j, q, :][None, :]
                     + alo[j][0, :, q, :] * xh + err)
            p_safe = jnp.abs(p) * jnp.sign(p)
            t = s + p_safe
            bb = t - s
            e = (s - (t - bb)) + (p_safe - bb)
            s = t
            sl = sl + (e + small)
        ohi[j][0] = s
        olo[j][0] = sl


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def _call_mv_comp_splitk(k, x_hi, x_lo, *A_subs, interpret=False):
    ng, m, nb, tile = A_subs[0].shape
    sh = jax.ShapeDtypeStruct((ng, m, tile), jnp.float32)

    def grp(x):
        return x.reshape(nb, ng, k, tile).transpose(1, 2, 0, 3)

    outs = pl.pallas_call(
        functools.partial(_mv_comp_kernel_splitk, k, nb),
        out_shape=tuple(sh for _ in range(2 * k)),
        grid=(ng,),
        in_specs=[
            pl.BlockSpec((1, k, nb, tile),
                         lambda i: (i, _zero(i), _zero(i), _zero(i)),
                         memory_space=pltpu.VMEM)
            for _ in range(2)
        ] + [
            pl.BlockSpec((1, m, nb, tile),
                         lambda i: (i, _zero(i), _zero(i), _zero(i)),
                         memory_space=pltpu.VMEM)
            for _ in range(2 * k)
        ],
        out_specs=tuple(
            pl.BlockSpec((1, m, tile), lambda i: (i, _zero(i), _zero(i)),
                         memory_space=pltpu.VMEM)
            for _ in range(2 * k)
        ),
        interpret=interpret,
    )(grp(x_hi), grp(x_lo), *A_subs)

    def ung(parts):
        y = jnp.stack(parts, axis=1)  # (ng, k, m, tile)
        return y.transpose(2, 0, 1, 3).reshape(m, ng * k * tile)

    return ung(outs[:k]), ung(outs[k:])


def make_table_apply(A_np: np.ndarray, tile: int = 256,
                     interpret: bool = False, store_dtype=None,
                     min_pallas_blocks: int = 256,
                     compute_dtype=jnp.float32,
                     prepacked_nblk: int | None = None,
                     soa_io: bool = False):
    """Generic batched block matvec: fn (nblk, k) f32 -> (nblk, m) f32 for
    (nblk, m, k) numpy tables.

    On TPU the table is packed tile-contiguous (:func:`pack_tiles`) and
    streamed through the Pallas VPU kernel — the XLA einsum lane-pads the
    minor table dimension to 128 (a 48-wide skeleton block reads 2.7x its
    bytes); the packed layout wastes nothing.  Off-TPU, and for small
    batches where the tile padding would dominate (< ``min_pallas_blocks``),
    it falls back to the plain einsum.  ``store_dtype`` (e.g. bfloat16)
    halves the table stream; arithmetic stays f32 (the kernel casts
    in-register, the einsum path promotes).

    ``prepacked_nblk``: when given, ``A_np`` is an ALREADY PACKED device
    table (ntile, m, k, tile) holding ``prepacked_nblk`` real blocks —
    produced in bulk by a setup-time builder program (one device call for
    ALL tables, ops/faceblock.py round 4) so that table construction never
    pays per-table tunnel round trips.  No packing, casting, or env
    inspection happens here.

    ``soa_io=True`` (round 5): the apply takes x ALREADY in padded SoA
    layout ((k, NPAD) with the block index minor) and returns (m, NPAD)
    SoA — no pad-concat, no transposes, no slice.  The GS sweep keeps
    its whole iterate transposed so every array's MINOR dim is the large
    block axis: the row-major (nface, nfb=12) arrays the sweep used to
    pass between steps physically pad to 128 lanes on TPU (10.7x the
    bytes on every elementwise op and gather) — measured as the bulk of
    the sweep's ~2.3 ms/apply overhead (microbench_sweep.py).  Tail
    columns are exact zeros (zero-padded tail tables).  On the einsum
    fallback NPAD is the caller-padded table's block count.
    """
    import os

    if prepacked_nblk is not None:
        ntile_p, m, k, tile_p = A_np.shape
        nblk = int(prepacked_nblk)
        pad = ntile_p * tile_p - nblk

        if soa_io:
            def apply(xT):
                return _call_mv(A_np, xT, interpret=interpret)

            return apply

        def apply(x):
            xT = jnp.concatenate([x, jnp.zeros((pad, k), x.dtype)]).T
            yT = _call_mv(A_np, xT, interpret=interpret)
            return yT.T[:nblk]

        return apply

    tile = int(os.environ.get("NSTPU_TILE", tile))
    nblk, m, k = A_np.shape
    sdt = jnp.dtype(store_dtype or jnp.float32)
    # device-DERIVED tables (setup-time gathers from an uploaded parent,
    # models/auxspace3d.py round 4) are packed with jnp ops in place —
    # np.asarray on them would pull GBs back through the tunnel's
    # ~0-23 MB/s device->host direction
    on_device = isinstance(A_np, jax.Array)
    # the kernel is f32-native (f32 accumulate, bf16 or f32 table stream);
    # f64-stored tables AND f64 vector arithmetic (the model's own f64
    # path, where f32-stored tables applied in f64 arithmetic stay a fixed
    # linear operator) stay on the einsum.  NSTPU_PALLAS=0 disables (the
    # bench's Mosaic-failure fallback flips it at runtime).
    use_pallas = ((interpret or pallas_ok()) and nblk >= min_pallas_blocks
                  and sdt in (jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16))
                  and jnp.dtype(compute_dtype) == jnp.dtype(jnp.float32)
                  and (interpret
                       or os.environ.get("NSTPU_PALLAS", "1") != "0"))
    if not use_pallas:
        # cast DIRECTLY from the source dtype (an f32 detour would corrupt
        # f64-stored tables)
        A_j = (A_np if on_device else jnp.asarray(np.asarray(A_np))
               ).astype(sdt)

        if soa_io:
            def apply(xT):
                return jnp.einsum("bmk,kb->mb", A_j, xT)

            return apply

        def apply(x):
            return jnp.einsum("bmk,bk->bm", A_j, x)

        return apply

    split_k = int(os.environ.get("NSTPU_SPLITK", "1"))
    if on_device:
        A_packed = pack_tiles_dev(A_np.astype(sdt), tile)
    else:
        # cast to the STORAGE dtype on the host before the upload: the
        # tunnel bills by the byte, and uploading f64 to cast on device
        # ships 2-4x the data (same single f64->sdt rounding either way)
        import ml_dtypes

        _np_sdt = {jnp.dtype(jnp.float32): np.float32,
                   jnp.dtype(jnp.bfloat16): ml_dtypes.bfloat16}.get(sdt)
        A_packed = pack_tiles(np.asarray(A_np), tile)
        if _np_sdt is not None and A_packed.dtype != _np_sdt:
            A_packed = A_packed.astype(_np_sdt)
    if split_k > 1 and not soa_io:  # soa_io keeps the single-stream kernel
        if on_device:
            subs_l, ng = _pack_splitk_dev(A_packed, split_k)
            subs = tuple(subs_l)
        else:
            subs_np, ng = _pack_splitk(A_packed, split_k)
            subs = tuple(jnp.asarray(a).astype(sdt) for a in subs_np)
        pad = ng * split_k * tile - nblk

        def apply(x):
            xT = jnp.concatenate([x, jnp.zeros((pad, k), x.dtype)]).T
            yT = _call_mv_splitk(split_k, xT, *subs, interpret=interpret)
            return yT.T[:nblk]

        return apply

    ntile = A_packed.shape[0]
    pad = ntile * tile - nblk
    A_t = A_packed if on_device else jnp.asarray(A_packed).astype(sdt)

    if soa_io:
        def apply(xT):
            return _call_mv(A_t, xT, interpret=interpret)

        return apply

    def apply(x):
        xT = jnp.concatenate(
            [x, jnp.zeros((pad, k), x.dtype)]
        ).T
        yT = _call_mv(A_t, xT, interpret=interpret)
        return yT.T[:nblk]

    return apply


def tiled_bmv(A_t: jnp.ndarray, x_soa: jnp.ndarray,
              interpret: bool = False) -> jnp.ndarray:
    """y_soa (m, ntile*tile) = per-block A @ x for tile-packed tables.

    ``A_t``: (ntile, m, nb, tile) from :func:`pack_tiles` (f32).
    ``x_soa``: (nb, ntile*tile) f32.
    """
    return _call_mv(A_t, x_soa, interpret=interpret)


def tiled_bmv_multi(A_hi_t, A_lo_t, x_soa, interpret: bool = False):
    """Split (compensated) apply: y = (A_hi + A_lo) x in ONE stream."""
    return _call_mv2(A_hi_t, A_lo_t, x_soa, interpret=interpret)


def tiled_bmv_ds(A_hi_t, A_lo_t, x_hi_soa, x_lo_soa,
                 interpret: bool = False):
    """Double-single products: (A_hi x_hi, A_hi x_lo, A_lo x_hi) f32."""
    return _call_mv_ds(A_hi_t, A_lo_t, x_hi_soa, x_lo_soa,
                       interpret=interpret)
