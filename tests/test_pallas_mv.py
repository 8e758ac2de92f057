"""Correctness of the tile-contiguous Pallas batched block matvecs
(ops/pallas_mv.py) against the plain XLA einsum, in interpret mode so the
test runs on the CPU backend.

These kernels implement the hot batched matvec of the flagship apply
(the BPCG/MINRES iteration of
/root/reference/solvers/bramblepasciak_new.py:200-241) in a layout whose
DMA pattern is one dense contiguous block per grid step.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from navier_stokes_tpu.ops.pallas_mv import (
    HAVE_PALLAS,
    pack_tiles,
    tiled_bmv,
    tiled_bmv_comp,
    tiled_bmv_ds,
    tiled_bmv_multi,
)

pytestmark = pytest.mark.skipif(not HAVE_PALLAS, reason="no pallas")

NE, NB, TILE = 37, 14, 16  # deliberately non-multiple ne


def _data(seed=0, m=NB):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((NE, m, NB)).astype(np.float32)
    x = rng.standard_normal((NB, NE)).astype(np.float32)
    return A, x


def _pad_soa(x):
    ntile = -(-NE // TILE)
    out = np.zeros((x.shape[0], ntile * TILE), np.float32)
    out[:, :NE] = x
    return jnp.asarray(out)


def test_pack_tiles_roundtrip():
    A, _ = _data()
    A_t = pack_tiles(A, TILE)
    ntile = -(-NE // TILE)
    assert A_t.shape == (ntile, NB, NB, TILE)
    # element e lives at tile e//TILE, lane e%TILE
    for e in (0, 1, NE - 1):
        np.testing.assert_array_equal(A_t[e // TILE, :, :, e % TILE], A[e])
    # padding lanes are zero
    assert np.all(A_t[-1, :, :, NE - (ntile - 1) * TILE:] == 0.0)


def test_tiled_bmv_matches_einsum():
    A, x = _data()
    want = np.einsum("eij,je->ie", A, x)
    got = tiled_bmv(jnp.asarray(pack_tiles(A, TILE)), _pad_soa(x),
                    interpret=True)
    np.testing.assert_allclose(np.asarray(got)[:, :NE], want, rtol=2e-6,
                               atol=1e-5)


def test_tiled_bmv_rectangular():
    m = 6
    A, x = _data(m=m)
    want = np.einsum("eij,je->ie", A, x)
    got = tiled_bmv(jnp.asarray(pack_tiles(A, TILE)), _pad_soa(x),
                    interpret=True)
    assert got.shape[0] == m
    np.testing.assert_allclose(np.asarray(got)[:, :NE], want, rtol=2e-6,
                               atol=1e-5)


def test_tiled_bmv_multi_is_split_sum():
    A64 = np.random.default_rng(3).standard_normal((NE, NB, NB))
    A_hi = A64.astype(np.float32)
    A_lo = (A64 - A_hi.astype(np.float64)).astype(np.float32)
    _, x = _data(4)
    want = np.einsum("eij,je->ie", A_hi, x) + np.einsum(
        "eij,je->ie", A_lo, x
    )
    got = tiled_bmv_multi(
        jnp.asarray(pack_tiles(A_hi, TILE)),
        jnp.asarray(pack_tiles(A_lo, TILE)),
        _pad_soa(x),
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got)[:, :NE], want, rtol=2e-6,
                               atol=1e-5)


def test_tiled_bmv_ds_three_products():
    A64 = np.random.default_rng(5).standard_normal((NE, NB, NB))
    A_hi = A64.astype(np.float32)
    A_lo = (A64 - A_hi.astype(np.float64)).astype(np.float32)
    rng = np.random.default_rng(6)
    x64 = rng.standard_normal((NB, NE))
    x_hi = x64.astype(np.float32)
    x_lo = (x64 - x_hi.astype(np.float64)).astype(np.float32)
    hh, hl, lh = tiled_bmv_ds(
        jnp.asarray(pack_tiles(A_hi, TILE)),
        jnp.asarray(pack_tiles(A_lo, TILE)),
        _pad_soa(x_hi),
        _pad_soa(x_lo),
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(hh)[:, :NE], np.einsum("eij,je->ie", A_hi, x_hi),
        rtol=2e-6, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(hl)[:, :NE], np.einsum("eij,je->ie", A_hi, x_lo),
        rtol=2e-6, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(lh)[:, :NE], np.einsum("eij,je->ie", A_lo, x_hi),
        rtol=2e-6, atol=1e-5)
    # double-single combination approximates the f64 product
    want = np.einsum("eij,je->ie", A64, x64)
    ds = (np.asarray(hh).astype(np.float64)
          + np.asarray(hl).astype(np.float64)
          + np.asarray(lh).astype(np.float64))[:, :NE]
    np.testing.assert_allclose(ds, want, rtol=0, atol=3e-6 * np.abs(want).max())


def test_tiled_bmv_comp_cancellation():
    """The compensated kernel keeps accuracy under heavy row cancellation —
    exactly the failure mode that floors the plain 3x-f32 double-single
    apply at ~1e-6 (bench.py header)."""
    rng = np.random.default_rng(11)
    A64 = rng.standard_normal((NE, NB, NB))
    x64 = rng.standard_normal((NB, NE))
    # engineer ~1e5 cancellation: column-1 terms cancel the (boosted)
    # column-0 terms, so each row sum is ~1e-5 of its term magnitudes
    A64[:, :, 0] *= 1e5
    A64[:, :, 1] = -A64[:, :, 0] * (x64[0] / x64[1])[:, None]
    want = np.einsum("eij,je->ie", A64, x64)
    # per-output uncancelled row scale sum_j |a_ij x_j|: (NB_out, NE)
    scale = np.einsum("eij,je->ie", np.abs(A64), np.abs(x64))
    A_hi = A64.astype(np.float32)
    A_lo = (A64 - A_hi.astype(np.float64)).astype(np.float32)
    x_hi = x64.astype(np.float32)
    x_lo = (x64 - x_hi.astype(np.float64)).astype(np.float32)
    yh, yl = tiled_bmv_comp(
        jnp.asarray(pack_tiles(A_hi, TILE)),
        jnp.asarray(pack_tiles(A_lo, TILE)),
        _pad_soa(x_hi), _pad_soa(x_lo), interpret=True,
    )
    got = (np.asarray(yh).astype(np.float64)
           + np.asarray(yl).astype(np.float64))[:, :NE]
    err = np.abs(got - want) / np.maximum(scale, 1e-300)
    assert err.max() < 1e-12, f"comp error {err.max():.2e} vs row scale"
    # and the PLAIN ds product is demonstrably worse on the same data
    plain = (np.einsum("eij,je->ie", A_hi, x_hi, dtype=np.float32)
             .astype(np.float64)
             + np.einsum("eij,je->ie", A_hi, x_lo, dtype=np.float32)
             .astype(np.float64)
             + np.einsum("eij,je->ie", A_lo, x_hi, dtype=np.float32)
             .astype(np.float64))
    plain_err = np.abs(plain - want) / np.maximum(scale, 1e-300)
    assert plain_err.max() > 10 * err.max()

def test_make_table_apply_paths():
    """make_table_apply: pallas (interpret) path == einsum path == numpy,
    for square and rectangular tables, incl. bf16 storage (arithmetic f32,
    ~0.4% table rounding)."""
    from navier_stokes_tpu.ops.pallas_mv import make_table_apply

    rng = np.random.default_rng(7)
    for m, k in ((NB, NB), (6, NB), (NB, 9)):
        A = rng.standard_normal((NE, m, k)).astype(np.float32)
        x = jnp.asarray(rng.standard_normal((NE, k)).astype(np.float32))
        want = np.einsum("emk,ek->em", A, np.asarray(x))
        # pallas path (interpret mode, forced on small batch)
        f_pl = make_table_apply(A, tile=TILE, interpret=True,
                                min_pallas_blocks=1)
        np.testing.assert_allclose(np.asarray(f_pl(x)), want, rtol=2e-6,
                                   atol=1e-5)
        # einsum fallback (min_pallas_blocks gate)
        f_es = make_table_apply(A, tile=TILE, min_pallas_blocks=10**9)
        np.testing.assert_allclose(np.asarray(f_es(x)), want, rtol=2e-6,
                                   atol=1e-5)
        # bf16 storage: both paths agree with each other and are ~0.4% off
        f_pl_bf = make_table_apply(A, tile=TILE, interpret=True,
                                   min_pallas_blocks=1,
                                   store_dtype=jnp.bfloat16)
        f_es_bf = make_table_apply(A, tile=TILE, min_pallas_blocks=10**9,
                                   store_dtype=jnp.bfloat16)
        y_pl = np.asarray(f_pl_bf(x))
        y_es = np.asarray(f_es_bf(x))
        assert y_pl.dtype == np.float32
        np.testing.assert_allclose(y_pl, y_es, rtol=2e-6, atol=1e-5)
        scale = np.abs(want).max()
        assert np.abs(y_pl - want).max() < 0.05 * scale


def test_make_table_apply_splitk(monkeypatch):
    """NSTPU_SPLITK>1: K consecutive-tile sub-tables as separate kernel
    operands (K DMAs in flight per grid step) — same results as K=1."""
    from navier_stokes_tpu.ops.pallas_mv import make_table_apply

    rng = np.random.default_rng(13)
    A = rng.standard_normal((NE, NB, NB)).astype(np.float32)
    x = jnp.asarray(rng.standard_normal((NE, NB)).astype(np.float32))
    want = np.einsum("emk,ek->em", A, np.asarray(x))
    for k in (2, 4):
        monkeypatch.setenv("NSTPU_SPLITK", str(k))
        f = make_table_apply(A, tile=8, interpret=True, min_pallas_blocks=1)
        np.testing.assert_allclose(np.asarray(f(x)), want, rtol=2e-6,
                                   atol=1e-5)
    monkeypatch.setenv("NSTPU_SPLITK", "1")


def test_comp_splitk_matches_comp():
    """Split-K compensated kernel == the single-stream compensated kernel
    (same double-single accuracy under engineered cancellation)."""
    from navier_stokes_tpu.ops.pallas_mv import (
        _call_mv_comp_splitk,
        _pack_splitk,
    )

    rng = np.random.default_rng(17)
    A64 = rng.standard_normal((NE, NB, NB))
    x64 = rng.standard_normal((NB, NE))
    A64[:, :, 0] *= 1e5
    A64[:, :, 1] = -A64[:, :, 0] * (x64[0] / x64[1])[:, None]
    want = np.einsum("eij,je->ie", A64, x64)
    scale = np.einsum("eij,je->ie", np.abs(A64), np.abs(x64))
    A_hi = A64.astype(np.float32)
    A_lo = (A64 - A_hi.astype(np.float64)).astype(np.float32)
    x_hi = x64.astype(np.float32)
    x_lo = (x64 - x_hi.astype(np.float64)).astype(np.float32)
    k = 4
    hs, ng = _pack_splitk(pack_tiles(A_hi, TILE), k)
    ls, _ = _pack_splitk(pack_tiles(A_lo, TILE), k)
    npad = ng * k * TILE
    xh = np.zeros((NB, npad), np.float32); xh[:, :NE] = x_hi
    xl = np.zeros((NB, npad), np.float32); xl[:, :NE] = x_lo
    yh, yl = _call_mv_comp_splitk(
        k, jnp.asarray(xh), jnp.asarray(xl),
        *[jnp.asarray(a) for a in hs + ls], interpret=True,
    )
    got = (np.asarray(yh).astype(np.float64)
           + np.asarray(yl).astype(np.float64))[:, :NE]
    err = np.abs(got - want) / np.maximum(scale, 1e-300)
    assert err.max() < 1e-12, f"splitK comp error {err.max():.2e}"
