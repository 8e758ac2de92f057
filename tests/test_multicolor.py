"""Unit tests for multi-color block-GS machinery (precond/multicolor) and
the jaxpr-const-hoisting jit wrapper (utils/jaxtools)."""

import jax
import jax.numpy as jnp
import numpy as np

from navier_stokes_tpu.precond.multicolor import (
    MulticolorGS,
    color_blocks,
    damped_coarse,
    symmetric_gs_preconditioner,
)
from navier_stokes_tpu.utils.jaxtools import hoisted_jit


def _random_spd(n, seed=0):
    rng = np.random.default_rng(seed)
    Q = rng.standard_normal((n, n))
    return Q @ Q.T + n * np.eye(n)


def test_coloring_element_coupling():
    """Blocks touching a common element must get different colors even when
    they share no dof (the failure mode that produced an indefinite GS
    preconditioner on 3D edge-star patches)."""
    # two disjoint blocks, one 'element' touching both
    blocks = [np.array([0, 1]), np.array([2, 3]), np.array([4, 5])]
    eldofs = np.array([[0, 2], [3, 4]])  # couples b0-b1 and b1-b2
    colors = color_blocks(blocks, 6, eldofs)
    assert colors[0] != colors[1]
    assert colors[1] != colors[2]


def test_symmetric_gs_is_spd():
    n = 40
    A = _random_spd(n)
    Aj = jnp.asarray(A)
    A_apply = lambda x: Aj @ x
    blocks = [np.arange(i, min(i + 6, n), dtype=np.int32)
              for i in range(0, n, 4)]
    bmax = max(len(b) for b in blocks)
    dofs = -np.ones((len(blocks), bmax), np.int32)
    mats = np.tile(np.eye(bmax), (len(blocks), 1, 1))
    for i, b in enumerate(blocks):
        dofs[i, : len(b)] = b
        mats[i, : len(b), : len(b)] = A[np.ix_(b, b)]
    eldofs = np.stack([np.arange(i, i + 8) for i in range(0, n - 8, 2)])
    colors = color_blocks(blocks, n, eldofs)
    mgs = MulticolorGS(dofs, mats, colors, n)
    preA = symmetric_gs_preconditioner(mgs, A_apply, None, None)
    P = np.stack(
        [np.asarray(preA(jnp.eye(n)[:, i])) for i in range(n)], axis=1
    )
    assert np.abs(P - P.T).max() < 1e-12 * np.abs(P).max()
    ev = np.linalg.eigvalsh(0.5 * (P + P.T))
    assert ev.min() > 0


def test_damped_coarse_bounds_spectrum():
    """An overscaled coarse correction is damped so lambda_max(C A) <= ~1
    (otherwise the multiplicative sweep goes indefinite)."""
    n = 30
    A = _random_spd(n, 1)
    Aj = jnp.asarray(A)
    A_apply = lambda x: Aj @ x
    C_raw = lambda r: 10.0 * jnp.asarray(np.linalg.inv(A)) @ r  # 10x too big
    ex = jnp.asarray(np.random.default_rng(2).standard_normal(n))
    C, lam, theta = damped_coarse(C_raw, A_apply, ex)
    assert lam > 5.0
    assert theta < 0.2
    # after damping: lambda_max(C A) ~ target
    M = np.stack([np.asarray(C(A_apply(jnp.eye(n)[:, i]))) for i in range(n)],
                 axis=1)
    assert np.abs(np.linalg.eigvals(M)).max() < 1.1


def test_hoisted_jit_matches_jit():
    big = jnp.asarray(np.random.default_rng(3).standard_normal((64, 64)))

    def f(x):
        return big @ x + 1.0  # closes over `big`

    x = jnp.ones(64)
    direct = jax.jit(f)(x)
    hoisted = hoisted_jit(f, x)(x)
    assert np.allclose(np.asarray(direct), np.asarray(hoisted))


def test_hoisted_jit_pytree_outputs():
    def f(x):
        return {"a": x * 2, "b": (x + 1, jnp.sum(x))}

    x = jnp.arange(4.0)
    out = hoisted_jit(f, x)(x)
    assert np.allclose(np.asarray(out["a"]), [0, 2, 4, 6])
    assert float(out["b"][1]) == 6.0
