"""Double-single (two-f32) operator applies: accuracy vs the true f64
operator and end-to-end use in the bench's phase-2 correction solve."""

import jax.numpy as jnp
import numpy as np
import pytest

from navier_stokes_tpu.mesh import channel_with_cylinder_mesh_3d
from navier_stokes_tpu.models.navier_stokes_mcs import NavierStokesMCS
from navier_stokes_tpu.solvers import equilibrated_f32_ops


H = 0.41


def uin(p):
    out = np.zeros((len(p), 3))
    out[:, 0] = 16 * p[:, 1] * (H - p[:, 1]) * p[:, 2] * (H - p[:, 2]) / H**4
    return out


@pytest.fixture(scope="module")
def model():
    mesh = channel_with_cylinder_mesh_3d(0.35)
    return NavierStokesMCS(
        mesh, nu=0.001, inflow="inlet", outflow="outlet", wall="wall|cyl",
        uin=uin, timestep=2e-3, order=2, dtype=jnp.float64,
    )


def test_ds_apply_accuracy(model):
    """A_ds u matches the true f64 equilibrated apply to ~f32 accumulation
    noise (far below the 1e-4 phase-2 inner tolerance), vastly better than
    a single f32 apply on this 1e12-dynamic-range operator."""
    m = model
    ops32, D, ops_ds = equilibrated_f32_ops(m, split=True, with_ds=True)
    # true equilibrated f64 apply: D A D
    free = m.free

    def A_eq(u):
        uf = jnp.where(free, u, 0.0)
        y = D * m.A_raw(D * uf)
        return jnp.where(free, y, u)

    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal(m.n)) * free
    y64 = A_eq(u)
    y_ds = ops_ds["A"](u)
    rel_ds = float(jnp.linalg.norm(y_ds - y64) / jnp.linalg.norm(y64))
    assert rel_ds < 1e-6
    y32 = ops32["A"](u.astype(jnp.float32)).astype(jnp.float64)
    rel32 = float(jnp.linalg.norm(y32 - y64) / jnp.linalg.norm(y64))
    assert rel_ds < rel32  # strictly better than the f32 apply

    # B/BT double-single
    p = jnp.asarray(rng.standard_normal(m.Q.ndof))
    yB = D * m.BT(p)
    yB = jnp.where(free, yB, 0.0)
    yB_ds = ops_ds["BT"](p)
    assert float(jnp.linalg.norm(yB_ds - yB) / jnp.linalg.norm(yB)) < 1e-6
    g64 = m.B_raw(D * (u * free))
    g_ds = ops_ds["B"](u)
    assert float(jnp.linalg.norm(g_ds - g64) / jnp.linalg.norm(g64)) < 1e-6


def test_phase2_correction_solve(model):
    """The bench phase-2 pipeline: MINRES on the equilibrated system with
    double-single matvecs contracts the TRUE f64 residual to its internal
    tolerance.  (BPCG's optimized recurrence cannot be used here: the
    amortized A*s carry drifts ~400x from the true residual under the
    ~1e-7 double-single apply noise — measured round 3; MINRES recomputes
    its Lanczos vector from a fresh operator apply each step and tracks.)"""
    from navier_stokes_tpu.solvers.minres import minres

    m = model
    ops32, D, ops_ds = equilibrated_f32_ops(m, split=True, with_ds=True)
    f_mod = jnp.where(m.free, m.f - m.A_raw(m.u_bc), 0.0)
    g_mod = -m.B_raw(m.u_bc)
    rhs_norm = float(jnp.sqrt(jnp.vdot(f_mod, f_mod) + jnp.vdot(g_mod, g_mod)))

    preA32 = ops32["preA"]

    def preA64(r):
        return preA32(r.astype(jnp.float32)).astype(jnp.float64)

    def preM64(p):
        return ops32["preM"](p.astype(jnp.float32)).astype(jnp.float64)

    def K_ds(x):
        u, p = x
        return (ops_ds["A"](u) + ops_ds["BT"](p), ops_ds["B"](u))

    def pre_ds(x):
        return (preA64(x[0]), preM64(x[1]))

    res = minres(
        K_ds, (D * f_mod, g_mod), pre=pre_ds, tol=1e-4, maxsteps=2000
    )
    assert bool(res.converged)
    x0 = D * res.x[0]
    x1 = res.x[1]
    r0 = f_mod - m.A(x0) - m.BT(x1)
    r1 = g_mod - m.B(x0)
    rel = float(jnp.sqrt(jnp.vdot(r0, r0) + jnp.vdot(r1, r1))) / rhs_norm
    assert rel < 5e-4
