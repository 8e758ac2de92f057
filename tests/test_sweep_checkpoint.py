"""Vmapped Reynolds ensemble sweep + checkpoint/resume."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from navier_stokes_tpu.mesh import channel_with_cylinder_mesh
from navier_stokes_tpu.models.navier_stokes import NavierStokes
from navier_stokes_tpu.parallel.sharding import device_mesh
from navier_stokes_tpu.parallel.sweep import (
    make_viscosity_step,
    run_reynolds_ensemble,
)
from navier_stokes_tpu.utils.checkpoint import load_state, save_state


def uin(p):
    out = np.zeros((len(p), 2))
    out[:, 0] = 1.5 * 4 * p[:, 1] * (0.41 - p[:, 1]) / 0.41**2
    return out


@pytest.fixture(scope="module")
def ns():
    mesh = channel_with_cylinder_mesh(0.15)
    model = NavierStokes(
        mesh, nu=0.001, inflow="inlet", outflow="outlet", wall="wall|cyl",
        uin=uin, timestep=1e-3, order=2, preconditioner="jacobi",
    )
    model.SolveInitial(iterative=True, tol=1e-8)
    return model


def test_viscosity_step_matches_do_time_step(ns):
    u0 = ns.u
    step = make_viscosity_step(ns)
    u1 = step(u0, jnp.asarray(ns.nu))
    ns.DoTimeStep()
    assert float(jnp.abs(u1 - ns.u).max()) < 1e-7
    ns.u = u0  # restore for other tests


def test_reynolds_ensemble_sharded(ns):
    mesh = device_mesh(8)
    nus = np.geomspace(1e-3, 1e-2, 8)
    out = run_reynolds_ensemble(ns, nus, 2, device_mesh=mesh)
    assert out.shape == (8, ns.V.ndof)
    assert bool(jnp.all(jnp.isfinite(out)))
    # viscosity actually matters
    assert float(jnp.abs(out[0] - out[-1]).max()) > 1e-8


def test_checkpoint_roundtrip(tmp_path, ns):
    path = str(tmp_path / "state.npz")
    u0, p0 = ns.u, ns.p
    save_state(path, ns, time=0.123, step=7)
    ns.u = jnp.zeros_like(ns.u)
    t, s = load_state(path, ns)
    assert (t, s) == (0.123, 7)
    assert np.array_equal(np.asarray(ns.u), np.asarray(u0))
    # resuming continues identically
    ns.DoTimeStep()
    u_after = np.asarray(ns.u).copy()
    load_state(path, ns)
    ns.DoTimeStep()
    assert np.array_equal(np.asarray(ns.u), u_after)


def test_checkpoint_incompatible_raises(tmp_path, ns):
    path = str(tmp_path / "state.npz")
    save_state(path, ns)
    mesh2 = channel_with_cylinder_mesh(0.2)
    other = NavierStokes(
        mesh2, nu=0.001, inflow="inlet", outflow="outlet", wall="wall|cyl",
        uin=uin, timestep=1e-3, order=2, preconditioner="jacobi",
    )
    with pytest.raises(ValueError):
        load_state(path, other)


# ---------------------------------------------------------------------------
# Flagship (MCS) viscosity ensemble — BASELINE config 5 on the 3D model
# ---------------------------------------------------------------------------


def uin3(p):
    H = 0.41
    out = np.zeros((len(p), 3))
    out[:, 0] = 16 * p[:, 1] * (H - p[:, 1]) * p[:, 2] * (H - p[:, 2]) / H**4
    return out


@pytest.fixture(scope="module")
def ns_mcs3d():
    from navier_stokes_tpu.mesh import channel_with_cylinder_mesh_3d
    from navier_stokes_tpu.models.navier_stokes_mcs import NavierStokesMCS

    mesh = channel_with_cylinder_mesh_3d(0.35)
    model = NavierStokesMCS(
        mesh, nu=0.001, inflow="inlet", outflow="outlet", wall="wall|cyl",
        uin=uin3, timestep=2e-3, order=2,
    )
    model.SolveInitial(iterative=True, GS=False, tol=1e-8)
    return model


def test_mcs_nu_split_tables_exact(ns_mcs3d):
    """A_cond(nu) = nu G1 + G2 + G3/nu reproduces a fresh condensation at a
    DIFFERENT viscosity to rounding."""
    from navier_stokes_tpu.models.navier_stokes_mcs import NavierStokesMCS
    from navier_stokes_tpu.parallel.sweep import mcs_nu_split_tables

    m = ns_mcs3d
    G1, G2, G3 = mcs_nu_split_tables(m)
    nu2 = 0.004
    m2 = NavierStokesMCS(
        m.mesh, nu=nu2, inflow="inlet", outflow="outlet", wall="wall|cyl",
        uin=uin3, timestep=2e-3, order=2,
    )
    pred = nu2 * G1 + G2 + G3 / nu2
    ref = np.asarray(m2.A_cond_np)
    scale = np.abs(ref).max()
    assert np.abs(pred - ref).max() / scale < 1e-10


def test_mcs_viscosity_step_matches_do_time_step(ns_mcs3d):
    from navier_stokes_tpu.parallel.sweep import make_viscosity_step_mcs

    ns = ns_mcs3d
    u0 = ns.u
    step = make_viscosity_step_mcs(ns)
    u1 = step(u0, jnp.asarray(ns.nu))
    ns.DoTimeStep()
    scale = float(jnp.abs(ns.u).max())
    assert float(jnp.abs(u1 - ns.u).max()) / scale < 1e-6
    ns.u = u0


def test_mcs_reynolds_ensemble_sharded(ns_mcs3d):
    from navier_stokes_tpu.parallel.sweep import run_reynolds_ensemble_mcs

    mesh = device_mesh(8)
    nus = np.geomspace(1e-3, 1e-2, 8)
    out = run_reynolds_ensemble_mcs(ns_mcs3d, nus, 2, device_mesh=mesh)
    assert out.shape == (8, ns_mcs3d.n)
    assert bool(jnp.all(jnp.isfinite(out)))
    assert float(jnp.abs(out[0] - out[-1]).max()) > 1e-8
