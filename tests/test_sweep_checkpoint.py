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
