"""Vmapped parameter sweeps: ensembles of solves as one SPMD program.

The reference executes its parameter sweeps serially
(/root/reference/run.py:229-259,
/root/reference/templates/run_navier_stokes_parameter_sweep.py:49-67).  The
TPU-native replacement (SURVEY.md section 2c): make the physical parameter
(viscosity / Reynolds number) a traced argument of the fused time step, vmap
over the ensemble axis and shard it across the device mesh — one compiled
program advances the whole ensemble per step, the BASELINE.json config-5
capability ("3D SIMPLE + vmapped Reynolds-number parameter sweep").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..ops import assembly as asm
from ..solvers.cg import cg


def make_viscosity_step(model):
    """A fused IMEX step ``step(u, nu) -> u_next`` with TRACED viscosity.

    Built from the nu-independent tables of a NavierStokes model; inner
    solves use Jacobi preconditioners whose diagonals are recomputed from
    the traced nu (cheap), so one jitted function serves every ensemble
    member.
    """
    d, n, dt = model.d, model.n, model.timestep
    free = model.free_s
    f = model.f
    tu = model.tu
    K_loc, M_loc, DD_loc = model.K_loc, model.M_loc, model.DD_loc
    gd = model.grad_div
    eldofs = tu.eldofs
    convection = model.convection
    project = model._project_velocity

    diagK = asm.diagonal_of_local(K_loc, eldofs, n)
    dd_diag = jnp.einsum("eiaia->eia", DD_loc)
    diagDD = jnp.stack(
        [asm.scatter_add(dd_diag[:, :, c], eldofs, n) for c in range(d)]
    )
    diagM = asm.diagonal_of_local(M_loc, eldofs, n)

    def stokesA_raw(u2, nu):
        y = nu * jax.vmap(
            lambda uc: asm.apply_local_matrices(K_loc, eldofs, n, uc)
        )(u2)
        if gd:
            ue = u2[:, eldofs]
            loc = jnp.einsum("eiajb,bej->eia", DD_loc, ue)
            y = y + gd * nu * jax.vmap(
                lambda l: asm.scatter_add(l, eldofs, n),
                in_axes=2, out_axes=0,
            )(loc)
        return y

    def mass_raw(u2):
        return jax.vmap(
            lambda uc: asm.apply_local_matrices(M_loc, eldofs, n, uc)
        )(u2)

    def step(u, nu):
        u2 = u.reshape(d, n)
        temp = convection(u).reshape(d, n) + f - stokesA_raw(u2, nu)
        temp = jnp.where(free[None], temp, 0.0).reshape(-1)

        diag_mstar = diagM[None] + dt * nu * (diagK[None] + gd * diagDD)
        diag_mstar = jnp.where(free[None], diag_mstar, 1.0)
        inv_diag = (1.0 / diag_mstar).reshape(-1)

        def mstar(v):
            v2 = v.reshape(d, n)
            vf = jnp.where(free[None], v2, 0.0)
            y = mass_raw(vf) + dt * stokesA_raw(vf, nu)
            return jnp.where(free[None], y, v2).reshape(-1)

        temp2 = cg(
            mstar, temp, pre=lambda v: inv_diag * v, tol=1e-4, maxsteps=2000
        ).x
        temp2, _ = project(temp2)
        return u + dt * temp2

    return step


def run_reynolds_ensemble(
    model, nus, n_steps: int, device_mesh=None, axis: str = "shard"
):
    """Advance one ensemble member per viscosity for ``n_steps`` fused steps.

    Returns (len(nus), V.ndof) final velocities.  With a device mesh the
    ensemble axis is sharded (data parallelism over chips).
    """
    step = make_viscosity_step(model)
    nus = jnp.asarray(nus, model.dtype)
    batch_u = jnp.tile(model.u[None, :], (len(nus), 1))

    def advance(u_all, nu_all):
        def one(i, carry):
            return jax.vmap(step)(carry, nu_all)

        return jax.lax.fori_loop(0, n_steps, one, u_all)

    if device_mesh is not None:
        sharding = NamedSharding(device_mesh, P(axis))
        batch_u = jax.device_put(batch_u, sharding)
        nus = jax.device_put(nus, sharding)
        advance = jax.jit(advance, in_shardings=(sharding, sharding),
                          out_shardings=sharding)
    else:
        advance = jax.jit(advance)
    return advance(batch_u, nus)
