"""Lid-driven cavity Navier-Stokes — the BASELINE.json config-4 geometry
("2D Navier-Stokes SIMPLE iterative, lid-driven cavity").

Unit square, lid (top) moving with u = (1, 0), no-slip walls; steady Stokes
start then transient stepping toward the recirculating steady state.
Supports both the MCS (default) and Taylor-Hood models.
"""

import sys

sys.path.insert(0, ".")

import jax

jax.config.update("jax_enable_x64", True)

import numpy as np

from navier_stokes_tpu.mesh import cavity_mesh
from navier_stokes_tpu.models.navier_stokes import NavierStokes
from navier_stokes_tpu.models.navier_stokes_mcs import NavierStokesMCS


def lid_velocity(p):
    out = np.zeros((len(p), 2))
    # regularized lid: vanishes at the corners (avoids the corner
    # singularity of the constant-lid cavity)
    out[:, 0] = 16.0 * (p[:, 0] * (1.0 - p[:, 0])) ** 2
    return out


if __name__ == "__main__":
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    taylor_hood = "--taylor-hood" in sys.argv[1:]
    mesh = cavity_mesh(0.05)
    cls = NavierStokes if taylor_hood else NavierStokesMCS
    ns = cls(
        mesh, nu=0.01, inflow="lid", outflow="", wall="wall",
        uin=lid_velocity, timestep=2e-3, order=2,
    )
    ns.SolveInitial(iterative=True, tol=1e-8, maxsteps=100000)
    print(
        f"initial Stokes: {ns.stokes_bpcg_iterations} BPCG iterations, "
        f"{ns.stokes_bpcg_time:.2f}s"
    )
    for i in range(steps):
        ns.DoTimeStep()
        if (i + 1) % 20 == 0:
            print(f"step {i + 1}: max|u dof| = {np.abs(ns.velocity).max():.4f}")
    np.savez("cavity_state.npz", velocity=ns.velocity, pressure=ns.pressure,
             points=mesh.points, elements=mesh.elements)
    print("wrote cavity_state.npz")
