"""Standalone MCS Stokes on the channel-with-cylinder — the
/root/reference/stokes_hcurldiv.py equivalent (maxh 0.06, MCS triple,
parabolic inflow).  The reference solves its compressed/condensed system
with Bramble-Pasciak CG; this standalone uses the direct path and reports
the iterative MINRES device path alongside."""

import sys

sys.path.insert(0, ".")

import jax

jax.config.update("jax_enable_x64", True)

import numpy as np

from navier_stokes_tpu.mesh import channel_with_cylinder_mesh
from navier_stokes_tpu.models import stokes as st
from navier_stokes_tpu.models.stokes_mcs import (
    assemble_mcs_stokes,
    mcs_discretization,
    solve_mcs_direct,
    solve_mcs_minres,
)

if __name__ == "__main__":
    maxh = float(sys.argv[1]) if len(sys.argv) > 1 else 0.06
    mesh = channel_with_cylinder_mesh(maxh)
    disc, order = mcs_discretization(2)
    V, S, Q = disc(mesh, velocity_dirichlet="wall|inlet|cyl",
                   velocity_neumann="outlet")
    print(f"mesh h={maxh}: ndofs V={V.ndof} S={S.ndof} Q={Q.ndof}")
    system = assemble_mcs_stokes(
        mesh, V, S, Q, st.default_volume_force, st.default_inlet_profile()
    )
    x, t = solve_mcs_direct(system)
    print(f"direct solve: {t:.3f}s")
    x2, res = solve_mcs_minres(system, tol=1e-8, maxsteps=50000)
    print(
        f"MINRES: {int(res.iterations)} iterations, "
        f"agree to {np.abs(x - x2).max():.2e}"
    )
    o1, o2 = system.offsets
    np.savez("mcs_state.npz", velocity=x[:o1], pressure=x[o2:],
             points=mesh.points, elements=mesh.elements)
    print("wrote mcs_state.npz")
