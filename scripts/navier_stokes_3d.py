"""3D Navier-Stokes demo — the templates/NavierStokesSIMPLE_test_3D.py
equivalent: brick channel with z-axis cylinder, nu=0.001, order 2, dt=2e-3,
inlet profile 16 y (0.41-y) z (0.41-z) / 0.41^4 (test_3D.py:20-25).

Default model = the MCS NavierStokes (the reference demo drives the same
dimension-generic class, test_3D.py:20-28); ``--hdg`` selects the
interior-penalty H(div) substitute, ``--th`` the Taylor-Hood variant."""

import sys

sys.path.insert(0, ".")

import jax

jax.config.update("jax_enable_x64", True)

import numpy as np

from navier_stokes_tpu.mesh.generators import channel_with_cylinder_mesh_3d
from navier_stokes_tpu.models.navier_stokes import NavierStokes
from navier_stokes_tpu.models.navier_stokes_hdg3d import NavierStokesHDG3D
from navier_stokes_tpu.models.navier_stokes_mcs import NavierStokesMCS


def uin(p):
    out = np.zeros((len(p), 3))
    out[:, 0] = (
        16 * p[:, 1] * (0.41 - p[:, 1]) * p[:, 2] * (0.41 - p[:, 2]) / 0.41**4
    )
    return out


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    steps = int(args[0]) if args else 50
    maxh = float(args[1]) if len(args) > 1 else 0.1
    mesh = channel_with_cylinder_mesh_3d(maxh)
    print(f"mesh: {mesh.nv} vertices, {mesh.ne} tets")
    if "--hdg" in sys.argv[1:] or "--hdiv" in sys.argv[1:]:
        ns = NavierStokesHDG3D(
            mesh, nu=0.001, inflow="inlet", outflow="outlet", wall="wall|cyl",
            uin=uin, timestep=2e-3, order=2,
        )
        print(f"ndofs: V={ns.Xv.ndof} Q={ns.Q.ndof}")
    elif "--th" in sys.argv[1:]:
        ns = NavierStokes(
            mesh, nu=0.001, inflow="inlet", outflow="outlet", wall="wall|cyl",
            uin=uin, timestep=2e-3, order=2,
        )
        print(f"ndofs: V={ns.V.ndof} Q={ns.Q.ndof}")
    else:
        # the flagship: MCS (the reference demo's model)
        ns = NavierStokesMCS(
            mesh, nu=0.001, inflow="inlet", outflow="outlet", wall="wall|cyl",
            uin=uin, timestep=2e-3, order=2,
        )
        print(f"ndofs: X={ns.n} Q={ns.Q.ndof}")
    ns.SolveInitial(iterative=True)
    print(
        f"initial Stokes: {ns.stokes_bpcg_iterations} BPCG iterations, "
        f"{ns.stokes_bpcg_time:.2f}s"
    )
    for i in range(steps):
        ns.DoTimeStep()
        if (i + 1) % 10 == 0:
            print(f"step {i + 1}: max|u| = {np.abs(ns.velocity).max():.4f}")
    np.savez(
        "ns3d_state.npz", velocity=ns.velocity, pressure=ns.pressure,
        points=mesh.points, elements=mesh.elements,
    )
    print("wrote ns3d_state.npz")
