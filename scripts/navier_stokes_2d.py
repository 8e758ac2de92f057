"""2D Navier-Stokes demo — the templates/NavierStokesSIMPLE_test.py
equivalent: channel-with-cylinder, nu=0.001, order 2, dt=1e-3; initial
steady Stokes solve, then transient stepping.  Writes velocity/pressure
snapshots as npz + a headless plot instead of the netgen GUI."""

import sys

sys.path.insert(0, ".")

import jax

jax.config.update("jax_enable_x64", True)

import numpy as np

from navier_stokes_tpu.mesh import channel_with_cylinder_mesh
from navier_stokes_tpu.models.navier_stokes import NavierStokes
from navier_stokes_tpu.models.navier_stokes_mcs import NavierStokesMCS


def uin(p):
    out = np.zeros((len(p), 2))
    out[:, 0] = 1.5 * 4 * p[:, 1] * (0.41 - p[:, 1]) / 0.41**2
    return out


if __name__ == "__main__":
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    mesh = channel_with_cylinder_mesh(0.05)  # reference maxh (test.py:10)
    ns = NavierStokes(
        mesh, nu=0.001, inflow="inlet", outflow="outlet", wall="wall|cyl",
        uin=uin, timestep=1e-3, order=2,
    )
    ns.SolveInitial(iterative=True)
    print(
        f"initial Stokes: {ns.stokes_bpcg_iterations} BPCG iterations, "
        f"{ns.stokes_bpcg_time:.2f}s"
    )
    for i in range(steps):
        ns.DoTimeStep()
        if (i + 1) % 20 == 0:
            umax = float(np.abs(ns.velocity).max())
            print(f"step {i + 1}: max|u| = {umax:.4f}")
    np.savez(
        "ns2d_state.npz", velocity=ns.velocity, pressure=ns.pressure,
        points=mesh.points, elements=mesh.elements,
    )
    print("wrote ns2d_state.npz")

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        if taylor_hood:
            vmag = np.hypot(
                ns.velocity[0][: mesh.nv], ns.velocity[1][: mesh.nv]
            )
        else:
            # H(div) dofs: evaluate |u| at element centroids -> vertex avg
            from navier_stokes_tpu.fem.quadrature import triangle_rule

            q = triangle_rule(1)
            vals_ref, _ = ns.V.basis.tabulate(q.points)
            J, detJ, _ = mesh.element_jacobians
            ue = ns.velocity[ns.V.element_dofs] * ns.V.element_signs
            val_p = np.einsum(
                "ecA,qiA->eqic", J, vals_ref
            ) / detJ[:, None, None, None]
            uc = np.einsum("eqic,ei->ec", val_p, ue)
            vmag = np.zeros(mesh.nv)
            cnt = np.zeros(mesh.nv)
            np.add.at(vmag, mesh.elements.ravel(),
                      np.repeat(np.hypot(uc[:, 0], uc[:, 1]), 3))
            np.add.at(cnt, mesh.elements.ravel(), 1.0)
            vmag /= np.maximum(cnt, 1)
        fig, ax = plt.subplots(figsize=(10, 2.5))
        t = ax.tripcolor(
            mesh.points[:, 0], mesh.points[:, 1], mesh.elements, vmag,
            shading="gouraud",
        )
        fig.colorbar(t, ax=ax, label="|u|")
        ax.set_aspect("equal")
        fig.savefig("ns2d_velocity.png", dpi=130, bbox_inches="tight")
        print("wrote ns2d_velocity.png")
    except Exception as e:  # pragma: no cover
        print("plot skipped:", e)
