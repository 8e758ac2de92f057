"""General polygon mesh frontend: geometry sanity + a physics solve on a
non-benchmark domain (the reference meshes arbitrary 2D spline geometries
through Netgen, /root/reference/run.py:22-29; polygon_mesh is this
framework's polygonal slice of that capability)."""

import jax
import jax.numpy as jnp
import numpy as np

from navier_stokes_tpu.fem.spaces import H1
from navier_stokes_tpu.mesh import extrude_to_tets, polygon_mesh
from navier_stokes_tpu.ops import assembly as asm
from navier_stokes_tpu.solvers.cg import cg


L_SHAPE = np.array(
    [[0, 0], [2, 0], [2, 1], [1, 1], [1, 2], [0, 2]], np.float64
)


def _areas(mesh):
    v = mesh.points[mesh.elements]
    return 0.5 * np.abs(
        (v[:, 1, 0] - v[:, 0, 0]) * (v[:, 2, 1] - v[:, 0, 1])
        - (v[:, 2, 0] - v[:, 0, 0]) * (v[:, 1, 1] - v[:, 0, 1])
    )


def test_polygon_mesh_l_shape_geometry():
    names = ["bottom", "right", "top1", "inner", "top2", "left"]
    mesh = polygon_mesh(L_SHAPE, maxh=0.12, names=names)
    # area of the L: 2x2 minus the 1x1 notch
    assert abs(_areas(mesh).sum() - 3.0) < 1e-9
    # every boundary facet tagged exactly once
    n_tagged = sum(len(v) for v in mesh.boundary_tags.values())
    assert n_tagged == len(mesh.boundary_facets)
    for nm in names:
        assert len(mesh.boundary_tags[nm]) > 0, nm
    # element quality after smoothing: no degenerate slivers
    a = _areas(mesh)
    assert a.min() > 1e-4 * a.max()


def test_polygon_mesh_with_hole_solves_poisson():
    outer = np.array([[0, 0], [1.6, 0], [1.6, 1], [0, 1]], np.float64)
    hole = np.array(
        [[0.6, 0.4], [1.0, 0.4], [1.0, 0.6], [0.6, 0.6]], np.float64
    )
    mesh = polygon_mesh(outer, maxh=0.08, holes=[hole],
                        names=["outer"] * 4, hole_names=["obstacle"])
    assert abs(_areas(mesh).sum() - (1.6 - 0.4 * 0.2)) < 1e-9
    assert len(mesh.boundary_tags["obstacle"]) > 0

    # Poisson with Dirichlet on everything: -lap u = 1, u > 0 inside
    V = H1(mesh, 2, dirichlet="outer|obstacle")
    t = asm.make_tables(V)
    K = asm.stiffness_local(t)
    free = jnp.asarray(V.free_mask)

    def A(u):
        uf = jnp.where(free, u, 0.0)
        y = asm.apply_local_matrices(K, t.eldofs, V.ndof, uf)
        return jnp.where(free, y, u)

    M = asm.mass_local(t)
    one = jnp.ones(V.ndof)
    rhs = jnp.where(
        free, asm.apply_local_matrices(M, t.eldofs, V.ndof, one), 0.0
    )
    res = cg(A, rhs, tol=1e-10, maxsteps=2000)
    assert bool(res.converged)
    u = np.asarray(res.x)
    assert u.max() > 0  # source lifts the solution
    assert np.isfinite(u).all()


def test_polygon_mesh_extrudes_to_tets():
    mesh2 = polygon_mesh(L_SHAPE, maxh=0.25)
    mesh3 = extrude_to_tets(mesh2, np.linspace(0.0, 0.5, 3))
    v = mesh3.points[mesh3.elements]
    J = np.stack([v[:, i + 1] - v[:, 0] for i in range(3)], axis=2)
    det = np.linalg.det(J)
    assert (det > 0).all()
    # total volume = L area * height
    assert abs(det.sum() / 6.0 - 3.0 * 0.5) < 1e-9
