"""Facet (element-boundary) geometry for tetrahedral meshes.

3D counterpart of ops/facets.py: per (element, local face) tables for
DG/HDG boundary integrals, using each face's GLOBAL sorted-vertex frame —
x(s,t) = X_g0 + s (X_g1 - X_g0) + t (X_g2 - X_g0) — so quadrature points,
facet-space basis evaluations and moments agree exactly between the two
tets sharing a face.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..fem.quadrature import triangle_rule
from ..fem.reference import TET_FACES
from ..mesh.mesh import Mesh


@dataclass(frozen=True)
class FacetGeometry3D:
    """Per (element, local_face) geometry in the global face frames."""

    qp: np.ndarray  # (nq2, 2) 2D quadrature points (s, t)
    qw: np.ndarray  # (nq2,)
    ref_points: np.ndarray  # (ne, 4, nq2, 3) element-reference coords
    normal: np.ndarray  # (ne, 4, 3) unit outward physical normal
    area: np.ndarray  # (ne, 4) physical face area (ds dt measure factor)
    frame: np.ndarray  # (ne, 4, 2, 3) physical global tangent frame (e1, e2)
    face_perm: np.ndarray  # (ne, 4, 3) local order of sorted-global vertices


def facet_geometry_3d(mesh: Mesh, degree: int) -> FacetGeometry3D:
    assert mesh.dim == 3
    rule = triangle_rule(degree)
    qp, qw = rule.points, rule.weights
    nq = len(qp)
    ne = mesh.ne
    els = mesh.elements
    pts = mesh.points
    from ..fem.reference import TET_VERTICES

    ref_points = np.zeros((ne, 4, nq, 3))
    normal = np.zeros((ne, 4, 3))
    area = np.zeros((ne, 4))
    frame = np.zeros((ne, 4, 2, 3))
    face_perm = np.zeros((ne, 4, 3), dtype=np.int32)

    # element centroids for outward orientation
    cent = pts[els].mean(axis=1)

    for lf, fverts in enumerate(TET_FACES):
        gl = els[:, list(fverts)]  # (ne, 3) global vertex ids, local order
        perm = np.argsort(gl, axis=1)  # sorted-global order positions
        face_perm[:, lf, :] = perm
        for e in range(ne):
            p = perm[e]
            lv = [TET_VERTICES[fverts[i]] for i in p]
            origin, e1r, e2r = lv[0], lv[1] - lv[0], lv[2] - lv[0]
            ref_points[e, lf] = (
                origin[None, :]
                + qp[:, 0:1] * e1r[None, :]
                + qp[:, 1:2] * e2r[None, :]
            )
            gv = pts[gl[e, p]]  # physical coords in sorted order
            E1, E2 = gv[1] - gv[0], gv[2] - gv[0]
            cr = np.cross(E1, E2)
            a = np.linalg.norm(cr)
            n = cr / a
            # orient outward
            if np.dot(n, gv[0] - cent[e]) < 0:
                n = -n
            normal[e, lf] = n
            area[e, lf] = a  # |E1 x E2| = dS/(ds dt)
            frame[e, lf, 0] = E1
            frame[e, lf, 1] = E2
    return FacetGeometry3D(
        qp=qp, qw=qw, ref_points=ref_points, normal=normal, area=area,
        frame=frame, face_perm=face_perm,
    )
