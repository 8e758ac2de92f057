"""Curved (isoparametric) geometry: the mesh.Curve(3) parity path."""

import numpy as np
import pytest

from navier_stokes_tpu.fem.quadrature import triangle_rule
from navier_stokes_tpu.mesh import channel_with_cylinder_mesh
from navier_stokes_tpu.mesh.curved import curve_to_circle, geometry_tables
from navier_stokes_tpu.models import stokes as st
from navier_stokes_tpu.models.discretizations import taylor_hood


@pytest.fixture(scope="module")
def channel():
    return channel_with_cylinder_mesh(0.1)


def test_curved_area_beats_polygonal(channel):
    exact = 2 * 0.41 - np.pi * 0.05**2
    _, detJ, _ = channel.element_jacobians
    poly_err = abs(detJ.sum() / 2 - exact) / exact
    geo = curve_to_circle(channel, "cyl", (0.2, 0.2), 0.05, order=3)
    q = triangle_rule(8)
    _, dJ, _, _ = geometry_tables(geo, q.points)
    curved_err = abs(np.einsum("q,eq->", q.weights, dJ) - exact) / exact
    assert curved_err < poly_err / 50


def test_interior_elements_stay_affine(channel):
    geo = curve_to_circle(channel, "cyl", (0.2, 0.2), 0.05, order=2)
    q = triangle_rule(4)
    _, dJ, _, _ = geometry_tables(geo, q.points)
    _, detJ_aff, _ = channel.element_jacobians
    # an element far from the cylinder has constant detJ equal to the affine one
    cent = channel.points[channel.elements].mean(axis=1)
    far = np.argmax(np.hypot(cent[:, 0] - 0.2, cent[:, 1] - 0.2))
    assert np.abs(dJ[far] - detJ_aff[far]).max() < 1e-13


def test_curved_stokes_solves(channel):
    geo = curve_to_circle(channel, "cyl", (0.2, 0.2), 0.05, order=3)
    disc, _ = taylor_hood(2)
    system = st.build_stokes_system(
        channel, disc, uin=st.default_inlet_profile(), geometry=geo,
        a_pre="twolevel",
    )
    u, p, errs, tm, nd = st.solve_with_bramble_pasciak_cg(
        system, tolerance=1e-8, max_steps=20000
    )
    assert errs[-1] < 1e-7
    assert np.all(np.isfinite(np.asarray(u)))
