"""Upwind DG convection for 3D H(div) velocities (matrix-free).

3D counterpart of ops/convection.py.  Because the facet quadrature points
live in each face's GLOBAL sorted-vertex frame (ops/facets3d), the two
neighboring tets evaluate their traces at literally the same physical
points — the upwind switch needs no index alignment at all.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..fem.hdiv3d import HDivSpace3D
from ..fem.quadrature import tetrahedron_rule
from ..ops.facets3d import facet_geometry_3d


def build_upwind_convection_3d(
    V: HDivSpace3D,
    uin=None,
    dtype=jnp.float64,
):
    """conv(u)[i] = int (u ox u):grad(v_i) - sum_T int_dT u.n (u_up . v_i) dS
    — the weak form of -(u.grad)u for solenoidal u (see ops/convection.py)."""
    mesh = V.mesh
    k = V.order
    J, detJ, Jinv = mesh.element_jacobians
    ne = mesh.ne
    nb = V.n_basis

    vol = tetrahedron_rule(3 * k)
    v_val, v_grad = V.tabulate_elements(vol.points)
    # Piola value/gradient via batched 3x3 matmuls (generic einsum here
    # dominated the 3D model setup cost)
    val_p = np.matmul(v_val, J.transpose(0, 2, 1)[:, None]) / detJ[:, None, None, None]
    grad_p = np.matmul(
        J[:, None, None], np.matmul(v_grad, Jinv[:, None, None])
    ) / detJ[:, None, None, None, None]

    fg = facet_geometry_3d(mesh, 2 * k + 2)
    nq2 = len(fg.qp)

    nfacet = mesh.nfacet
    fe_pairs = [[] for _ in range(nfacet)]
    for lf in range(4):
        for e, f in enumerate(mesh.element_faces[:, lf]):
            fe_pairs[f].append((e, lf))

    trace = np.zeros((2, nfacet, nq2, nb, 3))
    side_elem = np.zeros((2, nfacet), dtype=np.int64)
    side_lf = np.zeros((2, nfacet), dtype=np.int64)
    has_right = np.zeros(nfacet, dtype=bool)
    n_g = np.zeros((nfacet, 3))
    area = np.zeros(nfacet)
    for f, pairs in enumerate(fe_pairs):
        for s, (e, lf) in enumerate(pairs):
            side_elem[s, f] = e
            side_lf[s, f] = lf
        e0, lf0 = pairs[0]
        n_g[f] = fg.normal[e0, lf0]
        area[f] = fg.area[e0, lf0]
        if len(pairs) == 2:
            has_right[f] = True
        else:
            side_elem[1, f] = side_elem[0, f]
            side_lf[1, f] = side_lf[0, f]

    # physical traces, grouped by (combo, local face): ~24 distinct
    # reference tabulations, each pushed through its group's Piola maps as
    # one batched matmul (the per-facet einsum loop was a setup hotspot)
    ref_tab: dict[tuple[int, int], np.ndarray] = {}
    for s in (0, 1):
        els, lfs = side_elem[s], side_lf[s]
        cids = V.combo_ids[els]
        for cid in range(len(V.bases)):
            for lf in range(4):
                sel = np.where((cids == cid) & (lfs == lf))[0]
                if not len(sel):
                    continue
                key = (cid, lf)
                if key not in ref_tab:
                    ref_tab[key] = V.bases[cid].tabulate(
                        fg.ref_points[els[sel[0]], lf]
                    )[0]  # (nq2, nb, 3)
                eg = els[sel]
                trace[s, sel] = np.matmul(
                    ref_tab[key][None], J[eg].transpose(0, 2, 1)[:, None]
                ) / detJ[eg, None, None, None]

    # boundary data at global-frame face quad points
    pts_f = np.zeros((nfacet, nq2, 3))
    pv = mesh.points[mesh.faces]  # (nfacet, 3, 3) sorted vertices
    pts_f = (
        pv[:, 0][:, None, :]
        + fg.qp[None, :, 0:1] * (pv[:, 1] - pv[:, 0])[:, None, :]
        + fg.qp[None, :, 1:2] * (pv[:, 2] - pv[:, 0])[:, None, :]
    )
    if uin is not None:
        ub = uin(pts_f.reshape(-1, 3)).reshape(nfacet, nq2, 3)
    else:
        ub = np.zeros((nfacet, nq2, 3))
    ub = np.where(has_right[:, None, None], 0.0, ub)

    eldofs = jnp.asarray(V.element_dofs[:, :nb])
    dofs_L = jnp.asarray(V.element_dofs[side_elem[0], :nb])
    dofs_R = jnp.asarray(V.element_dofs[side_elem[1], :nb])
    trace_L = jnp.asarray(trace[0], dtype)
    trace_R = jnp.asarray(trace[1], dtype)
    n_g_j = jnp.asarray(n_g, dtype)
    area_j = jnp.asarray(area, dtype)
    ub_j = jnp.asarray(ub, dtype)
    has_right_j = jnp.asarray(has_right)
    w2 = jnp.asarray(fg.qw, dtype)
    wq = jnp.asarray(vol.weights, dtype)
    val_p_j = jnp.asarray(val_p, dtype)
    grad_p_j = jnp.asarray(grad_p, dtype)
    detj_j = jnp.asarray(detJ, dtype)
    ndof = V.ndof

    def conv(u):
        ue = u[eldofs]
        uq = jnp.einsum("eqic,ei->eqc", val_p_j, ue, optimize=True)
        fe_vol = jnp.einsum(
            "q,eqc,eqd,eqicd,e->ei", wq, uq, uq, grad_p_j, detj_j
        , optimize=True)
        out = jnp.zeros(ndof, u.dtype).at[eldofs].add(fe_vol)

        uL = jnp.einsum("fqic,fi->fqc", trace_L, u[dofs_L], optimize=True)
        uR_in = jnp.einsum("fqic,fi->fqc", trace_R, u[dofs_R], optimize=True)
        uR = jnp.where(has_right_j[:, None, None], uR_in, ub_j)
        un = jnp.einsum("fqc,fc->fq", uL, n_g_j, optimize=True)
        u_up = jnp.where(un[..., None] > 0, uL, uR)
        flux = un[..., None] * u_up
        fe_L = -jnp.einsum("q,fqc,fqic,f->fi", w2, flux, trace_L, area_j, optimize=True)
        fe_R = jnp.einsum("q,fqc,fqic,f->fi", w2, flux, trace_R, area_j, optimize=True)
        fe_R = jnp.where(has_right_j[:, None], fe_R, 0.0)
        out = out.at[dofs_L].add(fe_L)
        out = out.at[dofs_R].add(fe_R)
        return out

    return conv
