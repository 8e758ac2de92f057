"""Upwind DG convection for H(div)-conforming velocities (matrix-free).

Replacement for the reference's convection operator
(/root/reference/templates/NavierStokesSIMPLE_iterative.py:106-113): a
nonassembled DG form int (u ox u) : grad v plus the upwind facet flux
``-IfPos(u.n, u.n u.v, u.n u_other.v)`` evaluated on a piola-mapped
VectorL2 embedding with runtime-generated C code
(Compile(realcompile=True)).  Here the same weak operator is a pure jitted
function: volume term as batched einsum over quadrature points, facet flux
as a vectorized per-facet kernel with jnp.where for the upwinding, boundary
"other" values taken from the inflow profile (u.Other(bnd=uin) semantics).

H(div) velocities have continuous normal flux u.n, so the switch
IfPos(u.n, ...) is well defined facet-wise; only tangential components jump.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..fem.hdiv import HDivSpace
from ..fem.quadrature import triangle_rule
from ..ops.facets import facet_geometry


def build_upwind_convection(
    V: HDivSpace,
    uin=None,
    nq1: int | None = None,
    dtype=jnp.float64,
):
    """Returns conv(u) -> test-functional vector on V dofs:

      conv(u)[i] = int (u ox u):grad(v_i)
                 - sum_T int_dT u.n (u_upwind . v_i) ds

    which for solenoidal u is the weak form of -(u.grad)u (the sign the
    IMEX update u += dt*(conv + f - A u) expects).
    """
    mesh = V.mesh
    hb = V.basis
    k = hb.order
    if nq1 is None:
        nq1 = 2 * k + 2
    J, detJ, Jinv = mesh.element_jacobians

    # -- volume term tables -------------------------------------------------
    vol = triangle_rule(3 * k)
    v_val, v_grad = hb.tabulate(vol.points)
    # Piola values and gradients
    val_p = np.einsum("ecA,qiA->eqic", J, v_val) / detJ[:, None, None, None]
    grad_p = np.einsum(
        "ecA,qiAB,eBd->eqicd", J, v_grad, Jinv
    ) / detJ[:, None, None, None, None]
    signs = V.element_signs
    val_p = val_p * signs[:, None, :, None]
    grad_p = grad_p * signs[:, None, :, None, None]

    # -- facet tables (global-t aligned, per facet side) --------------------
    fg = facet_geometry(mesh, nq1)
    t, w1 = fg.t, fg.w
    tv = [hb.tabulate(fg.ref_points[le])[0] for le in range(3)]  # (nq,nb,2)

    nfacet = mesh.nfacet
    fe_pairs = [[] for _ in range(nfacet)]  # (elem, local_edge) per side
    for le in range(3):
        for e, f in enumerate(mesh.element_edges[:, le]):
            fe_pairs[f].append((e, le))

    nb = hb.n_basis
    trace = np.zeros((2, nfacet, nq1, nb, 2))
    side_elem = np.zeros((2, nfacet), dtype=np.int64)
    has_right = np.zeros(nfacet, dtype=bool)
    for f, pairs in enumerate(fe_pairs):
        for s, (e, le) in enumerate(pairs):
            vals = np.einsum("cA,qiA->qic", J[e], tv[le]) / detJ[e]
            vals = vals * signs[e][None, :, None]
            if fg.flip[e, le]:
                vals = vals[::-1]  # align ascending global t (GL symmetric)
            trace[s, f] = vals
            side_elem[s, f] = e
        if len(pairs) == 2:
            has_right[f] = True
        else:
            side_elem[1, f] = side_elem[0, f]

    # left outward normal / edge length in GLOBAL orientation terms
    eL = side_elem[0]
    # find local edge of left element again for geometry
    n_g = np.zeros((nfacet, 2))
    elen = np.zeros(nfacet)
    for f, pairs in enumerate(fe_pairs):
        e, le = pairs[0]
        n_g[f] = fg.normal[e, le]
        elen[f] = fg.elen[e, le]

    # boundary "other" values: uin evaluated at facet quad points (the
    # u.Other(bnd=uin) semantics; only matters where u.n < 0)
    ev = mesh.points[mesh.edges]
    pa, pb = ev[:, 0], ev[:, 1]
    pts_f = pa[:, None, :] + t[None, :, None] * (pb - pa)[:, None, :]
    if uin is not None:
        ub = uin(pts_f.reshape(-1, 2)).reshape(nfacet, nq1, 2)
    else:
        ub = np.zeros((nfacet, nq1, 2))
    ub = np.where(has_right[:, None, None], 0.0, ub)

    # device constants
    eldofs = jnp.asarray(V.element_dofs)
    dofs_L = jnp.asarray(V.element_dofs[side_elem[0]])
    dofs_R = jnp.asarray(V.element_dofs[side_elem[1]])
    trace_L = jnp.asarray(trace[0], dtype)
    trace_R = jnp.asarray(trace[1], dtype)
    n_g_j = jnp.asarray(n_g, dtype)
    elen_j = jnp.asarray(elen, dtype)
    ub_j = jnp.asarray(ub, dtype)
    has_right_j = jnp.asarray(has_right)
    w1_j = jnp.asarray(w1, dtype)
    wq = jnp.asarray(vol.weights, dtype)
    val_p_j = jnp.asarray(val_p, dtype)
    grad_p_j = jnp.asarray(grad_p, dtype)
    detj_j = jnp.asarray(detJ, dtype)
    ndof = V.ndof

    def conv(u):
        ue = u[eldofs]  # (ne, nb) raw coefficients (signs folded in tables)
        # volume: int (u ox u) : grad v
        uq = jnp.einsum("eqic,ei->eqc", val_p_j, ue)
        fe_vol = jnp.einsum(
            "q,eqc,eqd,eqicd,e->ei", wq, uq, uq, grad_p_j, detj_j
        )
        out = jnp.zeros(ndof, u.dtype).at[eldofs].add(fe_vol)

        # facets: - u.n (u_up . v) with left-outward normal convention
        uL = jnp.einsum("fqic,fi->fqc", trace_L, u[dofs_L])
        uR_in = jnp.einsum("fqic,fi->fqc", trace_R, u[dofs_R])
        uR = jnp.where(has_right_j[:, None, None], uR_in, ub_j)
        un = jnp.einsum("fqc,fc->fq", uL, n_g_j)
        u_up = jnp.where(un[..., None] > 0, uL, uR)
        flux = un[..., None] * u_up  # (nf, nq, 2)
        fe_L = -jnp.einsum("q,fqc,fqic,f->fi", w1_j, flux, trace_L, elen_j)
        fe_R = jnp.einsum("q,fqc,fqic,f->fi", w1_j, flux, trace_R, elen_j)
        fe_R = jnp.where(has_right_j[:, None], fe_R, 0.0)
        out = out.at[dofs_L].add(fe_L)
        out = out.at[dofs_R].add(fe_R)
        return out

    return conv
