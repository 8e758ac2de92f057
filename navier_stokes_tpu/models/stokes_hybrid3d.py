"""3D hybrid-DG Stokes on BDM tets x tangential facet spaces.

The 3D counterpart of models/stokes_hybrid.py (the reference's HDG family,
run.py:114-172, extended to tetrahedra): BDM_k H(div) velocity (fem/hdiv3d),
tangential facet unknowns in each face's global frame, interior-penalty
viscous coupling, discontinuous P_{k-1} pressure.

Facet space: per global face, 2 * nfd dofs — coefficients of
phi_j(s,t) * E_c where phi is the orthonormal Dubiner basis in the face's
sorted-global parametrization and (E_1, E_2) the physical global tangent
frame.  Both neighboring tets evaluate these identically, so no orientation
algebra is needed.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import cached_property

import jax
import jax.numpy as jnp
import numpy as np

from ..fem.hdiv3d import HDiv3D, HDivSpace3D
from ..fem.quadrature import tetrahedron_rule
from ..fem.reference import triangle_modal
from ..fem.spaces import L2, FunctionSpace
from ..ops import assembly as asm
from ..ops.facets3d import facet_geometry_3d
from .stokes import StokesSystem


@dataclass
class TangentialFacetSpace3D:
    mesh: object
    order: int
    ndof: int
    dirichlet_names: str = ""

    @property
    def n_scalar(self) -> int:  # scalar modes per face
        return (self.order + 1) * (self.order + 2) // 2

    @property
    def n_face(self) -> int:  # dofs per face (2 frame components)
        return 2 * self.n_scalar

    @cached_property
    def free_mask(self) -> np.ndarray:
        return ~self.boundary_dof_mask(self.dirichlet_names)

    def boundary_dof_mask(self, names: str) -> np.ndarray:
        mask = np.zeros(self.ndof, dtype=bool)
        if not names:
            return mask
        nfd = self.n_face
        for f in self.mesh.boundary_facet_ids(names):
            mask[f * nfd: (f + 1) * nfd] = True
        return mask


def VectorFacet3D(mesh, order: int, dirichlet: str = "") -> TangentialFacetSpace3D:
    nfd = 2 * (order + 1) * (order + 2) // 2
    return TangentialFacetSpace3D(mesh, order, mesh.nface * nfd, dirichlet)


@dataclass
class HybridVelocitySpace3D:
    hdiv: HDivSpace3D
    facet: TangentialFacetSpace3D

    @property
    def mesh(self):
        return self.hdiv.mesh

    @property
    def ndof(self) -> int:
        return self.hdiv.ndof + self.facet.ndof

    @property
    def order(self) -> int:
        return self.hdiv.order

    @cached_property
    def free_mask(self) -> np.ndarray:
        return np.concatenate([self.hdiv.free_mask, self.facet.free_mask])

    @cached_property
    def element_dofs(self) -> np.ndarray:
        mesh = self.mesh
        nfd = self.facet.n_face
        fac = np.zeros((mesh.ne, 4 * nfd), dtype=np.int32)
        for lf in range(4):
            base = self.hdiv.ndof + mesh.element_faces[:, lf] * nfd
            for j in range(nfd):
                fac[:, lf * nfd + j] = base + j
        return np.concatenate([self.hdiv.element_dofs, fac], axis=1)


def bdm_hybrid_3d(order: int, penalty: float = 10.0):
    """3D HDG catalog entry: BDM_k x facet_k x P_{k-1}dc."""

    def discretization(mesh, velocity_dirichlet):
        V = HDiv3D(mesh, order, dirichlet=velocity_dirichlet)
        F = VectorFacet3D(mesh, order, dirichlet=velocity_dirichlet)
        Q = L2(mesh, order - 1)
        return HybridVelocitySpace3D(V, F), Q

    return (discretization, order)


def assemble_hdg_stokes_3d(
    V: HybridVelocitySpace3D, Q: FunctionSpace, alpha: float = 10.0,
    nu: float = 1.0,
):
    mesh = V.mesh
    hd = V.hdiv
    k = hd.order
    nbv = hd.n_basis
    nss = V.facet.n_scalar
    nfd = V.facet.n_face  # 2 * nss
    nloc = nbv + 4 * nfd

    J, detJ, Jinv = mesh.element_jacobians
    ne = mesh.ne
    vol = tetrahedron_rule(2 * k + 2)
    w = vol.weights

    v_val, v_grad = hd.tabulate_elements(vol.points)  # per-element tables
    # Piola: value J vhat / detJ; gradient J Ghat Jinv / detJ
    val_p = np.einsum("ecA,eqiA->eqic", J, v_val, optimize=True) / detJ[:, None, None, None]
    grad_p = np.einsum(
        "ecA,eqiAB,eBd->eqicd", J, v_grad, Jinv
    , optimize=True) / detJ[:, None, None, None, None]

    A = np.zeros((ne, nloc, nloc))
    A[:, :nbv, :nbv] = nu * np.einsum(
        "q,eqicd,eqjcd,e->eij", w, grad_p, grad_p, detJ
    , optimize=True)

    fg = facet_geometry_3d(mesh, 2 * k + 2)
    fvals, _ = triangle_modal(fg.qp, V.facet.order)  # (nq2, nss)
    nq2 = len(fg.qp)
    for lf in range(4):
        pts = fg.ref_points[:, lf]  # (ne, nq2, 3) per-element ref coords
        # volume basis traces at per-element points: tabulate per combo is
        # not enough (points differ per element) -> evaluate via the modal
        # frame once per element group; simpler: loop over combo groups
        tv = np.zeros((ne, nq2, nbv, 3))
        tg = np.zeros((ne, nq2, nbv, 3, 3))
        for cid in range(len(hd.bases)):
            sel = np.where(hd.combo_ids == cid)[0]
            if not len(sel):
                continue
            # points identical within a combo group? ref_points depend on
            # the face perm only -> same for all elements of the combo
            p0 = pts[sel[0]]
            vals_c, grads_c = hd.bases[cid].tabulate(p0)
            tv[sel] = vals_c[None]
            tg[sel] = grads_c[None]
        v_tp = np.einsum("ecA,eqiA->eqic", J, tv, optimize=True) / detJ[:, None, None, None]
        g_tp = np.einsum(
            "ecA,eqiAB,eBd->eqicd", J, tg, Jinv
        , optimize=True) / detJ[:, None, None, None, None]
        n = fg.normal[:, lf]  # (ne, 3)
        gn_v = np.einsum("eqicd,ed->eqic", g_tp, n, optimize=True)
        vn = np.einsum("eqic,ec->eqi", v_tp, n, optimize=True)
        tang_v = v_tp - vn[..., None] * n[:, None, None, :]
        # facet basis: phi_j * E_c, dof index = j * 2 + c
        fbasis = np.zeros((ne, nq2, nfd, 3))
        for j in range(nss):
            for c in range(2):
                fbasis[:, :, j * 2 + c, :] = (
                    fvals[None, :, j, None] * fg.frame[:, lf, c][:, None, :]
                )
        fall = np.zeros((ne, nq2, 4 * nfd, 3))
        fall[:, :, lf * nfd: (lf + 1) * nfd, :] = fbasis
        jump = np.concatenate([-tang_v, fall], axis=2)
        gn = np.concatenate([gn_v, np.zeros_like(fall)], axis=2)
        ds = fg.area[:, lf]
        # sliver-robust penalty alpha k^2 |F|/|T|: |F| = area/2, |T| = detJ/6
        pen = alpha * k * k * 3.0 * fg.area[:, lf] / detJ
        A += nu * (
            np.einsum("q,eqic,eqjc,e->eij", fg.qw, jump, gn, ds, optimize=True)
            + np.einsum("q,eqic,eqjc,e->eij", fg.qw, gn, jump, ds, optimize=True)
            + np.einsum("q,eqic,eqjc,e,e->eij", fg.qw, jump, jump, ds, pen, optimize=True)
        )

    # b-form: pressure x velocity
    qvals, _ = Q.basis.tabulate(vol.points)
    div_ref = np.einsum("eqicc->eqi", v_grad)
    B = np.zeros((ne, qvals.shape[1], nloc))
    B[:, :, :nbv] = np.einsum("q,qp,eqi->epi", w, qvals, div_ref, optimize=True)

    # rhs builder
    qpts = mesh.points[mesh.elements[:, 0]][:, None, :] + np.einsum(
        "eab,qb->eqa", J, vol.points
    , optimize=True)

    def force_local(force):
        fq = force(qpts.reshape(-1, 3)).reshape(ne, -1, 3)
        fe = np.zeros((ne, nloc))
        fe[:, :nbv] = np.einsum("q,eqc,eqic,e->ei", w, fq, val_p, detJ, optimize=True)
        return fe

    return A, B, force_local, fg, fvals


def interpolate_hybrid_boundary_3d(
    V: HybridVelocitySpace3D, uin, names: str
) -> np.ndarray:
    """Normal moments + tangential frame moments of ``uin`` on the named
    boundary faces (global-frame functionals; see fem/hdiv3d docstring)."""
    mesh = V.mesh
    nfd_v = V.hdiv.n_face_dofs
    nss = V.facet.n_scalar
    nfd_f = V.facet.n_face
    from ..fem.quadrature import triangle_rule

    rule = triangle_rule(2 * V.hdiv.order + 2)
    # separate tabulations per order: triangle_modal orders modes as
    # [(0,0),(0,1),(0,2),...], so the first nss columns of a HIGHER-order
    # tabulation are NOT the facet space's modes when the orders differ
    fvals, _ = triangle_modal(rule.points, V.hdiv.order)
    fvals_f, _ = triangle_modal(rule.points, V.facet.order)
    u = np.zeros(V.ndof)
    pts = mesh.points
    for f in mesh.boundary_facet_ids(names):
        gv = pts[mesh.faces[f]]  # sorted global vertices
        E1, E2 = gv[1] - gv[0], gv[2] - gv[0]
        nsc = np.cross(E1, E2)  # scaled normal (the Piola moment normal)
        xq = (
            gv[0][None, :]
            + rule.points[:, 0:1] * E1[None, :]
            + rule.points[:, 1:2] * E2[None, :]
        )
        uq = uin(xq)
        for j in range(nfd_v):
            u[f * nfd_v + j] = np.einsum(
                "q,qc,c,q->", rule.weights, uq, nsc, fvals[:, j]
            , optimize=True)
        # facet frame coefficients via the 2x2 frame Gram
        G = np.array([[E1 @ E1, E1 @ E2], [E2 @ E1, E2 @ E2]])
        Ginv = np.linalg.inv(G)
        tang = uq - (uq @ (nsc / np.linalg.norm(nsc)))[:, None] * (
            nsc / np.linalg.norm(nsc)
        )[None, :]
        for j in range(nss):
            m = np.array([
                np.einsum("q,qc,c,q->", rule.weights, tang, E1, fvals_f[:, j], optimize=True),
                np.einsum("q,qc,c,q->", rule.weights, tang, E2, fvals_f[:, j], optimize=True),
            ])
            c = Ginv @ m
            u[V.hdiv.ndof + f * nfd_f + 2 * j] = c[0]
            u[V.hdiv.ndof + f * nfd_f + 2 * j + 1] = c[1]
    return u


def hybrid_blocks_3d(V: HybridVelocitySpace3D, kind: str) -> list:
    """Smoother block index sets for a 3D [H(div) | facet] space.

    ``face``: disjoint per-face blocks (hdiv + facet dofs) + per-cell
    interior blocks.  ``vertexstar``: overlapping vertex patches — all
    face/facet dofs of faces containing the vertex plus interior dofs of
    incident tets (the 3D counterpart of the 2D vertex-star patches that
    carry the MCS preconditioner, models/stokes_hybrid.py)."""
    mesh = V.mesh
    nfd_v, nfd_f = V.hdiv.n_face_dofs, V.facet.n_face
    nc_d = V.hdiv.bases[0].n_cell
    off_c = mesh.nface * nfd_v
    if kind == "face":
        blocks = []
        for f in range(mesh.nface):
            blk = list(range(f * nfd_v, (f + 1) * nfd_v)) + list(
                range(V.hdiv.ndof + f * nfd_f, V.hdiv.ndof + (f + 1) * nfd_f)
            )
            blocks.append(blk)
        for e in range(mesh.ne):
            blocks.append(
                list(range(off_c + e * nc_d, off_c + (e + 1) * nc_d))
            )
        return blocks
    assert kind == "vertexstar"
    vblocks: list[list[int]] = [[] for _ in range(mesh.nv)]
    for f, verts in enumerate(mesh.faces.tolist()):
        dofs_f = list(range(f * nfd_v, (f + 1) * nfd_v)) + list(
            range(V.hdiv.ndof + f * nfd_f, V.hdiv.ndof + (f + 1) * nfd_f)
        )
        for v in verts:
            vblocks[v].extend(dofs_f)
    for e, verts in enumerate(mesh.elements.tolist()):
        dofs_e = list(range(off_c + e * nc_d, off_c + (e + 1) * nc_d))
        for v in verts:
            vblocks[v].extend(dofs_e)
    return vblocks


def build_faceblock_preconditioner_3d(
    V: HybridVelocitySpace3D, A_np: np.ndarray, dtype=jnp.float64,
    blocks: str = "face",
):
    """Additive block smoother over ``hybrid_blocks_3d`` patches; batched
    dense inverses."""
    from ..precond.jacobi import block_jacobi, extract_blocks_from_local

    nV = V.ndof
    free = jnp.asarray(V.free_mask)
    fmask = V.free_mask
    blks = [
        np.asarray([d for d in blk if fmask[d]], np.int32)
        for blk in hybrid_blocks_3d(V, blocks)
    ]
    blks = [b for b in blks if len(b)]
    dofs, mats = extract_blocks_from_local(A_np, V.element_dofs, blks, nV)
    smooth = block_jacobi(dofs, jnp.asarray(mats, dtype), nV)

    def preA(u):
        uf = jnp.where(free, u, 0.0)
        return jnp.where(free, smooth(uf), u)

    return preA


def build_hybrid_stokes_system_3d(
    mesh,
    discretization,
    velocity_dirichlet: str,
    uin=None,
    volume_force=None,
    alpha: float = 10.0,
    dtype=jnp.float64,
    a_pre: str = "faceblock",
) -> StokesSystem:
    V, Q = discretization(mesh, velocity_dirichlet)
    A_np, B_np, force_local, fg, _ = assemble_hdg_stokes_3d(V, Q, alpha)

    eldofs_v = jnp.asarray(V.element_dofs)
    eldofs_p = jnp.asarray(Q.element_dofs)
    A_loc = jnp.asarray(A_np, dtype)
    B_loc = jnp.asarray(B_np, dtype)
    nV, nQ = V.ndof, Q.ndof
    free = jnp.asarray(V.free_mask)

    def A_raw(u):
        return asm.apply_local_matrices(A_loc, eldofs_v, nV, u)

    def A(u):
        uf = jnp.where(free, u, 0.0)
        return jnp.where(free, A_raw(uf), u)

    def B_raw(u):
        ue = u[eldofs_v]
        pe = jnp.einsum("epi,ei->ep", B_loc, ue, optimize=True)
        return asm.scatter_add(pe, eldofs_p, nQ)

    def B(u):
        return B_raw(jnp.where(free, u, 0.0))

    def BT(p):
        pe = p[eldofs_p]
        ue = jnp.einsum("epi,ep->ei", B_loc, pe, optimize=True)
        return jnp.where(free, asm.scatter_add(ue, eldofs_v, nV), 0.0)

    if a_pre == "faceblock":
        preA = build_faceblock_preconditioner_3d(V, A_np, dtype)
    else:
        diag = asm.diagonal_of_local(A_loc, eldofs_v, nV)
        diag = jnp.where(free, jnp.abs(diag), 1.0)

        def preA(u):
            return jnp.where(free, u / diag, u)

    tq = asm.make_tables(Q, 2 * max(Q.order, 1), dtype)
    diag_Mp = asm.diagonal_of_local(asm.mass_local(tq), tq.eldofs, nQ)
    preM = lambda p: p / diag_Mp

    if volume_force is None:
        f_vec = jnp.zeros(nV, dtype)
    else:
        fe = jnp.asarray(force_local(volume_force), dtype)
        f_vec = asm.scatter_add(fe, eldofs_v, nV)
    if uin is None:
        u_bc = jnp.zeros(nV, dtype)
    else:
        u_bc = jnp.asarray(
            interpolate_hybrid_boundary_3d(V, uin, velocity_dirichlet), dtype
        )
    f_mod = jnp.where(free, f_vec - A_raw(u_bc), 0.0)
    g_mod = -B_raw(u_bc)

    return StokesSystem(
        V=V, Q=Q, A=A, B=B, BT=BT, preA=preA, preM=preM,
        f=f_mod, g=g_mod, u_bc=u_bc, ndofs=nV + nQ,
    )
