"""3D Navier-Stokes on H(div) (BDM) velocity with HDG viscous coupling.

The 3D counterpart of the MCS NavierStokes class
(/root/reference/templates/NavierStokesSIMPLE_iterative.py used in 3D by
templates/NavierStokesSIMPLE_test_3D.py): H(div)-conforming BDM velocity
(pointwise divergence-free after projection), tangential coupling through
facet unknowns, upwind-DG convection, the same
SolveInitial / AddForce / DoTimeStep / Project API and recorded BPCG
metrics.  The viscous operator is the interior-penalty HDG form
(models/stokes_hybrid3d) rather than the mixed-stress MCS form — same
velocity space and solver structure; the H(curl,div) stress elimination is
the remaining 3D-MCS delta (2D has the full MCS model).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..fem.quadrature import tetrahedron_rule
from ..ops import assembly as asm
from ..ops.convection3d import build_upwind_convection_3d
from ..solvers.bpcg import bramble_pasciak_cg_opt
from ..solvers.cg import cg
from ..utils.timers import Timer
from .stokes_hybrid3d import (
    assemble_hdg_stokes_3d,
    bdm_hybrid_3d,
    build_hybrid_stokes_system_3d,
    interpolate_hybrid_boundary_3d,
)

__all__ = ["NavierStokesHDG3D"]


class NavierStokesHDG3D:
    def __init__(
        self,
        mesh,
        nu: float,
        inflow: str,
        outflow: str,
        wall: str,
        uin,
        timestep: float,
        order: int = 2,
        volumeforce=None,
        dtype=jnp.float64,
        alpha: float = 10.0,
        preconditioner: str = "auxspace",
    ):
        assert mesh.dim == 3
        self.nu, self.timestep, self.uin = nu, timestep, uin
        self.inflow, self.outflow, self.wall = inflow, outflow, wall
        self.mesh, self.order, self.dtype = mesh, order, dtype

        dirich = inflow + "|" + wall
        disc, _ = bdm_hybrid_3d(order)
        self.Xv, self.Q = disc(mesh, dirich)
        V = self.Xv
        A_np, B_np, force_local, fg, _ = assemble_hdg_stokes_3d(
            V, self.Q, alpha=alpha, nu=nu
        )
        self._force_local = force_local
        self.n = V.ndof
        self.eldofs = jnp.asarray(V.element_dofs)
        self.eldofs_p = jnp.asarray(self.Q.element_dofs)
        self.free = jnp.asarray(V.free_mask)
        A_loc = jnp.asarray(A_np, dtype)
        B_loc = jnp.asarray(B_np, dtype)
        n, free = self.n, self.free

        # velocity mass (u block only, Piola)
        hd = V.hdiv
        nbv = hd.n_basis
        J, detJ, _ = mesh.element_jacobians
        vol = tetrahedron_rule(2 * order + 2)
        v_val, _ = hd.tabulate_elements(vol.points)
        val_p = np.einsum("ecA,eqiA->eqic", J, v_val) / detJ[:, None, None, None]
        M_u = np.einsum("q,eqic,eqjc,e->eij", vol.weights, val_p, val_p, detJ)
        n_ret = A_np.shape[1]
        M_full = np.zeros((mesh.ne, n_ret, n_ret))
        M_full[:, :nbv, :nbv] = M_u
        M_loc = jnp.asarray(M_full, dtype)
        self._nbv_total = hd.ndof

        def A_raw(u):
            return asm.apply_local_matrices(A_loc, self.eldofs, n, u)

        def mass_raw(u):
            return asm.apply_local_matrices(M_loc, self.eldofs, n, u)

        def A(u):
            uf = jnp.where(free, u, 0.0)
            return jnp.where(free, A_raw(uf), u)

        dt = timestep

        def mstar(u):
            uf = jnp.where(free, u, 0.0)
            y = mass_raw(uf) + dt * A_raw(uf)
            return jnp.where(free, y, u)

        def B_raw(u):
            ue = u[self.eldofs]
            pe = jnp.einsum("epi,ei->ep", B_loc, ue)
            return asm.scatter_add(pe, self.eldofs_p, self.Q.ndof)

        def B(u):
            return B_raw(jnp.where(free, u, 0.0))

        def BT(p):
            pe = p[self.eldofs_p]
            ue = jnp.einsum("epi,ep->ei", B_loc, pe)
            return jnp.where(free, asm.scatter_add(ue, self.eldofs, n), 0.0)

        self.A, self.A_raw, self.mstar = A, A_raw, mstar
        self.B, self.B_raw, self.BT = B, B_raw, BT

        # preconditioners for the steady A (diagonal is too weak for the
        # penalty-dominated HDG operator): face blocks, optionally with the
        # vector-P1 auxiliary-space coarse correction
        if preconditioner == "auxspace":
            from .auxspace3d import build_auxspace_preconditioner_3d

            self.preA = build_auxspace_preconditioner_3d(
                V, A_np, dirich, dtype, coarse_coefficient=nu
            )
        else:
            from .stokes_hybrid3d import build_faceblock_preconditioner_3d

            self.preA = build_faceblock_preconditioner_3d(V, A_np, dtype)
        diagM = asm.diagonal_of_local(M_loc + dt * A_loc, self.eldofs, n)
        diagM = jnp.where(free & (jnp.abs(diagM) > 1e-30), jnp.abs(diagM), 1.0)
        self.preMstar = lambda u: jnp.where(free, u / diagM, u)
        diagMv = asm.diagonal_of_local(M_loc, self.eldofs, n)
        diagMv = jnp.where(free & (jnp.abs(diagMv) > 1e-30), diagMv, 1.0)
        self._preMv = lambda u: jnp.where(free, u / diagMv, u)
        tq = asm.make_tables(self.Q, 2 * max(self.Q.order, 1), dtype)
        diag_Mp = asm.diagonal_of_local(asm.mass_local(tq), tq.eldofs, self.Q.ndof)
        self.preM = lambda p: nu * p / diag_Mp
        self._preM_proj = lambda p: p / diag_Mp

        umask = jnp.arange(n) < self._nbv_total
        self._umask = umask

        def Mv(u):
            uf = jnp.where(free & umask, u, 0.0)
            y = mass_raw(uf)
            return jnp.where(free & umask, y, u)

        self._Mv = Mv

        self._uin_np = self._wrap_uin(uin)
        conv_v = build_upwind_convection_3d(V.hdiv, self._uin_np, dtype=dtype)
        nbv_total = self._nbv_total

        def convection(u):
            cu = conv_v(u[:nbv_total])
            return jnp.concatenate([cu, jnp.zeros(n - nbv_total, u.dtype)])

        self.convection = convection

        self.f = jnp.zeros(n, dtype)
        if volumeforce is not None:
            self.AddForce(volumeforce)
        u_bc = interpolate_hybrid_boundary_3d(V, self._uin_np, inflow)
        self.u_bc = jnp.asarray(u_bc, dtype)
        self.u = self.u_bc
        self.p = jnp.zeros(self.Q.ndof, dtype)
        self.stokes_bpcg_iterations = None
        self.stokes_bpcg_time = None
        self._mass_chebyshev()  # eager: its Lanczos bound needs concrete values

    def _wrap_uin(self, uin):
        def f(p):
            out = np.asarray(uin(p))
            if out.ndim == 1:
                full = np.zeros((len(p), 3))
                full[:, 0] = out
                return full
            return out

        return f

    @property
    def velocity(self) -> np.ndarray:
        return np.asarray(self.u[: self._nbv_total])

    @property
    def pressure(self) -> np.ndarray:
        return -np.asarray(self.p)

    def AddForce(self, force):
        fe = self._force_local(force)
        out = np.zeros(self.n)
        np.add.at(out, np.asarray(self.eldofs).ravel(), fe.ravel())
        self.f = self.f + jnp.asarray(out, self.dtype)

    def SolveInitial(self, timesteps=None, iterative: bool = True,
                     GS: bool = True, tol: float = 1e-8,
                     maxsteps: int = 100000):
        if timesteps:
            self.Project()
            for _ in range(timesteps):
                temp = jnp.where(self.free, -self.A_raw(self.u), 0.0)
                temp2, _ = self._project_velocity(self._inv_mstar(temp))
                self.u = self.u + self.timestep * temp2
                self.Project()
            return

        key = (tol, maxsteps)
        if getattr(self, "_solve_key", None) != key:
            self._solve_key = key

            @jax.jit
            def solve_initial(f, u_bc):
                f_mod = jnp.where(self.free, f - self.A_raw(u_bc), 0.0)
                g_mod = -self.B_raw(u_bc)
                return bramble_pasciak_cg_opt(
                    self.A, self.B, self.BT, self.preA, self.preM,
                    f_mod, g_mod, tol=tol, maxsteps=maxsteps, rel_err=True,
                )

            self._solve_jit = solve_initial

        timer = Timer("stokes-bpcg").Start()
        res = self._solve_jit(self.f, self.u_bc)
        timer.Stop(res.x)
        self.u = self.u_bc + res.x[0]
        self.p = res.x[1]
        self.stokes_bpcg_iterations = int(res.iterations)
        self.stokes_bpcg_time = timer.time
        return res

    def _inv_mstar(self, rhs, precision: float = 1e-4, maxsteps: int = 2000):
        return cg(self.mstar, rhs, pre=self.preMstar, tol=precision,
                  maxsteps=maxsteps).x

    def _mass_chebyshev(self, degree: int = 16):
        if not hasattr(self, "_mass_cheb"):
            from ..precond.chebyshev import chebyshev_preconditioner

            self._mass_cheb = chebyshev_preconditioner(
                self._Mv, self._preMv, self.u_bc, degree=degree,
                lower_fraction=0.02,
            )
        return self._mass_cheb

    def _project_velocity(self, u, tol: float = 1e-9, maxsteps: int = 2000):
        Minv = self._mass_chebyshev()

        def S(p):
            return self.B(Minv(self.BT(p)))

        rhs = self.B_raw(u)
        pres = cg(S, rhs, pre=self._preM_proj, tol=tol, maxsteps=maxsteps)
        return u - Minv(self.BT(pres.x)), pres.x

    def Project(self, vel=None):
        if vel is None:
            self.u, self.p = self._project_velocity(self.u)
            return None
        u_new, self.p = self._project_velocity(vel)
        return u_new

    def make_step_fn(self):
        free, f, dt = self.free, self.f, self.timestep
        conv, A_raw = self.convection, self.A_raw
        inv_mstar, project = self._inv_mstar, self._project_velocity

        def step(u):
            temp = conv(u) + f - A_raw(u)
            temp = jnp.where(free, temp, 0.0)
            temp2, _ = project(inv_mstar(temp))
            return u + dt * temp2

        return step

    def DoTimeStep(self):
        if not hasattr(self, "_jit_step"):
            self._jit_step = jax.jit(self.make_step_fn())
        self.u = self._jit_step(self.u)
