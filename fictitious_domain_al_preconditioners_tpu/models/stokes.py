"""Stokes flow with an immersed boundary (2D curve / 3D sphere surface).

TPU-native re-implementation of the reference's ``stokes_immersed_boundary``
executable (stokes_immersed_boundary.cc, class ``IBStokesProblem``):

    [ A   Bᵀ  Cᵀ ] [u]   [f]        A: (∇u:∇v) + γ_gd(div u, div v)  (grad-div)
    [ B   0   0  ] [p] = [0]           or 2(ε(u):ε(v))
    [ C   0   0  ] [λ]   [g]        C: velocity ↔ vector multiplier on Γ

Velocity Q2 vector + pressure Q1 (Taylor-Hood) or P1disc (Q2-P1disc,
stokes_immersed_boundary.cc:517-529), vector multiplier FE_Q(k)/FE_DGQ(0) on
the immersed mesh.  Solver modes (stokes_immersed_boundary.cc:826-1074):

  - ``Stokes``     step-22 Schur-complement CG baseline (no immersed body)
  - ``IBStokes``   nested-Schur exact solves (no preconditioner)
  - ``IBStokesAL`` FGMRES (or MinRes with the SPD diagonal variant) with the
                   3x3 AL preconditioner; inner CG on Aug = A + γCᵀW⁻¹C
                   [+ γ_gd BᵀMp⁻¹B without grad-div]

AMG on the augmented velocity block is replaced by vector geometric multigrid
with the AL term re-discretized per level.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..core.grid import GridSpace, UniformGrid
from ..core.immersed import hyper_sphere, parametrized_curve
from ..ops.assembly import (divergence_block_local, imm_mass_matrix, imm_rhs,
                            mass_matrix, rhs_vector, vector_cell_dofs,
                            velocity_block_local)
from ..ops.blocks import BlockLayout, block_operator
from ..ops.coupling import Coupling, build_coupling
from ..ops.krylov import cg, fgmres, minres
from ..ops.linop import LinOp
from ..ops.operators import CellMatrix, constrain, dirichlet_rhs
from ..precond.al import (al_preconditioner_diagonal, al_preconditioner_stokes)
from ..precond.gmg import build_gmg
from ..utils.expressions import ParsedFunction
from ..utils.precision import full_matmul_precision
from ..utils.prm import Params, parse_prm
from ..utils.timer import TimerOutput

__all__ = ["StokesConfig", "StokesProblem", "VectorCoupling"]


class VectorCoupling:
    """Componentwise vector coupling over a scalar quad-point table: velocity
    (dim * n_bg scalar dofs, component-major) <-> vector multiplier
    (dim * n_imm).  C[(j,c),(i,c)] = ∫_Γ φ_i ψ_j (same scalar kernel per
    component, stokes_immersed_boundary.cc:660,782)."""

    def __init__(self, scalar: Coupling, n_comp: int):
        self.scalar = scalar
        self.n_comp = n_comp
        self.shape = (scalar.shape[0] * n_comp, scalar.shape[1] * n_comp)

    def mv(self, u_flat):
        u = u_flat.reshape(self.n_comp, self.scalar.shape[1])
        return self.scalar.mv(u.T).T.reshape(-1)

    def rmv(self, lam_flat):
        lam = lam_flat.reshape(self.n_comp, self.scalar.shape[0])
        return self.scalar.rmv(lam.T).T.reshape(-1)

    def as_linop(self) -> LinOp:
        return LinOp(self.mv, self.shape, self.rmv, name="C_vec")

    def particle_mass_term(self, gamma):
        scalar_term = self.scalar.particle_mass_term(gamma)

        def mv(u_flat):
            u = u_flat.reshape(self.n_comp, self.scalar.shape[1])
            return scalar_term(u.T).T.reshape(-1)

        n = self.shape[1]
        return LinOp(mv, (n, n), mv)

    def particle_mass_diag(self, gamma):
        d = self.scalar.particle_mass_diag(gamma)
        return jnp.tile(d, self.n_comp)

    def al_term_diag(self, w_diag_scalar, gamma):
        d = self.scalar.al_term_diag(w_diag_scalar, gamma)
        return jnp.tile(d, self.n_comp)


@dataclass
class ALControl:
    """Mirror of ``ALControl`` (stokes_immersed_boundary.cc:152-190)."""

    gamma: float = 10.0
    gamma_grad_div: float = 10.0
    grad_div_stabilization: bool = True
    inverse_diag_square: bool = False  # "Diagonal mass immersed"
    amg_for_augmented: bool = True     # "AMG for augmented block"
    diagonal_spd_prec: bool = False
    max_iterations: int = 100
    tolerance: float = 1e-2


@dataclass
class OuterControl:
    max_steps: int = 1000
    tolerance: float = 1e-8
    reduction: float | None = 1e-12


@dataclass
class StokesConfig:
    """Mirror of the Parameters class (stokes_immersed_boundary.cc:194-351)."""

    spacedim: int = 2
    initial_refinement: int = 4
    initial_embedded_refinement: int = 5
    delta_refinement: int = 0
    dirichlet_ids: tuple = (0, 1, 2, 3)
    embedded_configuration_degree: int = 1
    embedded_space_degree: int = 1
    velocity_degree: int = 2
    use_disc_pressure: bool = False
    solver: str = "IBStokesAL"
    al: ALControl = field(default_factory=ALControl)
    outer: OuterControl = field(default_factory=OuterControl)
    embedded_configuration: tuple = ("R*cos(2*pi*x)+Cx; R*sin(2*pi*x)+Cy",
                                     "R=.21, Cx=.45,Cy=.45")
    embedded_value: tuple = ("-.5;.5", "")
    dirichlet_bc: tuple = ("0;0;0", "")
    body_force: tuple = ("1;1", "")
    fgmres_restart: int = 50

    @classmethod
    def from_prm(cls, text_or_path, spacedim: int = 2) -> "StokesConfig":
        text = text_or_path
        if "\n" not in str(text_or_path):
            with open(text_or_path) as fh:
                text = fh.read()
        dim = spacedim - 1
        p = Params(parse_prm(text)).enter(
            f"Distributed Lagrange<{dim},{spacedim}>")
        alp = p.enter("Augmented Lagrangian control")
        oc = p.enter("Outer solver control")

        def fn(section, default):
            s = p.enter(section)
            return (s.get_str("Function expression", default),
                    s.get_str("Function constants", ""))

        red = oc.get_float("Reduction", 1e-12)
        return cls(
            spacedim=spacedim,
            initial_refinement=p.get_int("Initial background space refinement", 4),
            initial_embedded_refinement=p.get_int("Initial embedded space refinement", 5),
            delta_refinement=p.get_int("Local refinements steps near embedded domain", 0),
            dirichlet_ids=tuple(p.get_int_list("Dirichlet boundary ids",
                                               tuple(range(2 * spacedim)))),
            embedded_configuration_degree=p.get_int("Embedded configuration finite element degree", 1),
            embedded_space_degree=p.get_int("Embedded space finite element degree", 1),
            velocity_degree=p.get_int("Velocity space finite element degree", 2),
            use_disc_pressure=p.get_bool("Use discontinuous pressure", False),
            solver=p.get_str("Solver", "IBStokesAL"),
            al=ALControl(
                gamma=alp.get_float("Gamma", 10.0),
                gamma_grad_div=alp.get_float("Gamma Grad-div", 10.0),
                grad_div_stabilization=alp.get_bool("Grad-div stabilization", True),
                inverse_diag_square=alp.get_bool("Diagonal mass immersed", False),
                amg_for_augmented=alp.get_bool("AMG for augmented block", True),
                diagonal_spd_prec=alp.get_bool("Diagonal SPD preconditioner", False),
                max_iterations=alp.get_int("Max steps", 100),
                tolerance=alp.get_float("Tolerance for Augmented Lagrangian", 1e-2)),
            outer=OuterControl(max_steps=oc.get_int("Max steps", 1000),
                               tolerance=oc.get_float("Tolerance", 1e-8),
                               reduction=red if red > 0 else None),
            embedded_configuration=fn("Embedded configuration",
                                      "R*cos(2*pi*x)+Cx; R*sin(2*pi*x)+Cy"),
            embedded_value=fn("Embedded value", "-.5;.5"),
            dirichlet_bc=fn("Dirichlet boundary condition",
                            ";".join(["0"] * (spacedim + 1))),
            body_force=fn("Body force", ";".join(["1"] * spacedim)),
        )


class StokesProblem:
    def __init__(self, config: StokesConfig):
        self.cfg = config
        self.timer = TimerOutput()
        self.results = {}

    # -- setup --------------------------------------------------------------

    def setup(self):
        self._refine_cache = None
        cfg = self.cfg
        sd = cfg.spacedim
        with self.timer.scope("Setup grids and dofs"):
            # immersed mesh first (its support points drive delta_refinement)
            if sd == 2:
                conf = ParsedFunction(*cfg.embedded_configuration)

                def conf_fn(pts):
                    return np.asarray(conf(pts))

                self.imm_mesh = parametrized_curve(
                    conf_fn, cfg.initial_embedded_refinement,
                    geom_degree=cfg.embedded_configuration_degree)
            else:
                # 3D: sphere of radius 0.1 at the cube center
                # (stokes_immersed_boundary.cc:427)
                self.imm_mesh = hyper_sphere([0.5, 0.5, 0.5], 0.1,
                                             cfg.initial_embedded_refinement)

            # background unit cube, colorized (stokes_immersed_boundary.cc:417).
            # delta_refinement > 0: local refinement near Γ on a 2:1-balanced
            # quadtree/octree with hanging nodes folded into the element dof
            # maps (core.adaptive — stokes_immersed_boundary.cc:472-483); the
            # reference refines near Γ regardless of the pressure space
            # (stokes_immersed_boundary.cc:517-529): DGP1 pressure rides the
            # same adaptive grid with an identity constraint fold.
            self._adaptive = cfg.delta_refinement > 0
            if self._adaptive:
                from ..core.adaptive import (
                    AdaptiveDGPSpace, AdaptiveGrid, AdaptiveSpace,
                )

                agrid = AdaptiveGrid.uniform(sd, cfg.initial_refinement)
                support = self.imm_mesh.space(
                    max(cfg.embedded_space_degree, 1)).dof_points
                for _ in range(cfg.delta_refinement):
                    agrid = agrid.refine_near(support)
                self.grid = agrid
                self.vel_space = AdaptiveSpace(agrid, cfg.velocity_degree)
                if cfg.use_disc_pressure:
                    assert cfg.velocity_degree == 2, "not a stable pair!"
                    self.p_space = AdaptiveDGPSpace(agrid, 1)
                else:
                    self.p_space = AdaptiveSpace(agrid,
                                                 cfg.velocity_degree - 1)
                h_min_diam = agrid.min_cell_diameter
            else:
                self.grid = UniformGrid.hyper_cube(
                    sd, 0.0, 1.0, cfg.initial_refinement + cfg.delta_refinement)
                self.vel_space = GridSpace.q(self.grid, cfg.velocity_degree)
                if cfg.use_disc_pressure:
                    assert cfg.velocity_degree == 2, "not a stable pair!"
                    self.p_space = GridSpace.dgp(self.grid, 1)
                else:
                    self.p_space = GridSpace.q(self.grid,
                                               cfg.velocity_degree - 1)
                h_min_diam = self.grid.cell_diameter
            if sd == 2 and self.imm_mesh.h_max >= h_min_diam:
                raise ValueError("mesh-size compatibility violated "
                                 "(stokes_immersed_boundary.cc:497-503)")
            self.mult_space = self.imm_mesh.space(
                max(cfg.embedded_space_degree, 0),
                continuous=cfg.embedded_space_degree > 0)

        nu = self.vel_space.n_dofs
        with self.timer.scope("Assemble Stokes"):
            order = cfg.velocity_degree + 2
            self.A = self._vel_block(self.vel_space)
            self.B = self._div_block()
            self.Mp = mass_matrix(self.p_space, order=order)
            # vector body force on velocity dofs
            bf = ParsedFunction(*cfg.body_force)
            f_vec = rhs_vector(self.vel_space, bf, order=order)  # (nu, sd)
            self.rhs_u = f_vec.T.reshape(-1)  # component-major flat
            # velocity Dirichlet data
            bc = ParsedFunction(*cfg.dirichlet_bc)
            bc_pts = np.asarray(bc(self.vel_space.dof_points))[:, :sd]
            self.bc_values = jnp.asarray(bc_pts.T.reshape(-1))
            free_scalar = ~self.vel_space.boundary_dof_mask(
                list(cfg.dirichlet_ids))
            self.free = jnp.asarray(np.tile(free_scalar, sd))

        with self.timer.scope("Assemble coupling"):
            corder = 2 * max(cfg.embedded_space_degree, 1) + 2
            self.Cs = build_coupling(self.vel_space, self.mult_space, corder)
            self.C = VectorCoupling(self.Cs, sd)
            self.M_imm_s = imm_mass_matrix(
                self.mult_space, order=2 * max(cfg.embedded_space_degree, 1) + 1)
            g_fn = ParsedFunction(*cfg.embedded_value)
            g_vec = imm_rhs(self.mult_space, g_fn, order=corder)  # (n_imm, sd)
            self.rhs_g = jnp.asarray(np.asarray(g_vec).T.reshape(-1))

        self.layout = BlockLayout((nu * sd, self.p_space.n_dofs,
                                   self.mult_space.n_dofs * sd))
        self._solver = None
        return self

    # -- helpers ------------------------------------------------------------

    def _vel_block(self, sp) -> CellMatrix:
        """Velocity block (grad-div-stabilized or symgrad) on a level space —
        shared local on uniform grids, per-level folded locals on adaptive
        (hanging-node) spaces."""
        cfg = self.cfg
        sd = cfg.spacedim
        order = cfg.velocity_degree + 2
        gd = cfg.al.gamma_grad_div if cfg.al.grad_div_stabilization else None
        if hasattr(sp, "fold_w"):
            from ..ops.assembly import adaptive_vector_cell_matrix

            return adaptive_vector_cell_matrix(
                sp, lambda h: velocity_block_local(sp.fe, h, order, gd), sd)
        a_local = velocity_block_local(sp.fe, sp.grid.h, order, gd)
        vdofs = vector_cell_dofs(sp, sd)
        n = sp.n_dofs
        return CellMatrix(vdofs, vdofs, a_local, (n * sd, n * sd))

    def _div_block(self) -> CellMatrix:
        """B = -(div u, q) on the background pair."""
        cfg = self.cfg
        sd = cfg.spacedim
        order = cfg.velocity_degree + 2
        if hasattr(self.vel_space, "fold_w"):
            from ..ops.assembly import adaptive_mixed_cell_matrix

            return adaptive_mixed_cell_matrix(
                self.p_space, self.vel_space,
                lambda h: divergence_block_local(self.p_space.fe,
                                                 self.vel_space.fe, h, order),
                sd)
        b_local = divergence_block_local(self.p_space.fe, self.vel_space.fe,
                                         self.grid.h, order)
        vdofs = vector_cell_dofs(self.vel_space, sd)
        return CellMatrix(self.p_space.cell_dofs, vdofs, b_local,
                          (self.p_space.n_dofs, self.vel_space.n_dofs * sd))

    def _condensed(self, op: LinOp) -> LinOp:
        """Zero the constrained-velocity columns of a rectangular operator
        acting on velocity (the reference assembles B and C with
        ``constraints`` — condensed form, stokes_immersed_boundary.cc:574-581,
        782)."""
        free = self.free

        def mv(x):
            return op(jnp.where(free, x, 0.0))

        def rmv(y):
            return jnp.where(free, op.T(y), 0.0)

        return LinOp(mv, op.shape, rmv)

    def _imm_vec_op(self, scalar_cm: CellMatrix):
        """Componentwise vector operator from a scalar immersed matrix."""
        sd = self.cfg.spacedim
        n = scalar_cm.shape[0]

        def mv(x):
            return scalar_cm.mv(x.reshape(sd, n).T).T.reshape(-1)

        return LinOp(mv, (n * sd, n * sd), mv)

    def _mp_inv(self):
        """Mp⁻¹: mass-lumped CG(100, 1e-6) or tight CG (UMFPACK stand-in)
        (stokes_immersed_boundary.cc:946-963)."""
        cfg = self.cfg
        lump = 1.0 / self.Mp.row_sums()

        if cfg.al.inverse_diag_square:
            def mp_inv(v):
                x, _ = cg(self.Mp.mv, v, M=lambda r: lump * r, tol=1e-6,
                          max_steps=100)
                return x
        else:
            def mp_inv(v):
                x, _ = cg(self.Mp.mv, v, M=lambda r: lump * r, tol=0.0,
                          reduction=1e-14, max_steps=1000)
                return x

        return mp_inv

    def _inv_w(self):
        """W⁻¹ on the vector multiplier space: diag(M)⁻² or (M⁻¹)²
        (stokes_immersed_boundary.cc:965-985)."""
        cfg = self.cfg
        sd = cfg.spacedim
        n = self.M_imm_s.shape[0]
        d = self.M_imm_s.diag()
        if cfg.al.inverse_diag_square:
            dinv2 = 1.0 / d ** 2

            def inv_w(lam):
                return (dinv2[:, None] * lam.reshape(sd, n).T).T.reshape(-1)

            w_diag_scalar = np.asarray(dinv2)
        else:
            dinv = 1.0 / d

            def m_inv_scalar(v):
                x, _ = cg(self.M_imm_s.mv, v, M=lambda r: dinv[:, None] * r
                          if r.ndim == 2 else dinv * r,
                          tol=0.0, reduction=1e-14, max_steps=1000)
                return x

            def inv_w(lam):
                v = lam.reshape(sd, n).T
                return m_inv_scalar(m_inv_scalar(v)).T.reshape(-1)

            w_diag_scalar = np.asarray(1.0 / d ** 2)
        return inv_w, w_diag_scalar

    # -- solve --------------------------------------------------------------

    def solve(self):
        cfg = self.cfg
        if self._solver is None:
            with self.timer.scope("Build solver"):
                builder = {"Stokes": self._build_stokes_schur,
                           "IBStokes": self._build_ibstokes,
                           "IBStokesAL": self._build_ibstokes_al}[cfg.solver]
                self._solver = builder()
        with self.timer.scope("Solve system"):
            x, info = self._solver(self.rhs_u, self.rhs_g, self.bc_values)
            x = jax.block_until_ready(x)
        u, p, lam = self.layout.split(x)
        self.u, self.p, self.lam = u, p, lam
        self.results.update(
            dofs_background=self.layout.sizes[0] + self.layout.sizes[1],
            dofs_immersed=self.layout.sizes[2],
            outer_iterations=int(info.iterations),
            converged=bool(info.converged),
            residual=float(info.residual),
        )
        return u, p, lam, info

    def _a_constrained(self):
        return constrain(self.A.as_linop(), self.free)

    def _gmg_velocity(self, with_al, gamma, w_diag_scalar):
        """Vector GMG on the (augmented) velocity block — the
        build_AMG_augmented_block replacement (utilities.h:111-331)."""
        cfg = self.cfg
        sd = cfg.spacedim
        gd = cfg.al.gamma_grad_div if cfg.al.grad_div_stabilization else None

        def factory(sp):
            A_l = self.A if sp is self.vel_space else self._vel_block(sp)
            diag = A_l.diag()
            mv = A_l.mv
            Cl = None
            if with_al:
                Cl = self.Cs if sp is self.vel_space else build_coupling(
                    sp, self.mult_space, 2 * max(cfg.embedded_space_degree, 1) + 2)

            # whole level matrix A_l (+ γ·blockdiag(Cᵀdiag(w)C)) as ONE
            # banded shift-FMA stencil (ops.sparse_band): the Q2 vector
            # element gather→scatter and the coupling applies leave the
            # smoother hot loop (same fix as the elliptic/elasticity GMG;
            # the reference's AMG consumes the same explicit matrices,
            # utilities.h:111-331)
            if hasattr(sp, "n_points_1d"):
                from ..ops.sparse import COO, spgemm_ctwc
                from ..ops.sparse_band import lattice_band_linop

                lvl = COO.from_cell_matrix(A_l)
                if with_al:
                    ns = sp.n_dofs
                    al_s = spgemm_ctwc(COO.from_coupling(Cl),
                                       np.asarray(w_diag_scalar))
                    lvl = lvl.add(COO(
                        np.concatenate([al_s.rows + k * ns
                                        for k in range(sd)]),
                        np.concatenate([al_s.cols + k * ns
                                        for k in range(sd)]),
                        np.concatenate([al_s.vals] * sd),
                        (ns * sd,) * 2), alpha=gamma)
                band = lattice_band_linop(sp, lvl, n_comp=sd)
                if band is not None:
                    return band[0], jnp.asarray(band[2])

            if with_al:
                Cv = VectorCoupling(Cl, sd)
                al_diag = Cv.al_term_diag(w_diag_scalar, gamma)
                inv_w_d = jnp.asarray(w_diag_scalar)

                def mv_aug(x, A_l=A_l, Cv=Cv):
                    lam_v = Cv.mv(x)
                    n = Cv.scalar.shape[0]
                    wl = (inv_w_d[:, None] * lam_v.reshape(sd, n).T).T.reshape(-1)
                    return A_l.mv(x) + gamma * Cv.rmv(wl)

                return mv_aug, diag + al_diag
            return mv, diag

        return build_gmg(self.vel_space, factory, free_mask=self.free,
                         n_comp=sd)

    def _build_ibstokes_al(self, raw_rhs: bool = False):
        """IBStokesAL (stokes_immersed_boundary.cc:918-1074).  With
        ``raw_rhs`` the returned jit takes the assembled block right-hand
        side ``(r0, r1, r2)`` directly — the correction engine of
        :meth:`solve_refined`."""
        cfg = self.cfg
        sd = cfg.spacedim
        layout = self.layout
        gamma = cfg.al.gamma
        gamma_gd = cfg.al.gamma_grad_div
        A_lin = self._a_constrained()
        B_lin = self._condensed(LinOp(self.B.mv, self.B.shape, self.B.rmv))
        Bt_lin = B_lin.T
        C_lin = self._condensed(self.C.as_linop())
        Ct_lin = C_lin.T
        M_vec = self._imm_vec_op(self.M_imm_s)
        mp_inv = self._mp_inv()
        inv_w, w_diag_scalar = self._inv_w()
        free = self.free

        if cfg.al.grad_div_stabilization:
            def aug_mv(x):
                return A_lin(x) + gamma * Ct_lin(inv_w(C_lin(x)))
        else:
            def aug_mv(x):
                return (A_lin(x) + gamma * Ct_lin(inv_w(C_lin(x))) +
                        gamma_gd * Bt_lin(mp_inv(B_lin(x))))

        gmg = self._gmg_velocity(True, gamma, w_diag_scalar)

        # The inner CG runs in SYMMETRICALLY DIAG-SCALED variables
        # (Ã = D^-1/2 A D^-1/2): the AL term's diagonal on the Γ-band scales
        # like γ/diag(M_Γ)² ≈ 1e4-1e6 against the O(1) viscous block, and at
        # embedded refinement >= 6 that disparity makes plain f32 CG DIVERGE
        # (measured on the v5e: residual 91 -> 1.2e6 in 500 iterations,
        # preconditioned or not; the scaled iteration converges).  In exact
        # arithmetic the scaled PCG is identical to the unscaled one —
        # f64 iteration counts are unchanged.
        aug_diag = (self.A.diag() +
                    VectorCoupling(self.Cs, sd).al_term_diag(
                        w_diag_scalar, gamma))
        dsc = jnp.where(free, 1.0 / jnp.sqrt(aug_diag), 1.0)
        dsc_inv = jnp.where(free, jnp.sqrt(aug_diag), 1.0)

        # In f32 the absolute AL tolerance can sit BELOW the reachable
        # residual level of this ill-scaled block; CG pushed past its
        # breakdown point diverges and returns garbage (measured: res0 30 ->
        # 7e4 at 200 steps).  A reduction floor stops at the best f32 can do;
        # f64 keeps the reference's absolute-control semantics untouched.
        f32 = jnp.zeros(0).dtype == jnp.float32
        inner_red = 1e-2 if f32 else None

        def aug_inv(v):
            def A_s(y):
                return dsc * aug_mv(dsc * y)

            def M_s(r):
                return dsc_inv * gmg.apply(dsc_inv * r)

            # The scaled residual is r_s = dsc * r, so checking
            # ||dsc_inv * r_s|| stops on the ORIGINAL system's residual —
            # the scaling changes the iteration's arithmetic only, not the
            # absolute-control stopping semantics of cfg.al.tolerance.
            x, _ = cg(A_s, dsc * v, M=M_s, tol=cfg.al.tolerance,
                      reduction=inner_red,
                      max_steps=cfg.al.max_iterations,
                      norm_weight=dsc_inv)
            return dsc * x

        AA = block_operator(layout, layout, [
            [LinOp(aug_mv, (layout.sizes[0],) * 2), Bt_lin, Ct_lin],
            [B_lin, None, None],
            [C_lin, None, None]])

        if cfg.al.diagonal_spd_prec:
            prec = al_preconditioner_diagonal(layout, aug_inv, inv_w, mp_inv,
                                              gamma, gamma_gd)
        else:
            prec = al_preconditioner_stokes(layout, aug_inv, Bt_lin, Ct_lin,
                                            inv_w, mp_inv, gamma, gamma_gd)

        A_raw = self.A.as_linop()
        solver = minres if cfg.al.diagonal_spd_prec else fgmres

        def solve_core(b):
            kw = dict(tol=cfg.outer.tolerance, reduction=cfg.outer.reduction,
                      max_steps=cfg.outer.max_steps)
            if solver is fgmres:
                kw["restart"] = cfg.fgmres_restart
            return solver(AA, b, prec, **kw)

        from ..utils.hoist import jit_hoisted

        dt = self.rhs_u.dtype
        if raw_rhs:
            def run_raw(r0, r1, r2):
                return solve_core(layout.concat((r0, r1, r2)))

            ex = tuple(jax.ShapeDtypeStruct((n,), dt)
                       for n in layout.sizes)
            return jit_hoisted(full_matmul_precision(run_raw), ex)

        def run(rhs_u, rhs_g, bc_values):
            b0 = dirichlet_rhs(A_raw, rhs_u, free, bc_values)
            b0 = b0 + jnp.where(free, gamma * Ct_lin(inv_w(rhs_g)), 0.0)
            g_ext = jnp.where(free, 0.0, bc_values)
            b1 = -self.B.mv(g_ext)  # lifting of inhomogeneous velocity BCs
            b2 = rhs_g - self.C.mv(g_ext)
            b = layout.concat((b0, b1, b2))
            x, info = solve_core(b)
            u, p, lam = layout.split(x)
            u = jnp.where(free, u, bc_values)
            return layout.concat((u, p, lam)), info

        # hoisted jit: cell tables/GMG constants stay runtime arguments so
        # the (remote-)compile payload stays KB-sized at >= 1M-dof rows
        ex = (jax.ShapeDtypeStruct((layout.sizes[0],), dt),
              jax.ShapeDtypeStruct((layout.sizes[2],), dt),
              jax.ShapeDtypeStruct((layout.sizes[0],), dt))
        return jit_hoisted(full_matmul_precision(run), ex)

    def _a_inv_exact(self):
        """Tight GMG-CG inverse of the velocity block (UMFPACK stand-in)."""
        gmg = self._gmg_velocity(False, 0.0, None)
        A_lin = self._a_constrained()

        def A_inv(v):
            x, _ = cg(A_lin, v, M=gmg.apply, tol=0.0, reduction=1e-12,
                      max_steps=2000)
            return x

        return A_inv

    def _build_stokes_schur(self):
        """Plain Stokes Schur-complement CG (step-22 style baseline,
        stokes_immersed_boundary.cc:830-876; InverseMatrix/SchurComplement
        helpers at lines 83-142).  The immersed body is ignored."""
        cfg = self.cfg
        layout = self.layout
        A_inv = self._a_inv_exact()
        B_lin = self._condensed(LinOp(self.B.mv, self.B.shape, self.B.rmv))
        Bt_lin = B_lin.T
        free = self.free
        A_raw = self.A.as_linop()
        lump = 1.0 / self.Mp.row_sums()

        def mp_approx_inv(v):
            x, _ = cg(self.Mp.mv, v, M=lambda r: lump * r, tol=0.0,
                      reduction=1e-10, max_steps=500)
            return x

        def run(rhs_u, rhs_g, bc_values):
            b0 = dirichlet_rhs(A_raw, rhs_u, free, bc_values)
            schur_rhs = B_lin(A_inv(b0))

            def S(p):
                return B_lin(A_inv(Bt_lin(p)))

            p, info = cg(S, schur_rhs, M=mp_approx_inv,
                         tol=1e-6 * jnp.linalg.norm(schur_rhs),
                         max_steps=layout.sizes[1])
            u = A_inv(b0 - Bt_lin(p))
            u = jnp.where(free, u, bc_values)
            lam = jnp.zeros(layout.sizes[2], dtype=u.dtype)
            return layout.concat((u, p, lam)), info

        return jax.jit(full_matmul_precision(run))

    def _build_ibstokes(self):
        """IBStokes: nested exact Schur complements, no preconditioner
        (stokes_immersed_boundary.cc:877-917)."""
        cfg = self.cfg
        layout = self.layout
        A_inv = self._a_inv_exact()
        B_lin = self._condensed(LinOp(self.B.mv, self.B.shape, self.B.rmv))
        Bt_lin = B_lin.T
        C_lin = self._condensed(self.C.as_linop())
        Ct_lin = C_lin.T
        free = self.free
        A_raw = self.A.as_linop()
        n_p = layout.sizes[1]

        def run(rhs_u, rhs_g, bc_values):
            b0 = dirichlet_rhs(A_raw, rhs_u, free, bc_values)

            def SBB(p):
                return B_lin(A_inv(Bt_lin(p)))

            def SBB_inv(v):
                x, _ = cg(SBB, v, tol=1e-10, max_steps=100 * n_p)
                return x

            def S_lambda(lam):
                t = A_inv(Ct_lin(lam))
                return (C_lin(t) -
                        C_lin(A_inv(Bt_lin(SBB_inv(B_lin(t))))))

            A_inv_f = A_inv(b0)
            rhs_lam = (C_lin(A_inv_f) - rhs_g -
                       C_lin(A_inv(Bt_lin(SBB_inv(B_lin(A_inv_f))))))
            lam, info = cg(S_lambda, rhs_lam, tol=1e-10,
                           max_steps=100 * layout.sizes[2])
            p = SBB_inv(B_lin(A_inv_f) - B_lin(A_inv(Ct_lin(lam))))
            u = A_inv(b0 - Bt_lin(p) - Ct_lin(lam))
            u = jnp.where(free, u, bc_values)
            return layout.concat((u, p, lam)), info

        return jax.jit(full_matmul_precision(run))

    def build_correction_solver(self):
        """jit of ``(r0, r1, r2) -> (x, info)``: one AL-preconditioned
        solve of the IBStokesAL system with a RAW right-hand side — the
        inner engine of :meth:`solve_refined`."""
        assert self.cfg.solver == "IBStokesAL"
        from ..utils.refine import capped_max_steps

        with capped_max_steps(self.cfg.outer):
            # one short device program per refinement step (watchdog-safe,
            # utils.refine)
            return self._build_ibstokes_al(raw_rhs=True)

    def solve_refined(self, tol_abs: float = 1e-8, max_refine: int = 12):
        """Mixed-precision iterative refinement of the IBStokesAL solve to
        REFERENCE quality on TPU: f32 corrections on device, TRUE f64
        residual of the 3x3 block system on the host (ops.host_ref
        .HostStokesSystem), looped to ``tol_abs`` — the reference's 1e-8
        'Stokes solver control: Tolerance' (parameters_stokes.prm), which
        plain f32 cannot reach.

        Returns ``(u, p, lam, history)``; ``self.results`` records totals.
        Divergence-guarded: see utils.refine.guarded_refinement.  The host
        reference and correction solver are cached per ``setup()``; any
        mutation of rhs/bc/γ state must go through ``setup()`` (or reset
        ``_refine_cache``) to take effect here.
        """
        from ..ops.host_ref import HostStokesSystem
        from ..utils.refine import guarded_refinement

        # memoized per setup(): a second solve_refined on the same
        # problem re-runs the CACHED executable (table timing runs
        # warm-up + timed pass, like the plain-solve rows)
        if getattr(self, '_refine_cache', None) is None:
            self._refine_cache = (HostStokesSystem(self),
                                  self.build_correction_solver())
        host, corr = self._refine_cache
        dt = self.rhs_u.dtype

        def correct(rs):
            x, info = corr(*(jnp.asarray(r.astype(dt)) for r in rs))
            return ([np.asarray(part, dtype=np.float64)
                     for part in self.layout.split(x)], int(info.iterations))

        (u, p, lam), history, total_iters, converged = guarded_refinement(
            host.residual, correct, self.layout.sizes, tol_abs, max_refine)
        self.u = jnp.asarray(u, dtype=dt)
        self.p = jnp.asarray(p, dtype=dt)
        self.lam = jnp.asarray(lam, dtype=dt)
        self.results.update(
            dofs_background=self.layout.sizes[0] + self.layout.sizes[1],
            dofs_immersed=self.layout.sizes[2],
            outer_iterations=total_iters,
            refined_residual=history[-1],
            refine_steps=len(history) - 1,
            converged=converged)
        return u, p, lam, history

    # -- diagnostics --------------------------------------------------------

    def constraint_residual(self) -> float:
        return float(jnp.max(jnp.abs(self.C.mv(self.u) - self.rhs_g)))

    def divergence_residual(self) -> float:
        """||B u||: how incompressible the computed velocity is."""
        return float(jnp.linalg.norm(self.B.mv(self.u)))

    def run(self):
        self.setup()
        self.solve()
        return self.results
