"""Elasticity interface problem (3D) with modified-AL preconditioning.

Re-implementation of the reference's ``elliptic_interface_elasticity``
executable.  Its source file is absent from the reference snapshot
(CMakeLists.txt:41,48 declares it); behavior is reconstructed from its support
code — ``ElasticityUtilities::assemble_elasticity`` (utilities.h:377-427), the
AMG builder (utilities.h:429-587) and the shipped parameter file
(parameters_elliptic_interface/elasticity.prm): 3D linear elasticity

    λ(div u, div v) + 2μ(ε(u):ε(v))

with a hyper_rectangle inclusion in a cube, Lamé jumps (λ: 2 → 20, μ: 1 → 10),
vector Lagrange-multiplier coupling and the modified AL preconditioner (γ=10,
γ₂=1e-2, W = M²).  Expectations are *reconstructed*, not cited.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..core.generators import background_grid_from_name
from ..core.grid import GridSpace
from ..core.immersed import ImmersedSpace, immersed_uniform_grid
from ..ops.assembly import (elasticity_block_local, imm_mass_matrix,
                            rhs_vector, vector_cell_dofs)
from ..ops.blocks import BlockLayout, block_operator
from ..ops.coupling import build_coupling
from ..ops.krylov import cg, fgmres
from ..ops.linop import LinOp
from ..ops.operators import CellMatrix, constrain, dirichlet_rhs
from ..ops.sparse import COO, spgemm_ctwc
from ..ops.sparse_band import lattice_band_linop
from ..precond.al import al_preconditioner_modified
from ..precond.gmg import build_gmg
from ..utils.prm import Params, parse_prm
from ..utils.precision import full_matmul_precision
from ..utils.timer import TimerOutput
from .elliptic_interface import ControlConfig
from .stokes import VectorCoupling

__all__ = ["ElasticityInterfaceConfig", "ElasticityInterfaceProblem"]


@dataclass
class ElasticityInterfaceConfig:
    dim: int = 3
    initial_background_refinement: int = 3
    initial_immersed_refinement: int = 2
    name_of_background_grid: str = "hyper_cube"
    arguments_for_background_grid: str = "-1.25: 1.25: true"
    name_of_immersed_grid: str = "hyper_rectangle"
    arguments_for_immersed_grid: str = "-0.65, -0.3, -0.4: 0.65, 0.3, 0.4: false"
    dirichlet_ids: tuple = (0, 1, 2, 3, 4, 5)
    background_space_degree: int = 1
    immersed_space_degree: int = 1
    coupling_quadrature_order: int = 5
    lambda_background: float = 2.0
    lambda_immersed: float = 20.0
    mu_background: float = 1.0
    mu_immersed: float = 10.0
    f: float = 1.0      # bulk load magnitude (per component)
    f_2: float = 2.0    # immersed load magnitude
    gamma_AL_background: float = 10.0
    gamma_AL_immersed: float = 1e-2
    use_modified_AL_preconditioner: bool = True
    use_diagonal_inverse: bool = False
    use_exact_mass_inverse_in_augmented_block: bool = False
    use_fixed_iterations: bool = False
    outer: ControlConfig = field(default_factory=lambda: ControlConfig(
        max_steps=1000, tolerance=1e-10, reduction=1e-6))
    inner: ControlConfig = field(default_factory=lambda: ControlConfig(
        max_steps=10000, tolerance=1e-2, reduction=1e-20))
    iteration_number: ControlConfig = field(default_factory=lambda: ControlConfig(
        max_steps=100, tolerance=1e-2, reduction=None))
    fgmres_restart: int = 50

    @classmethod
    def from_prm(cls, text_or_path) -> "ElasticityInterfaceConfig":
        text = text_or_path
        if "\n" not in str(text_or_path):
            with open(text_or_path) as fh:
                text = fh.read()
        p = Params(parse_prm(text)).enter("Elliptic Interface Problem")
        al = p.enter("AL preconditioner")
        grids = p.enter("Grid generation")

        def ctl(section, **d):
            s = p.enter(section)
            return ControlConfig(
                max_steps=s.get_int("Max steps", d.get("max_steps", 100)),
                tolerance=s.get_float("Tolerance", d.get("tolerance", 1e-10)),
                reduction=(s.get_float("Reduction", d["reduction"])
                           if "reduction" in d else None))

        return cls(
            initial_background_refinement=p.enter("Refinement and remeshing").get_int(
                "Initial background refinement", 3),
            initial_immersed_refinement=p.enter("Refinement and remeshing").get_int(
                "Initial immersed refinement", 2),
            name_of_background_grid=grids.get_str("Background grid generator", "hyper_cube"),
            arguments_for_background_grid=grids.get_str(
                "Background grid generator arguments", "-1.25: 1.25: true"),
            name_of_immersed_grid=grids.get_str("Immersed grid generator", "hyper_rectangle"),
            arguments_for_immersed_grid=grids.get_str(
                "Immersed grid generator arguments",
                "-0.65, -0.3, -0.4: 0.65, 0.3, 0.4: false"),
            dirichlet_ids=tuple(p.get_int_list("Homogeneous Dirichlet boundary ids",
                                               (0, 1, 2, 3, 4, 5))),
            background_space_degree=p.get_int("FE degree background", 1),
            immersed_space_degree=p.get_int("FE degree immersed", 1),
            coupling_quadrature_order=p.get_int("Coupling quadrature order", 5),
            lambda_background=p.get_float("lambda background", 2.0),
            lambda_immersed=p.get_float("lambda immersed", 20.0),
            mu_background=p.get_float("mu background", 1.0),
            mu_immersed=p.get_float("mu immersed", 10.0),
            f=p.get_float("f", 1.0),
            f_2=p.get_float("f_2", 2.0),
            gamma_AL_background=al.get_float("gamma fluid", 10.0),
            gamma_AL_immersed=al.get_float("gamma solid", 1e-2),
            use_modified_AL_preconditioner=al.get_bool("Use modified AL preconditioner", True),
            use_diagonal_inverse=al.get_bool("Use diagonal inverse", False),
            use_exact_mass_inverse_in_augmented_block=al.get_bool(
                "Use exact mass inverse in augmented block", False),
            use_fixed_iterations=p.get_bool("Use fixed (inner) iterations", False),
            outer=ctl("Outer solver control", max_steps=1000, tolerance=1e-10,
                      reduction=1e-6),
            inner=ctl("Inner solver control", max_steps=10000, tolerance=1e-2,
                      reduction=1e-20),
            iteration_number=ctl("Iteration number control", max_steps=100,
                                 tolerance=1e-2),
        )


class ElasticityInterfaceProblem:
    def __init__(self, config: ElasticityInterfaceConfig):
        self.cfg = config
        self.timer = TimerOutput()
        self.results = {}
        self.gamma_bg = config.gamma_AL_background
        self.gamma_imm = config.gamma_AL_immersed

    def setup(self, cycle: int = 0):
        self._refine_cache = None
        cfg = self.cfg
        dim = cfg.dim
        with self.timer.scope("Setup"):
            self.grid = background_grid_from_name(
                cfg.name_of_background_grid, cfg.arguments_for_background_grid,
                dim, cfg.initial_background_refinement + cycle)
            self.fg_grid = background_grid_from_name(
                cfg.name_of_immersed_grid, cfg.arguments_for_immersed_grid,
                dim, cfg.initial_immersed_refinement + cycle)
            self.fg_mesh = immersed_uniform_grid(self.fg_grid)
            self.space = GridSpace.q(self.grid, cfg.background_space_degree)
            self.fg_gridspace = GridSpace.q(self.fg_grid,
                                            cfg.immersed_space_degree)
            self.fg_space = ImmersedSpace(self.fg_mesh, self.fg_gridspace.fe,
                                          self.fg_gridspace.cell_dofs,
                                          self.fg_gridspace.n_dofs)

        with self.timer.scope("Assemble"):
            deg = cfg.background_space_degree
            # A1: elasticity with (lambda_bg, mu_bg) everywhere
            a1_loc = elasticity_block_local(self.space.fe, self.grid.h,
                                            deg + 1, cfg.lambda_background,
                                            cfg.mu_background)
            vd_bg = vector_cell_dofs(self.space, dim)
            n_bg = self.space.n_dofs
            self.A1 = CellMatrix(vd_bg, vd_bg, a1_loc,
                                 (n_bg * dim, n_bg * dim))
            # A2: Lamé jump on the immersed grid
            a2_loc = elasticity_block_local(
                self.fg_gridspace.fe, self.fg_grid.h, deg + 1,
                cfg.lambda_immersed - cfg.lambda_background,
                cfg.mu_immersed - cfg.mu_background)
            vd_fg = vector_cell_dofs(self.fg_gridspace, dim)
            n_fg = self.fg_gridspace.n_dofs
            self.A2 = CellMatrix(vd_fg, vd_fg, a2_loc,
                                 (n_fg * dim, n_fg * dim))
            self.M = imm_mass_matrix(self.fg_space, order=deg + 1)

            def f_fn(p):
                xp = np if isinstance(p, np.ndarray) else jnp
                return cfg.f * xp.ones((p.shape[0], dim), dtype=p.dtype)

            rhs1 = rhs_vector(self.space, f_fn, order=deg + 1)  # (n, dim)
            self.rhs_f1 = rhs1.T.reshape(-1)
            rhs2 = rhs_vector(self.fg_gridspace,
                              lambda p: (cfg.f_2 - cfg.f) * (
                                  np.ones((p.shape[0], dim))
                                  if isinstance(p, np.ndarray) else
                                  jnp.ones((p.shape[0], dim), dtype=p.dtype)),
                              order=deg + 1)
            self.rhs_f2 = jnp.asarray(np.asarray(rhs2).T.reshape(-1))
            free_scalar = ~self.space.boundary_dof_mask(list(cfg.dirichlet_ids))
            self.free = jnp.asarray(np.tile(free_scalar, dim))

        with self.timer.scope("Coupling"):
            self.Cs = build_coupling(self.space, self.fg_space,
                                     order=cfg.background_space_degree + 1)
            self.C = VectorCoupling(self.Cs, dim)

        self.layout = BlockLayout((n_bg * dim, n_fg * dim, n_fg * dim))
        self._solvers = {}
        return self

    def _imm_vec_op(self, scalar_cm):
        dim = self.cfg.dim
        n = scalar_cm.shape[0]

        def mv(x):
            return scalar_cm.mv(x.reshape(dim, n).T).T.reshape(-1)

        return LinOp(mv, (n * dim, n * dim), mv)

    def solve(self):
        cfg = self.cfg
        key = (round(self.gamma_bg, 12), round(self.gamma_imm, 12))
        if key not in self._solvers:
            with self.timer.scope("Build solver"):
                self._solvers[key] = self._build_solver()
        with self.timer.scope("Solve system"):
            x, info = self._solvers[key](self.rhs_f1, self.rhs_f2)
            x = jax.block_until_ready(x)
        self.u, self.u2, self.lam = self.layout.split(x)
        self.results.update(
            dofs_background=self.layout.sizes[0],
            dofs_immersed=self.layout.sizes[1],
            outer_iterations=int(info.iterations),
            converged=bool(info.converged),
            residual=float(info.residual))
        return int(info.iterations)

    def _build_solver(self, raw_rhs: bool = False):
        """With ``raw_rhs`` the returned jit takes the assembled block
        right-hand side ``(r0, r1, r2)`` directly — the correction engine
        of :meth:`solve_refined`."""
        cfg = self.cfg
        dim = cfg.dim
        layout = self.layout
        gamma_1, gamma_2 = self.gamma_bg, self.gamma_imm
        free = self.free
        n_fg_s = self.fg_gridspace.n_dofs

        C_lin = LinOp(self.C.mv, self.C.shape, self.C.rmv)
        Ct_lin = C_lin.T
        M_vec = self._imm_vec_op(self.M)

        # W = M² (componentwise): exact inverse twice or diag(M)^{-2}.  The
        # exact variant uses the tensor-product lattice factorization of the
        # uniform immersed box grid (precond.weights.lattice_mass_inverse):
        # exact at any size with O(1) apply latency, replacing the former
        # nested Jacobi-CG that dominated the 3D cycles on TPU.
        d = self.M.diag()
        if cfg.use_diagonal_inverse:
            dinv2 = 1.0 / d ** 2

            def inv_w(lam):
                return (dinv2[:, None] * lam.reshape(dim, n_fg_s).T).T.reshape(-1)
        else:
            from ..precond.weights import lattice_mass_inverse

            lat2 = lattice_mass_inverse(self.fg_gridspace, squared=True)
            if lat2 is not None:
                def inv_w(lam):
                    return lat2(lam.reshape(dim, n_fg_s).T).T.reshape(-1)
            else:
                dinv = 1.0 / d

                def m_inv_s(v):
                    x, _ = cg(self.M.mv, v,
                              M=lambda r: dinv[:, None] * r if r.ndim == 2 else dinv * r,
                              tol=0.0, reduction=1e-14, max_steps=1000)
                    return x

                def inv_w(lam):
                    v = lam.reshape(dim, n_fg_s).T
                    return m_inv_s(m_inv_s(v)).T.reshape(-1)

        w_diag_scalar = np.asarray(1.0 / d ** 2)

        A1_lin = constrain(self.A1.as_linop(), free)

        def AL11(x):
            lam_v = self.C.mv(x)
            return gamma_1 * self.C.rmv(inv_w(lam_v))

        def A11_mv(x):
            return A1_lin(x) + AL11(x)

        # vector GMG for A11 with per-level AL term
        def a11_factory(sp):
            a_loc = elasticity_block_local(sp.fe, sp.grid.h,
                                           cfg.background_space_degree + 1,
                                           cfg.lambda_background,
                                           cfg.mu_background)
            vd = vector_cell_dofs(sp, dim)
            A_l = CellMatrix(vd, vd, a_loc, (sp.n_dofs * dim,) * 2)
            Cl = self.Cs if sp is self.space else build_coupling(
                sp, self.fg_space, order=cfg.background_space_degree + 1)

            # whole level matrix A_l + γ₁·blockdiag(Cᵀdiag(w)C) as ONE
            # banded shift-FMA stencil: the per-smoother-apply coupling
            # gather/scatter (the elasticity table-row cost cliff — 551 s
            # at 14.7k dofs in round 4) disappears from the hot loop
            band = None
            if hasattr(sp, "n_points_1d"):
                ns = sp.n_dofs
                al_s = spgemm_ctwc(COO.from_coupling(Cl),
                                   np.asarray(w_diag_scalar))
                lvl = COO.from_cell_matrix(A_l).add(COO(
                    np.concatenate([al_s.rows + k * ns for k in range(dim)]),
                    np.concatenate([al_s.cols + k * ns for k in range(dim)]),
                    np.concatenate([al_s.vals] * dim),
                    (ns * dim,) * 2), alpha=gamma_1)
                band = lattice_band_linop(sp, lvl, n_comp=dim)
            if band is not None:
                return band[0], jnp.asarray(band[2])

            Cv = VectorCoupling(Cl, dim)
            inv_w_d = jnp.asarray(w_diag_scalar)

            def mv(x):
                lam_v = Cv.mv(x)
                wl = (inv_w_d[:, None] *
                      lam_v.reshape(dim, Cv.scalar.shape[0]).T).T.reshape(-1)
                return A_l.mv(x) + gamma_1 * Cv.rmv(wl)

            return mv, A_l.diag() + Cv.al_term_diag(w_diag_scalar, gamma_1)

        gmg11 = build_gmg(self.space, a11_factory, free_mask=free, n_comp=dim)

        # A22 = A2 + gamma_2 * M W^{-1} M (== A2 + gamma_2 I for exact W=M²)
        A2_lin = self.A2.as_linop()

        def A22_mv(x):
            return A2_lin(x) + gamma_2 * M_vec(inv_w(M_vec(x)))

        def a22_factory(sp):
            a_loc = elasticity_block_local(sp.fe, sp.grid.h,
                                           cfg.background_space_degree + 1,
                                           cfg.lambda_immersed - cfg.lambda_background,
                                           cfg.mu_immersed - cfg.mu_background)
            vd = vector_cell_dofs(sp, dim)
            A_l = CellMatrix(vd, vd, a_loc, (sp.n_dofs * dim,) * 2)

            band = (lattice_band_linop(sp, COO.from_cell_matrix(A_l),
                                       n_comp=dim)
                    if hasattr(sp, "n_points_1d") else None)
            if band is not None:
                band_mv = band[0]

                def mv(x):
                    return band_mv(x) + gamma_2 * x

                return mv, jnp.asarray(band[2]) + gamma_2

            def mv(x):
                return A_l.mv(x) + gamma_2 * x

            return mv, A_l.diag() + gamma_2

        gmg22 = build_gmg(self.fg_gridspace, a22_factory,
                          free_mask=np.ones(n_fg_s * dim, dtype=bool),
                          n_comp=dim)

        inner_kw = dict(tol=cfg.iteration_number.tolerance,
                        max_steps=cfg.iteration_number.max_steps,
                        fixed_iters=True) if cfg.use_fixed_iterations else \
            dict(tol=cfg.inner.tolerance, reduction=cfg.inner.reduction,
                 max_steps=min(cfg.inner.max_steps, 1000))

        def A11_inv(v):
            x, _ = cg(A11_mv, v, M=gmg11.apply, **inner_kw)
            return x

        def A22_inv(v):
            x, _ = cg(A22_mv, v, M=gmg22.apply, **inner_kw)
            return x

        def A12_mv(x):
            return -gamma_1 * Ct_lin(inv_w(M_vec(x)))

        def A21_mv(x):
            return -gamma_2 * M_vec(inv_w(C_lin(x)))

        n0, n1, _ = layout.sizes
        system_operator = block_operator(layout, layout, [
            [LinOp(A11_mv, (n0, n0)), LinOp(A12_mv, (n0, n1)), Ct_lin],
            [LinOp(A21_mv, (n1, n0)), LinOp(A22_mv, (n1, n1)), -1.0 * M_vec],
            [C_lin, -1.0 * M_vec, None]])

        prec = al_preconditioner_modified(layout, A11_inv, A22_inv, Ct_lin,
                                          M_vec, inv_w, gamma_1)

        A1_raw = self.A1.as_linop()

        def solve_core(b):
            return fgmres(system_operator, b, prec,
                          tol=cfg.outer.tolerance,
                          reduction=cfg.outer.reduction,
                          max_steps=cfg.outer.max_steps,
                          restart=cfg.fgmres_restart)

        from ..utils.hoist import jit_hoisted

        dt = self.rhs_f1.dtype
        if raw_rhs:
            def run_raw(r0, r1, r2):
                return solve_core(layout.concat((r0, r1, r2)))

            ex = tuple(jax.ShapeDtypeStruct((n,), dt) for n in layout.sizes)
            return jit_hoisted(full_matmul_precision(run_raw), ex)

        def run(rhs_f1, rhs_f2):
            b0 = dirichlet_rhs(A1_raw, rhs_f1, free,
                               jnp.zeros_like(rhs_f1))
            b = layout.concat((b0, rhs_f2,
                               jnp.zeros(layout.sizes[2], dtype=b0.dtype)))
            x, info = solve_core(b)
            u, u2, lam = layout.split(x)
            u = jnp.where(free, u, 0.0)
            return layout.concat((u, u2, lam)), info

        # hoisted jit: the 3D vector cell tables are the dominant compile
        # payload at cycle >= 1; parked as runtime args they cost nothing
        ex = (jax.ShapeDtypeStruct((layout.sizes[0],), dt),
              jax.ShapeDtypeStruct((layout.sizes[1],), dt))
        return jit_hoisted(full_matmul_precision(run), ex)

    def build_correction_solver(self):
        """jit of ``(r0, r1, r2) -> (x, info)`` with a RAW right-hand side —
        the inner engine of :meth:`solve_refined`.  One short device
        program per refinement step (watchdog-safe, utils.refine)."""
        from ..utils.refine import capped_max_steps

        with capped_max_steps(self.cfg.outer):
            return self._build_solver(raw_rhs=True)

    def solve_refined(self, tol_abs: float = 1e-10, max_refine: int = 12):
        """Mixed-precision iterative refinement (f32 on-chip corrections +
        host-f64 true residual, ops.host_ref.HostElasticitySystem) to the
        reference outer-control regime — the elasticity analog of
        models.elliptic_interface.solve_refined."""
        from ..ops.host_ref import HostElasticitySystem
        from ..utils.refine import guarded_refinement

        # memoized per setup(): a second solve_refined on the same
        # problem re-runs the CACHED executable (table timing runs
        # warm-up + timed pass, like the plain-solve rows)
        if getattr(self, '_refine_cache', None) is None:
            self._refine_cache = (HostElasticitySystem(self),
                                  self.build_correction_solver())
        host, corr = self._refine_cache
        dt = self.rhs_f1.dtype

        def correct(rs):
            x, info = corr(*(jnp.asarray(r.astype(dt)) for r in rs))
            return ([np.asarray(p, dtype=np.float64)
                     for p in self.layout.split(x)], int(info.iterations))

        (u, u2, lam), history, total_iters, converged = guarded_refinement(
            host.residual, correct, self.layout.sizes, tol_abs, max_refine)
        self.u = jnp.asarray(u, dtype=dt)
        self.u2 = jnp.asarray(u2, dtype=dt)
        self.lam = jnp.asarray(lam, dtype=dt)
        self.results.update(
            dofs_background=self.layout.sizes[0],
            dofs_immersed=self.layout.sizes[1],
            outer_iterations=total_iters,
            refined_residual=history[-1],
            refine_steps=len(history) - 1,
            converged=converged)
        return u, u2, lam, history

    def constraint_residual(self) -> float:
        return float(jnp.max(jnp.abs(
            self.C.mv(self.u) - self._imm_vec_op(self.M)(self.u2))))

    def run(self):
        self.setup()
        self.solve()
        return self.results
