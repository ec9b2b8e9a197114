"""Elliptic interface problem with a codim-0 immersed domain (3x3 block DLM).

TPU-native re-implementation of the reference's ``elliptic_interface``
executable (elliptic_interface.cc, class ``EllipticInterfaceDLM``):

    -β₁Δu = f   in Ω,      -(β₂-β₁)Δu₂ (+ coupling) = f₂-f  in ω ⊂ Ω,
    u|_ω = u₂ (via multiplier λ), coefficient jump β₂ ≫ β₁.

    system (elliptic_interface.cc:816-819, augmented):
    [ A₁+γ₁CᵀW⁻¹C   -γ₁CᵀW⁻¹M      Cᵀ ] [u ]   [f₁]
    [ -γ₂MW⁻¹C       A₂+γ₂MW⁻¹M    -M ] [u₂] = [f₂-f]
    [ C              -M             0  ] [λ ]   [0]

Preconditioners: 'ideal' AL (coupled 2x2 inverse, C4) and the paper's
*modified* AL (block-triangular, C5), with the γ-parameter study, the
sqrt(2)-rule, h-scaled mass weights, operator-form AL term, fixed-iteration
inner solves, sanity checks, and the manufactured convergence study
(analytical radial solution from arXiv 2211.03443, elliptic_interface.cc:56-102).

AMG-for-A11 is replaced by geometric multigrid with the AL term
re-discretized per level; the A22 (immersed) inner solves use
Chebyshev-accelerated Jacobi-CG.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..core.generators import background_grid_from_name, immersed_mesh_from_name
from ..core.grid import GridSpace
from ..ops.assembly import (imm_mass_matrix, imm_rhs, imm_stiffness_matrix,
                            laplace_matrix, rhs_vector, interpolate,
                            l2_error, h1_error)
from ..ops.blocks import BlockLayout, block_operator
from ..ops.coupling import build_coupling
from ..ops.krylov import cg, cg_condition_number, fgmres
from ..ops.linop import LinOp, zero_op
from ..ops.operators import constrain, dirichlet_rhs
from ..ops.sparse import COO, spgemm_ctwc
from ..ops.sparse_band import lattice_band_linop
from ..precond.al import al_preconditioner_ideal, al_preconditioner_modified
from ..precond.gmg import build_gmg
from ..precond.weights import (inv_diag, inv_diag_of_m_squared, inv_exact,
                               inv_squared_exact)
from ..utils.expressions import ParsedFunction
from ..utils.precision import full_matmul_precision
from ..utils.prm import Params, parse_prm
from ..utils.report import ConvergenceTable
from ..utils.timer import TimerOutput

__all__ = ["EllipticInterfaceConfig", "EllipticInterfaceProblem",
           "exact_solution", "exact_gradient"]


# Analytical radial solution with coefficient jump (elliptic_interface.cc:56-102,
# from arXiv 2211.03443); beta_1=1, beta_2=10, immersed unit ball, f == 1.
def exact_solution(p, beta1=1.0, beta2=10.0, dim=2):
    r2 = jnp.sum(p ** 2, axis=-1)
    inside = (3.0 * beta2 / beta1 + 1.0 - r2) / (2.0 * dim * beta2)
    outside = (4.0 - r2) / (2.0 * dim * beta1)
    return jnp.where(r2 <= 1.0, inside, outside)


def exact_gradient(p, beta1=1.0, beta2=10.0, dim=2):
    r2 = jnp.sum(p ** 2, axis=-1, keepdims=True)
    return jnp.where(r2 <= 1.0, -p / (dim * beta2), -p / (dim * beta1))


@dataclass
class ControlConfig:
    max_steps: int = 1000
    tolerance: float = 1e-10
    reduction: float | None = 1e-20


@dataclass
class EllipticInterfaceConfig:
    """Mirror of ``ProblemParameters`` (elliptic_interface.cc:117-321)."""

    output_directory: str = "."
    initial_background_refinement: int = 4
    initial_immersed_refinement: int = 2
    name_of_background_grid: str = "hyper_cube"
    arguments_for_background_grid: str = "-1: 1: true"
    name_of_immersed_grid: str = "hyper_cube"
    arguments_for_immersed_grid: str = "-0.14: 0.44: true"
    n_refinement_cycles: int = 5
    beta_1: float = 1.0
    beta_2: float = 10.0
    dirichlet_ids: tuple = (0, 1, 2, 3)
    background_space_degree: int = 1
    immersed_space_degree: int = 1
    coupling_quadrature_order: int = 3
    use_modified_AL_preconditioner: bool = False
    do_parameter_study: bool = False
    start_gamma: float = 1e-3
    end_gamma: float = 1.0
    n_steps_gamma: int = 100
    use_diagonal_inverse: bool = False
    use_h_scaled_mass: bool = False
    use_operator_form: bool = False
    use_sqrt_2_rule: bool = False
    do_sanity_checks: bool = True
    do_convergence_study: bool = False
    export_matrices_for_eig_analysis: bool = False
    gamma_AL_background: float = 10.0
    gamma_AL_immersed: float = 10.0
    use_fixed_iterations: bool = True
    outer: ControlConfig = field(default_factory=ControlConfig)
    inner: ControlConfig = field(default_factory=lambda: ControlConfig(
        max_steps=1000, tolerance=1e-4, reduction=1e-20))
    iteration_number: ControlConfig = field(default_factory=lambda: ControlConfig(
        max_steps=30, tolerance=1e-4, reduction=None))
    f_1: tuple = ("1.", "")
    f_2_minus_f: tuple = ("1.", "")
    fgmres_restart: int = 50  # max_basis_size (elliptic_interface.cc:863)

    def __post_init__(self):
        # sanity checks mirroring elliptic_interface.cc:408-447
        assert self.beta_1 > 0.0, "Beta_1 must be positive."
        assert self.beta_2 > self.beta_1, "Beta_2 must be greater than Beta_1."
        assert self.gamma_AL_background > 0.0
        assert self.gamma_AL_immersed <= self.gamma_AL_background, \
            "gamma2 (solid) should be <= gamma (fluid)"
        if self.do_parameter_study:
            assert self.use_modified_AL_preconditioner, \
                "Parameter study requires the modified AL preconditioner"
        if self.use_sqrt_2_rule:
            assert self.use_modified_AL_preconditioner, \
                "sqrt(2)-rule requires the modified AL preconditioner"

    @classmethod
    def from_prm(cls, text_or_path) -> "EllipticInterfaceConfig":
        text = text_or_path
        if "\n" not in str(text_or_path):
            with open(text_or_path) as fh:
                text = fh.read()
        p = Params(parse_prm(text)).enter("Elliptic Interface Problem")
        al = p.enter("AL preconditioner")
        grids = p.enter("Grid generation")
        study = p.enter("Parameter study")
        ref = p.enter("Refinement and remeshing")

        def ctl(section, **defaults):
            s = p.enter(section)
            return ControlConfig(
                max_steps=s.get_int("Max steps", defaults.get("max_steps", 100)),
                tolerance=s.get_float("Tolerance", defaults.get("tolerance", 1e-10)),
                reduction=(s.get_float("Reduction", defaults["reduction"])
                           if "reduction" in defaults else None))

        def fn(section, default):
            s = p.enter(section)
            return (s.get_str("Function expression", default),
                    s.get_str("Function constants", ""))

        return cls(
            output_directory=p.get_str("Output directory", "."),
            initial_background_refinement=ref.get_int("Initial background refinement", 4),
            initial_immersed_refinement=ref.get_int("Initial immersed refinement", 2),
            n_refinement_cycles=ref.get_int("Refinemented cycles", 5),
            name_of_background_grid=grids.get_str("Background grid generator", "hyper_cube"),
            arguments_for_background_grid=grids.get_str("Background grid generator arguments", "-1: 1: true"),
            name_of_immersed_grid=grids.get_str("Immersed grid generator", "hyper_cube"),
            arguments_for_immersed_grid=grids.get_str("Immersed grid generator arguments", "-0.14: 0.44: true"),
            beta_1=p.get_float("Beta_1", 1.0),
            beta_2=p.get_float("Beta_2", 10.0),
            dirichlet_ids=tuple(p.get_int_list("Homogeneous Dirichlet boundary ids", (0, 1, 2, 3))),
            background_space_degree=p.get_int("FE degree background", 1),
            immersed_space_degree=p.get_int("FE degree immersed", 1),
            coupling_quadrature_order=p.get_int("Coupling quadrature order", 3),
            use_modified_AL_preconditioner=al.get_bool("Use modified AL preconditioner", False),
            do_parameter_study=al.get_bool("Do parameter study", False),
            use_diagonal_inverse=al.get_bool("Use diagonal inverse", False),
            use_sqrt_2_rule=al.get_bool("Use sqrt(2)-rule for gamma", False),
            gamma_AL_background=al.get_float("gamma fluid", 10.0),
            gamma_AL_immersed=al.get_float("gamma solid", 10.0),
            use_h_scaled_mass=p.get_bool("Use h-scaled mass matrix", False),
            use_operator_form=p.get_bool("Use operator form", False),
            do_sanity_checks=p.get_bool("Perform sanity checks", True),
            do_convergence_study=p.get_bool("Perform convergence study", False),
            export_matrices_for_eig_analysis=p.get_bool("Export matrices for eigs-analysis", False),
            use_fixed_iterations=p.get_bool("Use fixed (inner) iterations", True),
            start_gamma=study.get_float("Start gamma", 1e-3),
            end_gamma=study.get_float("Stop gamma", 1.0),
            n_steps_gamma=study.get_int("Number of steps", 100),
            outer=ctl("Outer solver control", max_steps=1000, tolerance=1e-10, reduction=1e-20),
            inner=ctl("Inner solver control", max_steps=1000, tolerance=1e-4, reduction=1e-20),
            iteration_number=ctl("Iteration number control", max_steps=30, tolerance=1e-4),
            f_1=fn("Right hand side f_1", "1."),
            f_2_minus_f=fn("Right hand side f_2 - f", "1."),
        )


class EllipticInterfaceProblem:
    def __init__(self, config: EllipticInterfaceConfig):
        self.cfg = config
        self.timer = TimerOutput()
        self.table = ConvergenceTable()
        self.results = {}
        # mutable AL parameters (sqrt(2)-rule / parameter study mutate them)
        self.gamma_bg = config.gamma_AL_background
        self.gamma_imm = config.gamma_AL_immersed

    # -- per-cycle setup ----------------------------------------------------

    def setup(self, cycle: int = 0):
        self._refine_cache = None
        cfg = self.cfg
        with self.timer.scope("Grid generation"):
            if cfg.do_convergence_study:
                # ad-hoc grids (elliptic_interface.cc:451-461)
                self.beta_1, self.beta_2 = 1.0, 10.0
                self.grid = background_grid_from_name(
                    "hyper_cube", "-1.4: 1.4: false", 2,
                    cfg.initial_background_refinement + cycle)
                self.fg_mesh = immersed_mesh_from_name(
                    "hyper_ball", "0,0 : 1.", 2,
                    cfg.initial_immersed_refinement + cycle)
            else:
                self.beta_1, self.beta_2 = cfg.beta_1, cfg.beta_2
                self.grid = background_grid_from_name(
                    cfg.name_of_background_grid,
                    cfg.arguments_for_background_grid, 2,
                    cfg.initial_background_refinement + cycle)
                self.fg_mesh = immersed_mesh_from_name(
                    cfg.name_of_immersed_grid,
                    cfg.arguments_for_immersed_grid, 2,
                    cfg.initial_immersed_refinement + cycle)

        with self.timer.scope("System setup"):
            self.space = GridSpace.q(self.grid, cfg.background_space_degree)
            # When the immersed domain is itself a uniform box grid (the
            # default configs), build its space on the lattice numbering of a
            # GridSpace so the A22 inner solves get geometric multigrid — the
            # AMG-parity answer for the codim-0 immersed side, whose size
            # grows like the background's (SURVEY §7 hard part #1).
            self.fg_gridspace = None
            if (not cfg.do_convergence_study and cfg.name_of_immersed_grid
                    in ("hyper_cube", "hyper_rectangle")):
                fg_grid = background_grid_from_name(
                    cfg.name_of_immersed_grid,
                    cfg.arguments_for_immersed_grid, 2,
                    cfg.initial_immersed_refinement + cycle)
                self.fg_gridspace = GridSpace.q(fg_grid,
                                                cfg.immersed_space_degree)
                from ..core.immersed import ImmersedSpace

                # immersed_uniform_grid preserves the grid's cell order, so
                # the lattice cell_dofs apply verbatim on the immersed mesh
                self.fg_space = ImmersedSpace(
                    self.fg_mesh, self.fg_gridspace.fe,
                    self.fg_gridspace.cell_dofs, self.fg_gridspace.n_dofs)
            else:
                self.fg_space = self.fg_mesh.space(cfg.immersed_space_degree)
            deg = cfg.background_space_degree
            self.A1 = laplace_matrix(self.space, order=deg + 1)
            A2 = imm_stiffness_matrix(self.fg_space, order=cfg.immersed_space_degree + 1)
            # scale by (beta_2 - beta_1): stiffness local matrices scale linearly
            self.A2 = A2
            self.A2_scale = self.beta_2 - self.beta_1
            self.M = imm_mass_matrix(self.fg_space, order=cfg.immersed_space_degree + 1)

            if cfg.do_convergence_study:
                self.f1_fn = lambda p: jnp.ones(p.shape[0], dtype=p.dtype) \
                    if not isinstance(p, np.ndarray) else np.ones(p.shape[0])
                self.f2_fn = lambda p: (jnp.zeros(p.shape[0], dtype=p.dtype)
                                        if not isinstance(p, np.ndarray)
                                        else np.zeros(p.shape[0]))
                self.bc_values = interpolate(self.space, exact_solution)
                self.free = jnp.asarray(~self.space.boundary_dof_mask(None))
            else:
                self.f1_fn = ParsedFunction(*cfg.f_1)
                self.f2_fn = ParsedFunction(*cfg.f_2_minus_f)
                self.bc_values = jnp.zeros(self.space.n_dofs)
                self.free = jnp.asarray(
                    ~self.space.boundary_dof_mask(list(cfg.dirichlet_ids)))
            self.rhs_f1 = rhs_vector(self.space, self.f1_fn, order=deg + 1)
            self.rhs_f2 = imm_rhs(self.fg_space, self.f2_fn,
                                  order=cfg.immersed_space_degree + 1)

        with self.timer.scope("Coupling setup"):
            # the reference uses QGauss(fe_bg.degree + 1) here
            # (elliptic_interface.cc:574)
            self.C = build_coupling(self.space, self.fg_space, order=deg + 1)

        self.layout = BlockLayout((self.space.n_dofs, self.fg_space.n_dofs,
                                   self.fg_space.n_dofs))
        self._solvers = {}
        return self

    # -- solve --------------------------------------------------------------

    def _beta_scaled(self, cm, scale):
        def mv(x):
            return scale * cm.mv(x)

        return LinOp(mv, cm.shape, mv)

    @staticmethod
    def _lat_ok(sp) -> bool:
        return (sp is not None and sp.fe.degree == 1 and sp.continuous
                and hasattr(sp, "n_points_1d"))

    def _lap_apply(self, sp, cm):
        """Q1 stiffness apply as separable lattice stencils — no
        gather/scatter in the hot loops (the models/immersed_laplace._k_apply
        trade; element scatters in f64 dominated the elliptic solve on TPU).
        Falls back to the assembled element form off-lattice."""
        if self._lat_ok(sp):
            from ..parallel.lattice import LatticeOps, flat_to_lattice, to_flat

            lat = LatticeOps.for_space(sp)
            shape = sp.n_points_1d

            def mv(x):
                return to_flat(lat.laplace(flat_to_lattice(x, shape)))

            return mv
        return cm.mv

    def _mass_apply(self, sp, cm):
        """Q1 mass apply as separable lattice stencils (see _lap_apply)."""
        if self._lat_ok(sp):
            from ..parallel.lattice import LatticeOps, flat_to_lattice, to_flat

            lat = LatticeOps.for_space(sp)
            shape = sp.n_points_1d

            def mv(x):
                return to_flat(lat.mass(flat_to_lattice(x, shape)))

            return mv
        return cm.mv

    def solve(self):
        cfg = self.cfg
        key = (round(self.gamma_bg, 12), round(self.gamma_imm, 12),
               cfg.use_modified_AL_preconditioner)
        if key not in self._solvers:
            with self.timer.scope("Build solver"):
                self._solvers[key] = self._build_solver()
        with self.timer.scope("Solve system"):
            x, info = self._solvers[key](self.rhs_f1, self.rhs_f2,
                                         self.bc_values)
            x = jax.block_until_ready(x)
        u, u2, lam = self.layout.split(x)
        self.u, self.u2, self.lam = u, u2, lam
        self.results.update(
            dofs_background=self.space.n_dofs,
            dofs_immersed=self.fg_space.n_dofs,
            outer_iterations=int(info.iterations),
            converged=bool(info.converged),
            residual=float(info.residual),
            gamma=self.gamma_bg,
        )
        return int(info.iterations)

    def _build_solver(self, raw_rhs: bool = False):
        """With ``raw_rhs`` the returned jit takes the assembled block
        right-hand side ``(r0, r1, r2)`` directly (no Dirichlet lifting, no
        final boundary overwrite) — the correction engine of
        :meth:`solve_refined`."""
        cfg = self.cfg
        layout = self.layout
        gamma_1 = self.gamma_bg
        gamma_2 = self.gamma_imm
        if cfg.use_h_scaled_mass or cfg.use_operator_form:
            h_imm = self.fg_mesh.h_max
            gamma_1 = gamma_1 / h_imm ** 2
            gamma_2 = gamma_2 / h_imm ** 2

        a1_mv = self._lap_apply(self.space, self.A1)
        A1_lin = LinOp(lambda x: self.beta_1 * a1_mv(x), self.A1.shape,
                       lambda x: self.beta_1 * a1_mv(x))
        a2_mv = self._lap_apply(self.fg_gridspace, self.A2)
        A2_lin = LinOp(lambda x: self.A2_scale * a2_mv(x), self.A2.shape,
                       lambda x: self.A2_scale * a2_mv(x))
        # the immersed mesh mirrors its lattice twin's numbering when
        # fg_gridspace exists (uniform box), so the lattice mass/stiffness
        # applies are the SAME matrices without the element gather/scatter
        # (_lap_apply/_mass_apply fall back to cm.mv internally off-lattice)
        m_mv = self._mass_apply(self.fg_gridspace, self.M)
        M_lin = LinOp(m_mv, self.M.shape, m_mv)
        C_lin = LinOp(self.C.mv, self.C.shape, self.C.rmv)
        Ct_lin = C_lin.T
        free = self.free
        n_bg = self.space.n_dofs
        n_fg = self.fg_space.n_dofs

        # W^{-1} options (elliptic_interface.cc:700-739); the exact inverses
        # use the tensor-product lattice factorization when the immersed
        # space is a uniform box grid (any size, O(1) apply latency —
        # precond.weights.lattice_mass_inverse), the UMFPACK-parity path
        if cfg.use_h_scaled_mass or cfg.use_operator_form:
            inv_w = (inv_diag(self.M) if cfg.use_diagonal_inverse
                     else inv_exact(self.M, space=self.fg_gridspace))
            w_diag = 1.0 / np.asarray(self.M.diag())
        else:
            inv_w = (inv_diag_of_m_squared(self.M) if cfg.use_diagonal_inverse
                     else inv_squared_exact(self.M, space=self.fg_gridspace))
            rowsum2 = inv_diag_of_m_squared(self.M)
            w_diag = np.asarray(rowsum2(jnp.ones(n_fg)))

        # A11 augmented block + its GMG (AMG stand-in)
        if cfg.use_operator_form:
            Cpart = build_coupling(self.space, self.fg_space,
                                   order=2 * cfg.background_space_degree + 1)

            def particle_al(Cp, sp):
                # variable-coefficient 9-point patch stencil when the Q1
                # lattice allows it (no gather/scatter in the hot applies —
                # same trade as models/immersed_laplace); particle gather
                # form otherwise
                st = Cp.patch_stencil_al(sp, gamma_1)
                if st is not None:
                    return st
                return (Cp.particle_mass_term(gamma_1),
                        Cp.particle_mass_diag(gamma_1))

            AL11, al11_diag = particle_al(Cpart, self.space)

            def al_factory(sp):
                Cp = Cpart if sp is self.space else build_coupling(
                    sp, self.fg_space, order=2 * cfg.background_space_degree + 1)
                return particle_al(Cp, sp)
        else:
            AL11 = self.C.al_term(inv_w, gamma_1)
            al11_diag = self.C.al_term_diag(w_diag, gamma_1)
            wd = jnp.asarray(w_diag)

            def al_factory(sp):
                # GMG levels use the DIAG-WEIGHTED surrogate γ·Cᵀdiag(w)C —
                # the reference's AMG is likewise built on the diag-weighted
                # explicit augmented matrix (elliptic_interface.cc:821-851
                # via utilities.h build_AMG_augmented_block_scalar), never on
                # the exact W⁻¹ operator, which would nest M-solves inside
                # every smoother apply.  The OUTER operator keeps exact AL11.
                Cl = self.C if sp is self.space else build_coupling(
                    sp, self.fg_space, order=cfg.background_space_degree + 1)

                # the SAME matrix as a shift-FMA band stencil when the level
                # is a Q1 lattice: no gather/scatter inside the smoother hot
                # loop (the coupling applies dominated the V-cycle — ~3 ms
                # per smoother apply at 66k dofs, 104 ms per GMG apply)
                band = lattice_band_linop(
                    sp, spgemm_ctwc(COO.from_coupling(Cl), w_diag),
                    scale=gamma_1)
                if band is not None:
                    return band[0], jnp.asarray(band[2])

                def mv(x, Cl=Cl):
                    return gamma_1 * Cl.rmv(wd.astype(x.dtype) * Cl.mv(x))

                return mv, Cl.al_term_diag(w_diag, gamma_1)

        A11_aug = constrain(A1_lin + AL11, free)

        def a11_factory(sp):
            K_l = self.A1 if sp is self.space else laplace_matrix(
                sp, order=cfg.background_space_degree + 1)
            k_mv = self._lap_apply(sp, K_l)
            al_mv, al_diag = al_factory(sp)

            def mv(x):
                return self.beta_1 * k_mv(x) + al_mv(x)

            return mv, self.beta_1 * K_l.diag() + al_diag

        gmg11 = build_gmg(self.space, a11_factory, free_mask=free)

        # A22 augmented block: A2 + gamma_2 * M W^{-1} M
        def A22_mv(x):
            return A2_lin(x) + gamma_2 * M_lin(inv_w(M_lin(x)))

        # Preconditioner for A22: the reference builds AMG on the surrogate
        # A2 + gamma_2*(h-scaled M | I) (elliptic_interface.cc:838-851).
        # Uniform immersed grid -> geometric multigrid on the surrogate;
        # otherwise dense LU (small meshes) or Chebyshev.
        use_mass_surrogate = cfg.use_h_scaled_mass or cfg.use_operator_form
        if self.fg_gridspace is not None:
            def a22_factory(sp):
                K_l = laplace_matrix(sp, order=cfg.immersed_space_degree + 1)
                k_mv = self._lap_apply(sp, K_l)
                if use_mass_surrogate:
                    from ..ops.assembly import mass_matrix as _mm

                    M_l = _mm(sp, order=cfg.immersed_space_degree + 1)
                    m_mv_l = self._mass_apply(sp, M_l)

                    def mv(x):
                        return self.A2_scale * k_mv(x) + gamma_2 * m_mv_l(x)

                    return mv, self.A2_scale * K_l.diag() + gamma_2 * M_l.diag()

                def mv(x):
                    return self.A2_scale * k_mv(x) + gamma_2 * x

                return mv, self.A2_scale * K_l.diag() + gamma_2

            gmg22 = build_gmg(self.fg_gridspace, a22_factory,
                              free_mask=np.ones(n_fg, dtype=bool))
            A22_prec = gmg22.apply
        else:
            if use_mass_surrogate:
                a22_diag = self.A2_scale * self.A2.diag() + gamma_2 * self.M.diag()

                def a22_sur(x):
                    return self.A2_scale * self.A2.mv(x) + gamma_2 * self.M.mv(x)
            else:
                a22_diag = self.A2_scale * self.A2.diag() + gamma_2

                def a22_sur(x):
                    return self.A2_scale * self.A2.mv(x) + gamma_2 * x

            if n_fg <= 4000:
                # dense inverse of the surrogate (UMFPACK/AMG stand-in):
                # ONE MXU matmul per application — triangular lu_solve is
                # sequential and latency-bound on TPU (same trade as the GMG
                # coarse solve, precond/gmg.py)
                eye = jnp.eye(n_fg, dtype=a22_diag.dtype)
                dense = jax.vmap(a22_sur, in_axes=1, out_axes=1)(eye)
                # host f64 inversion (TPU XLA lacks f64 LuDecomposition)
                inv22 = jnp.asarray(np.linalg.inv(
                    np.asarray(dense, dtype=np.float64))).astype(
                        a22_diag.dtype)

                def A22_prec(v):
                    return inv22 @ v
            else:
                from ..ops.krylov import lanczos_max_eig
                from ..precond.chebyshev import chebyshev

                a22_dinv = 1.0 / a22_diag
                lam = lanczos_max_eig(lambda v: a22_dinv * a22_sur(v), n_fg,
                                      steps=10, dtype=a22_diag.dtype)
                A22_prec = chebyshev(a22_sur, a22_dinv, lam, degree=5)

        inner_kw = dict(tol=cfg.iteration_number.tolerance,
                        max_steps=cfg.iteration_number.max_steps,
                        fixed_iters=True) if cfg.use_fixed_iterations else \
            dict(tol=cfg.inner.tolerance, reduction=cfg.inner.reduction,
                 max_steps=cfg.inner.max_steps)

        def A11_inv(v):
            x, _ = cg(A11_aug, v, M=gmg11.apply, **inner_kw)
            return x

        def A22_inv(v):
            x, _ = cg(A22_mv, v, M=A22_prec, **inner_kw)
            return x

        # off-diagonal augmented blocks (elliptic_interface.cc:810-813)
        def A12_mv(x):
            return -gamma_1 * Ct_lin(inv_w(M_lin(x)))

        def A21_mv(x):
            return -gamma_2 * M_lin(inv_w(C_lin(x)))

        A12 = LinOp(A12_mv, (n_bg, n_fg))
        A21 = LinOp(A21_mv, (n_fg, n_bg))
        system_operator = block_operator(layout, layout, [
            [A11_aug, A12, Ct_lin],
            [A21, LinOp(A22_mv, (n_fg, n_fg)), -1.0 * M_lin],
            [C_lin, -1.0 * M_lin, None],
        ])

        if cfg.use_modified_AL_preconditioner:
            assert self.gamma_imm <= 20.0, \
                "gamma_AL_immersed too large for modified AL"
            prec = al_preconditioner_modified(layout, A11_inv, A22_inv,
                                              Ct_lin, M_lin, inv_w, gamma_1)
        else:
            assert self.gamma_bg > 1.0, \
                "gamma probably too small for classical AL preconditioner"
            assert abs(self.gamma_bg - self.gamma_imm) < 1e-12, \
                "ideal AL requires gamma_1 == gamma_2"
            sub = BlockLayout((n_bg, n_fg))
            Aug2x2 = block_operator(sub, sub, [
                [A11_aug, A12], [A21, LinOp(A22_mv, (n_fg, n_fg))]])

            def prec_aug(x):
                x0, x1 = sub.split(x)
                return sub.concat((gmg11.apply(x0), A22_prec(x1)))

            def aug_inv_coupled(v):
                x, _ = cg(Aug2x2, v, M=prec_aug,
                          tol=cfg.inner.tolerance,
                          reduction=cfg.inner.reduction,
                          max_steps=cfg.inner.max_steps)
                return x

            prec = al_preconditioner_ideal(layout, aug_inv_coupled, Ct_lin,
                                           M_lin, inv_w, gamma_1)

        A1_raw = A1_lin

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
                x, info = solve_core(layout.concat((r0, r1, r2)))
                return x, info

            ex = (jax.ShapeDtypeStruct((n_bg,), dt),
                  jax.ShapeDtypeStruct((n_fg,), dt),
                  jax.ShapeDtypeStruct((n_fg,), dt))
            return jit_hoisted(full_matmul_precision(run_raw), ex)

        def run(rhs_f1, rhs_f2, bc_values):
            b0 = dirichlet_rhs(A1_raw, rhs_f1, free, bc_values)
            b = layout.concat((b0, rhs_f2, jnp.zeros(n_fg, dtype=b0.dtype)))
            x, info = solve_core(b)
            u, u2, lam = layout.split(x)
            u = jnp.where(free, u, bc_values)
            return layout.concat((u, u2, lam)), info

        # hoisted jit: the GMG diagonals/masks and coupling tables stay
        # runtime arguments, keeping the (remote-)compile payload KB-sized
        # at the reference's 8-cycle (~1M dof) scale
        ex = (jax.ShapeDtypeStruct((n_bg,), dt),
              jax.ShapeDtypeStruct((n_fg,), dt),
              jax.ShapeDtypeStruct((n_bg,), dt))
        return jit_hoisted(full_matmul_precision(run), ex)

    def build_correction_solver(self):
        """jit of ``(r0, r1, r2) -> (x, info)``: one AL-preconditioned
        FGMRES solve of the 3x3 system with a RAW right-hand side — the
        inner engine of :meth:`solve_refined`.  One short device
        program per refinement step (watchdog-safe, utils.refine)."""
        from ..utils.refine import capped_max_steps

        with capped_max_steps(self.cfg.outer):
            return self._build_solver(raw_rhs=True)

    def solve_refined(self, tol_abs: float = 1e-10, max_refine: int = 12):
        """Mixed-precision iterative refinement to REFERENCE solve quality
        on TPU (the elliptic analog of
        models.immersed_laplace.solve_refined): the f32 jitted solver
        produces corrections on device; the TRUE residual of the 3x3 block
        system is evaluated in f64 on the host (ops.host_ref
        .HostEllipticSystem) and the loop runs until it reaches ``tol_abs``
        — the reference's 1e-12 'Outer solver control: Tolerance'
        (parameters_elliptic_interface/parameters_ideal.prm), which plain
        f32 cannot reach.

        Returns ``(u, u2, lam, history)`` with f64 iterates and per-step
        true residual norms; ``self.results`` records total iterations.
        Divergence-guarded: see utils.refine.guarded_refinement.  The host
        reference and correction solver are cached per ``setup()``; any
        mutation of rhs/bc/γ state must go through ``setup()`` (or reset
        ``_refine_cache``) to take effect here."""
        from ..ops.host_ref import HostEllipticSystem
        from ..utils.refine import guarded_refinement

        # memoized per setup(): a second solve_refined on the same
        # problem re-runs the CACHED executable (table timing runs
        # warm-up + timed pass, like the plain-solve rows)
        if getattr(self, '_refine_cache', None) is None:
            self._refine_cache = (HostEllipticSystem(self),
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
            dofs_background=self.space.n_dofs,
            dofs_immersed=self.fg_space.n_dofs,
            outer_iterations=total_iters,
            refined_residual=history[-1],
            refine_steps=len(history) - 1,
            converged=converged)
        return u, u2, lam, history

    # -- diagnostics --------------------------------------------------------

    def constraint_residual(self) -> float:
        """||C u - M u2||_inf (elliptic_interface.cc:973-984)."""
        r = self.C.mv(self.u) - self.M.mv(self.u2)
        return float(jnp.max(jnp.abs(r)))

    def cct_condition_estimate(self, max_steps: int = 200):
        """cond(CCᵀ) + full-rank assert (elliptic_interface.cc:986-1009)."""
        b = jnp.ones(self.fg_space.n_dofs)
        _, info, (al, be) = cg(lambda v: self.C.mv(self.C.rmv(v)), b,
                               tol=1e-12, max_steps=max_steps,
                               track_tridiag=True)
        assert bool(info.converged), "CCt does not have full rank."
        return cg_condition_number(al, be, info.iterations)

    def errors(self):
        """L2/H1 errors vs the analytical solution (convergence study)."""
        return (l2_error(self.space, self.u, exact_solution),
                h1_error(self.space, self.u, exact_gradient))

    # -- driver -------------------------------------------------------------

    def parameter_study(self):
        """γ sweep on the initial grids; returns (best_gamma, iters list)
        (elliptic_interface.cc:1088-1128)."""
        cfg = self.cfg
        gammas = np.linspace(cfg.start_gamma, cfg.end_gamma, cfg.n_steps_gamma)
        self.setup(0)
        iters = []
        for g in gammas:
            self.gamma_bg = float(g)
            self.gamma_imm = float(g)
            iters.append(self.solve())
        best = float(gammas[int(np.argmin(iters))])
        self.gamma_bg = best
        self.gamma_imm = best
        return best, iters

    def run(self):
        cfg = self.cfg
        if cfg.do_parameter_study and cfg.use_modified_AL_preconditioner:
            best, _ = self.parameter_study()
            self.results["optimal_gamma"] = best
        for cycle in range(cfg.n_refinement_cycles):
            self.setup(cycle)
            its = self.solve()
            row = dict(cells=self.grid.n_cells,
                       dof_background=self.space.n_dofs,
                       dof_immersed=self.fg_space.n_dofs,
                       gamma=self.gamma_bg,
                       outer_iterations=its)
            if cfg.do_convergence_study:
                l2, h1 = self.errors()
                row["L2"] = l2
                row["H1"] = h1
            if cfg.do_sanity_checks:
                row["constraint_residual"] = self.constraint_residual()
            self.table.add_row(**row)
            if cfg.use_modified_AL_preconditioner and cfg.use_sqrt_2_rule:
                self.gamma_bg /= np.sqrt(2.0)
                self.gamma_imm /= np.sqrt(2.0)
        if cfg.do_convergence_study:
            self.table.evaluate_rates(["L2", "H1"])
        return self.table
