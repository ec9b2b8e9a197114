"""Immersed-boundary Poisson problem with a Lagrange-multiplier constraint on
an embedded curve Γ (the flagship DLM problem).

TPU-native re-implementation of the reference's ``immersed_laplace``
executable (immersed_laplace.cc, class ``DistributedLagrangeProblem``):

    -Δu = f in Ω,   u = g on Γ,   u = g_D on ∂Ω
    [ K   Cᵀ ] [u]   [f]
    [ C   0  ] [λ] = [g]

Solver modes (immersed_laplace.cc:502-951):
  - ``CG``           exact Schur complement S = C K⁻¹ Cᵀ, CG (lines 507-525)
  - ``ELMAN_triang`` BFBt block preconditioner + right-GMRES (lines 526-584)
  - ``rational``     MinRes + rational fractional-Laplacian prec (585-635)
  - ``augmented``    FGMRES + AL preconditioner, inner CG on the augmented
                     block (636-944) — the paper's method

Design deviations (TPU-first):
  - UMFPACK/AMG are replaced by geometric multigrid on the background grid +
    tightly-converged CG (see precond.gmg).
  - ``Local refinements steps near embedded domain`` (delta_refinement > 0)
    builds a 2:1-balanced quadtree locally refined around the Γ support
    points (cells + face neighbors per step, immersed_laplace.cc:332-343)
    with hanging-node constraints folded into the element dof maps
    (core.adaptive); GMG coarsens by truncating the quadtree.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..core.grid import GridSpace, UniformGrid
from ..core.immersed import parametrized_curve
from ..ops.assembly import (imm_mass_matrix, imm_rhs, imm_stiffness_matrix,
                            interpolate, laplace_matrix, mass_matrix,
                            rhs_vector)
from ..ops.blocks import BlockLayout, block_operator
from ..ops.coupling import build_coupling
from ..ops.krylov import cg, cg_condition_number, fgmres, gmres, minres
from ..ops.linop import LinOp
from ..ops.operators import constrain, dirichlet_rhs
from ..precond.al import al_preconditioner
from ..precond.gmg import build_gmg
from ..precond.weights import (inv_diag, inv_diag_squared, inv_exact,
                               inv_squared_exact)
from ..utils.expressions import ParsedFunction
from ..utils.prm import Params
from ..utils.timer import TimerOutput

__all__ = ["ImmersedLaplaceConfig", "ImmersedLaplaceProblem"]


@dataclass
class SolverControlConfig:
    max_steps: int = 1000
    tolerance: float = 1e-12
    reduction: float | None = 1e-12


@dataclass
class ImmersedLaplaceConfig:
    """Mirror of the reference's Parameters class + parsed functions
    (immersed_laplace.cc:70-233; prm keys reproduced verbatim)."""

    initial_refinement: int = 4
    delta_refinement: int = 0
    initial_embedded_refinement: int = 5
    dirichlet_ids: tuple = (0, 1, 2, 3)
    embedding_space_degree: int = 1
    embedded_space_degree: int = 1
    embedded_configuration_degree: int = 1
    coupling_quadrature_order: int = 3
    use_displacement: bool = False
    solver: str = "CG"
    use_operator_form: bool = False
    use_diagonal_inverse: bool = False
    schur: SolverControlConfig = field(default_factory=SolverControlConfig)
    # parsed functions (expression, constants)
    embedded_configuration: tuple = ("R*cos(2*pi*x)+Cx; R*sin(2*pi*x)+Cy",
                                     "R=.3, Cx=.4,Cy=.4")
    embedding_rhs: tuple = ("0", "")
    embedded_value: tuple = ("1", "")
    dirichlet_boundary: tuple = ("0", "")
    gamma: float = 10.0  # hardcoded in the reference (line 647)
    # FGMRES basis size (deal.II max_basis_size 50, elliptic_interface.cc:863).
    # HBM note: the basis V (restart+1, n) + flexible store Z (restart, n) cost
    # ~(2*restart+1)*4n bytes f32 — at the 16.8M-dof row that is 6.8 GB of the
    # v5e's 16 GB (measured to fit alongside the GMG hierarchy); lower this
    # before raising the refinement further or running multiple solvers at once
    fgmres_restart: int = 50
    inner_max_steps: int = 100     # SolverControl control_lagrangian(100, 1e-2)
    inner_tolerance: float = 1e-2
    # TPU extension (no reference analog): run the inner-solve multigrid
    # V-cycle in bfloat16 — a preconditioner serving a 1e-2 inner tolerance
    # doesn't need more, and bf16 halves the smoother's HBM traffic
    use_bf16_multigrid: bool = False
    # GMG Chebyshev smoother degree (stencil applies per pre/post sweep);
    # trades V-cycle cost against inner-CG iteration counts
    gmg_smoother_degree: int = 4

    @classmethod
    def from_prm(cls, text_or_path) -> "ImmersedLaplaceConfig":
        text = text_or_path
        if "\n" not in str(text_or_path):
            with open(text_or_path) as fh:
                text = fh.read()
        from ..utils.prm import parse_prm

        p = Params(parse_prm(text)).enter("Distributed Lagrange<1,2>")
        al = p.enter("AL preconditioner")
        sc = p.enter("Schur solver control")

        def fn(section, default_expr):
            sub = p.enter(section)
            return (sub.get_str("Function expression", default_expr),
                    sub.get_str("Function constants", ""))

        return cls(
            initial_refinement=p.get_int("Initial embedding space refinement", 4),
            delta_refinement=p.get_int("Local refinements steps near embedded domain", 0),
            initial_embedded_refinement=p.get_int("Initial embedded space refinement", 5),
            dirichlet_ids=tuple(p.get_int_list("Dirichlet boundary ids", (0, 1, 2, 3))),
            embedding_space_degree=p.get_int("Embedding space finite element degree", 1),
            embedded_space_degree=p.get_int("Embedded space finite element degree", 1),
            embedded_configuration_degree=p.get_int("Embedded configuration finite element degree", 1),
            coupling_quadrature_order=p.get_int("Coupling quadrature order", 3),
            use_displacement=p.get_bool("Use displacement in embedded interface", False),
            solver=p.get_str("Solver", "CG"),
            use_operator_form=al.get_bool("Use operator version", False),
            use_diagonal_inverse=al.get_bool("Use diagonal inverse", False),
            schur=SolverControlConfig(
                max_steps=sc.get_int("Max steps", 1000),
                tolerance=sc.get_float("Tolerance", 1e-12),
                reduction=sc.get_float("Reduction", 1e-12)),
            embedded_configuration=fn("Embedded configuration",
                                      "R*cos(2*pi*x)+Cx; R*sin(2*pi*x)+Cy"),
            embedding_rhs=fn("Embedding rhs function", "0"),
            embedded_value=fn("Embedded value", "1"),
            dirichlet_boundary=fn("Embedding Dirichlet boundary conditions", "0"),
        )


class ImmersedLaplaceProblem:
    def __init__(self, config: ImmersedLaplaceConfig):
        self.cfg = config
        self.timer = TimerOutput()
        self.results = {}

    # -- setup --------------------------------------------------------------

    def setup(self):
        self._refine_cache = None
        cfg = self.cfg
        with self.timer.scope("Setup grids and dofs"):
            conf = ParsedFunction(*cfg.embedded_configuration)
            if cfg.use_displacement:
                # MappingQEulerian: configuration = identity + displacement
                base = conf

                def conf_fn(pts):
                    return pts[:, :2] + np.asarray(base(pts))
            else:
                def conf_fn(pts):
                    return np.asarray(conf(pts))

            self.curve = parametrized_curve(
                conf_fn, cfg.initial_embedded_refinement,
                geom_degree=cfg.embedded_configuration_degree)

            if cfg.embedded_space_degree > 0:
                self.imm_space = self.curve.space(cfg.embedded_space_degree)
            else:
                self.imm_space = self.curve.space(0, continuous=False)

            # background: unit square, colorized ids (hyper_cube(0,1,true));
            # delta_refinement steps locally refine the cells containing the
            # Γ support points + their face neighbors, exactly the reference
            # loop (immersed_laplace.cc:328-343)
            if cfg.delta_refinement > 0:
                from ..core.adaptive import AdaptiveGrid, AdaptiveSpace

                agrid = AdaptiveGrid.uniform(2, cfg.initial_refinement)
                support = self.imm_space.dof_points
                for _ in range(cfg.delta_refinement):
                    agrid = agrid.refine_near(support)
                self.grid = agrid
                self.space = AdaptiveSpace(agrid, cfg.embedding_space_degree)
                h_omega_min = agrid.min_cell_diameter
            else:
                self.grid = UniformGrid.hyper_cube(
                    2, 0.0, 1.0, cfg.initial_refinement)
                self.space = GridSpace.q(self.grid,
                                         cfg.embedding_space_degree)
                h_omega_min = self.grid.cell_diameter

            # mesh-compatibility guard (immersed_laplace.cc:364-369)
            if self.curve.h_max >= h_omega_min:
                raise ValueError(
                    "The embedding grid is too refined (or the embedded grid "
                    "is too coarse): "
                    f"h_Gamma={self.curve.h_max:.3e} >= "
                    f"h_Omega={h_omega_min:.3e}")

        with self.timer.scope("Assemble system"):
            deg = cfg.embedding_space_degree
            kdeg = cfg.embedded_space_degree
            self.K = laplace_matrix(self.space, order=deg + 1)
            self.Mass_bg = mass_matrix(self.space, order=deg + 1)
            self.f_fn = ParsedFunction(*cfg.embedding_rhs)
            self.g_fn = ParsedFunction(*cfg.embedded_value)
            self.bc_fn = ParsedFunction(*cfg.dirichlet_boundary)
            self.rhs_f = rhs_vector(self.space, self.f_fn, order=deg + 1)
            self.A_imm = imm_stiffness_matrix(self.imm_space, order=deg + 1)
            self.M = imm_mass_matrix(self.imm_space, order=max(kdeg + 1, 2))
            self.rhs_g = imm_rhs(self.imm_space, self.g_fn,
                                 order=max(kdeg + 1, 2))
            self.free = jnp.asarray(
                ~self.space.boundary_dof_mask(list(cfg.dirichlet_ids)))
            self.bc_values = interpolate(self.space, self.bc_fn)

        with self.timer.scope("Setup coupling"):
            self.C = build_coupling(self.space, self.imm_space,
                                    cfg.coupling_quadrature_order)
        self.layout = BlockLayout((self.space.n_dofs, self.imm_space.n_dofs))
        return self

    # -- solver helpers -----------------------------------------------------

    def _kg_inv(self, reduction=1e-13):
        """Tight GMG-preconditioned CG inverse of the constrained K — the
        UMFPACK/AMG-exact-inverse stand-in.  Lattice-resident on 2D Q1
        lattices (the inner CG + GMG chain on (ny, nx) arrays; the flat
        boundary is crossed once per K_inv call)."""
        phys = self._lat_phys(self.space) if self._lat_mode_ok() else None
        f2_lat = (self._fused_masked_k_lat(self.space, phys=phys)
                  if self._lat_mode_ok() else None)
        if f2_lat is not None:
            from ..parallel.lattice import flat_to_lattice, to_flat

            shape = self.space.n_points_1d
            lat = tuple(reversed(shape))

            def _padk(x2):
                if phys is None:
                    return x2
                return jnp.pad(x2, ((0, phys[0] - lat[0]),
                                    (0, phys[1] - lat[1])))

            def _unpadk(x2):
                return x2 if phys is None else x2[:lat[0], :lat[1]]

            def factory_lat(sp):
                K_l = self.K if sp is self.space else laplace_matrix(
                    sp, order=self.cfg.embedding_space_degree + 1)
                phys_l = self._lat_phys(sp)
                f2l = self._fused_masked_k_lat(sp, phys=phys_l)
                cb = self._fused_cheb_builder(sp, None, 0.0, flat=False,
                                              phys=phys_l)
                return f2l, self._k_diag(sp, K_l), f2l, cb

            gmg = build_gmg(self.space, factory_lat, free_mask=self.free,
                            lattice=True, lattice_phys=self._lat_phys)

            def k_mv(x):
                return to_flat(_unpadk(f2_lat(_padk(
                    flat_to_lattice(x, shape)))))

            K_c = LinOp(k_mv, self.K.shape, k_mv, name="K_c")

            def K_inv(v):
                x2, _ = cg(f2_lat, _padk(flat_to_lattice(v, shape)),
                           M=gmg.apply,
                           tol=0.0, reduction=reduction, max_steps=2000)
                return to_flat(_unpadk(x2))

            return K_c, K_inv

        fused = self._fused_masked_k(self.space)
        if fused is not None:
            K_c = LinOp(fused, self.K.shape, fused, name="K_c")
        else:
            K_c = constrain(self.K.as_linop(), self.free)
        gmg = build_gmg(self.space, self._factory_k, free_mask=self.free)

        def K_inv(v):
            x, _ = cg(K_c, v, M=gmg.apply, tol=0.0, reduction=reduction,
                      max_steps=2000)
            return x

        return K_c, K_inv

    @staticmethod
    def _is_lattice(sp) -> bool:
        return sp.fe.degree == 1 and sp.continuous and \
            hasattr(sp, "n_points_1d")

    def _k_apply(self, sp, K_cm):
        """Fast path: Q1 background stiffness applies as separable lattice
        stencils (parallel.lattice) — near-memory-bound on TPU; higher degrees
        fall back to the element (gather/einsum/scatter) form."""
        if self._is_lattice(sp):
            from ..parallel.lattice import LatticeOps, flat_to_lattice, to_flat

            lat = LatticeOps.for_space(sp)
            shape = sp.n_points_1d

            def mv(x):
                return to_flat(lat.laplace(flat_to_lattice(x, shape)))

            return mv
        return K_cm.mv

    def _k_diag(self, sp, K_cm):
        """Stiffness diagonal without materializing cell dof tables (lattice
        outer-sum formula on Q1 grids — the element-form diag bakes a
        cell_dofs constant that breaks remote compiles at 16M+ dofs)."""
        if self._is_lattice(sp):
            from ..parallel.lattice import LatticeOps

            return LatticeOps.for_space(sp).laplace_diag()
        return K_cm.diag()

    # Minimum FINE-lattice extent for the Pallas fast path.  Round 2 gated
    # this at 4097 after composed 1025-fine solves aborted the v5e runtime;
    # the round-3 root causes were (a) a Mosaic extract_strided_slice crash
    # on sliced lane-replicated iotas and (b) VMEM oversubscription across
    # the program's resident Pallas kernels (fixed by the smoother's T=96
    # band height).  With both fixed, composed solves validate at fine 1025,
    # 2049 and 4097, and the gate keeps only the tiny-lattice cutoff.
    FUSED_MIN_FINE_POINTS = int(os.environ.get(
        "FDAL_FUSED_MIN_FINE", "512"))

    # Fine-lattice extent above which the lattice-resident inner solve must
    # use the RESTRICTED Pallas composition on TPU.  The v5e runtime fault
    # at fine 4097 (ref 12) was fully bisected in round 4 (exp5 full-stack
    # synthetic repro, each axis isolated on hardware): inside a composed
    # CG-while + Pallas-GMG program at 4097² there are exactly TWO
    # independent triggers —
    #   (T1) the XLA Γ-band patch AL apply at patch extents ≳ 1024 rows
    #        (ANY write form: dynamic_update_slice, pad-embed, at[].set;
    #        extent 512 passes, and the same patch passes at fine 2049);
    #   (T2) the TWO-OUTPUT "pre"-mode fused-Chebyshev kernel (planes +
    #        pre crashes even at 3 levels; single-output smooth passes).
    # The SAME program with single-output Pallas kernels only (masked
    # stencil, smooth-mode Chebyshev with AL planes, mode="op" augmented
    # apply) + coarse dense matmul + hoisted jit PASSES at exact 4097
    # shapes.  Round 3's "any Pallas kernel in the loop crashes" was wrong:
    # its repros all contained the XLA patch term (T1).  Above this gate the
    # solver therefore (a) applies the augmented operator with the
    # single-pass mode="op" kernel at every kernel-sized level (no XLA
    # patch in the loop) and (b) disables the pre-mode smoother kernels.
    LAT_MAX_FINE = int(os.environ.get("FDAL_LAT_MAX_FINE", "4096"))

    def _lat_big(self) -> bool:
        """True when the fine lattice is above LAT_MAX_FINE on TPU — the
        regime where the lattice-resident composition must avoid the two
        v5e fault triggers (XLA patch AL in-loop; pre-mode kernels)."""
        import jax as _jax

        return (_jax.default_backend() == "tpu"
                and max(self.space.n_points_1d) > self.LAT_MAX_FINE)

    def _lat_mode_ok(self) -> bool:
        """Whether the lattice-resident inner solve is enabled for the
        current fine space (see LAT_MAX_FINE and _lat_big)."""
        if self._fused_masked_k_lat(self.space) is None:
            return False
        if self._lat_big():
            # needs the restricted composition: fused single-output kernels
            # must be available (solver builders additionally require the
            # mode="op" augmented apply before committing to lattice mode)
            from ..ops.pallas_kernels import force_xla_kernels

            return (getattr(self, "_fused_enabled", True)
                    and os.environ.get("FDAL_DISABLE_FUSED_CHEB") != "1"
                    and not force_xla_kernels())
        return True

    def _lat_phys(self, sp):
        """Physical lane-aligned padded lattice shape (py, px) for the
        padded-lattice mode, or None for exact shapes.

        Lane-aligned physical shapes (px a multiple of 128, py of 8) remove
        every partial lane-tile from the Pallas kernels and make the
        flat<->lattice reshape a cheap layout-preserving one.  Built as a
        candidate root fix for the v5e fault that kills the worker when
        Pallas kernels run inside the composed outer-FGMRES + CG-while + GMG
        program at fine lattices > LAT_MAX_FINE — but measured on hardware
        (2026-08-18, ref 12): the padded composition faults identically, so
        padding is OPT-IN (FDAL_LAT_PAD=1) until the real trigger is fixed.
        A minimal CG-while + Pallas-GMG repro PASSES at exact 4097 shapes,
        so the trigger is in what the full program adds (outer while nesting
        / AL band planes / hierarchy depth), not the lattice extents."""
        mode = os.environ.get("FDAL_LAT_PAD", "0")
        if mode != "1":
            return None
        ny, nx = tuple(reversed(sp.n_points_1d))
        py = -(-ny // 8) * 8
        px = -(-nx // 128) * 128
        return None if (py, px) == (ny, nx) else (py, px)

    def _fused_masked_k_lat(self, sp, dtype=None, phys=None):
        """LATTICE-RESIDENT single-pass constrained stiffness apply
        ``x2 -> m*K(m*x2) + (1-m)*x2`` on lattice (ny, nx) arrays (Pallas
        kernel ops.pallas_kernels.masked_laplace_2d; XLA fallback off-TPU).
        ``phys`` runs it on lane-aligned zero-padded (py, px) arrays (the
        padded-lattice mode, see :meth:`_lat_phys`).  None when not
        applicable (non-lattice space, partial Dirichlet sides, fine solve
        below FUSED_MIN_FINE_POINTS on TPU, or disabled for the SPMD-sharded
        program where a custom kernel would block GSPMD partitioning)."""
        if not getattr(self, "_fused_enabled", True):
            return None
        if not self._is_lattice(sp) or sp.grid.dim != 2:
            return None
        if set(self.cfg.dirichlet_ids) != {0, 1, 2, 3}:
            return None
        import jax as _jax

        if _jax.default_backend() == "tpu" and self._is_lattice(self.space) \
                and max(self.space.n_points_1d) < self.FUSED_MIN_FINE_POINTS:
            return None
        from ..ops.pallas_kernels import masked_laplace_2d
        from ..parallel.lattice import LatticeOps

        lat = LatticeOps.for_space(sp)
        return masked_laplace_2d(lat.h, lat.shape, dtype=dtype, phys=phys)

    def _fused_masked_k(self, sp, dtype=None):
        """Flat-vector wrapper of :meth:`_fused_masked_k_lat` (one
        flat<->lattice relayout per apply — the lattice-mode inner solve
        avoids it by staying in lattice shape)."""
        f2 = self._fused_masked_k_lat(sp, dtype=dtype)
        if f2 is None:
            return None
        from ..parallel.lattice import flat_to_lattice, to_flat

        shape = sp.n_points_1d

        def mv(x):
            return to_flat(f2(flat_to_lattice(x, shape)))

        return mv

    def _fused_aug_mv(self, sp, coupling, gamma, dtype=None):
        """Fully-fused constrained augmented apply on flat dof vectors:
        ONE Pallas stencil pass for m*K(m*x)+(1-m)*x composed IN LATTICE SPACE
        with the Γ-band AL patch added in place (region form of the particle
        term, Dirichlet masking baked into the patch weights) — no
        full-lattice zeros/update/mask passes.  Returns (mv, al_diag) or None.
        """
        if getattr(self, "_fused_enabled", True) is False:
            return None
        if not self._is_lattice(sp) or sp.grid.dim != 2:
            return None
        if set(self.cfg.dirichlet_ids) != {0, 1, 2, 3}:
            return None
        free_np = np.asarray(
            self.free if sp is self.space
            else ~sp.boundary_dof_mask(list(self.cfg.dirichlet_ids)))
        region = coupling.patch_stencil_region(sp, gamma, free=free_np)
        if region is None:
            return None
        from ..ops.pallas_kernels import masked_laplace_2d
        from ..parallel.lattice import LatticeOps, flat_to_lattice

        lat = LatticeOps.for_space(sp)
        f2 = masked_laplace_2d(lat.h, lat.shape, dtype=dtype)
        (r0, c0, pr, pc), region_mv, al_diag = region
        shape = sp.n_points_1d

        def mv(x):
            x2 = flat_to_lattice(x, shape)
            out2 = f2(x2)
            out2 = out2.at[r0:r0 + pr, c0:c0 + pc].add(
                region_mv(x2).astype(out2.dtype))
            return out2.reshape(-1)

        return mv, al_diag

    def _fused_kernel_ctx(self, sp, coupling, gamma):
        """Shared gates + Γ-band plane construction for the fused Pallas
        kernels (Chebyshev smoothers and the mode="op" augmented apply).
        Returns ``(factors, (ny, nx), planes, (r0, c0, pr, pc))`` or None
        when the fused path is not applicable for ``sp``."""
        if not getattr(self, "_fused_enabled", True):
            return None
        if os.environ.get("FDAL_DISABLE_FUSED_CHEB") == "1":
            return None
        if not self._is_lattice(sp) or sp.grid.dim != 2:
            return None
        if set(self.cfg.dirichlet_ids) != {0, 1, 2, 3}:
            return None
        import jax as _jax

        if _jax.default_backend() != "tpu":
            return None
        if max(self.space.n_points_1d) < self.FUSED_MIN_FINE_POINTS:
            return None
        if (os.environ.get("FDAL_FUSED_CHEB_SKIP_FINE") == "1"
                and sp is self.space):
            return None
        from ..ops.pallas_kernels import stencil_factors_2d
        from ..parallel.lattice import LatticeOps

        lat = LatticeOps.for_space(sp)
        ny, nx = int(lat.shape[0]), int(lat.shape[1])
        if coupling is not None:
            pw = coupling.patch_w9(sp, gamma)
            if pw is None:
                return None
            (r0, c0, pr, pc), w9 = pw
            # symmetric 5-plane compression (center + 4 positive offsets);
            # the mirrored offsets are shifted reads of the same planes
            # in-kernel
            planes = np.zeros((5, ny, nx), dtype=np.float32)
            for k, (a, b) in enumerate(((1, 1), (1, 2), (2, 1), (2, 2),
                                        (2, 0))):
                planes[k, r0:r0 + pr, c0:c0 + pc] = w9[a, b]
        else:
            # plain (unaugmented) stiffness smoother: no Γ-band patch
            planes, (r0, c0, pr, pc) = None, (0, 0, 0, 0)
        return stencil_factors_2d(lat.h), (ny, nx), planes, (r0, c0, pr, pc)

    def _fused_aug_lat(self, sp, coupling, gamma, dtype=None, phys=None):
        """Single-pass Pallas apply of the MASKED AUGMENTED operator on
        lattice arrays: ``x2 -> m*(K + γ CᵀW⁻¹C)(m*x2) + (1-m)*x2`` — the
        constrained stiffness stencil and the Γ-band AL planes in ONE kernel
        (ops.pallas_kernels.fused_chebyshev_2d mode="op").

        This is the fine/level operator form that keeps lattice residency
        legal above LAT_MAX_FINE: the XLA patch-slice AL apply faults the
        v5e runtime when composed into the CG while_loop at those sizes
        (trigger T1, see LAT_MAX_FINE), while this single-output kernel
        composition is validated on hardware at exact 4097 shapes.  It is
        also strictly less HBM traffic than stencil-kernel + XLA patch (one
        read/write of the field instead of two plus patch intermediates).
        Returns ``apply(x2) -> (ny, nx)`` or None when not applicable."""
        ctx = self._fused_kernel_ctx(sp, coupling, gamma)
        if ctx is None or ctx[2] is None:
            return None
        factors, (ny, nx), planes, box = ctx
        from ..ops.pallas_kernels import fused_chebyshev_2d

        return fused_chebyshev_2d(factors, (ny, nx), planes, box, 1.0,
                                  dtype=dtype, mode="op", phys=phys)

    def _fused_cheb_builder(self, sp, coupling, gamma, dtype=None,
                            flat: bool = True, phys=None):
        """Builder for the fully-fused degree-k Chebyshev GMG smoother
        (ops.pallas_kernels.fused_chebyshev_2d): the whole sweep — k masked
        stencil applies + k Γ-band AL patch applies + the polynomial
        recurrence — in ONE Pallas pass per application of the smoother.
        Returns ``builder(lam, degree, eig_ratio) -> apply or None`` for
        gmg.build_gmg's 4th op_factory slot, or None when not applicable.
        With ``flat=False`` the returned applies consume/produce lattice
        (ny, nx) arrays directly (the lattice-mode GMG; no relayouts)."""
        assert phys is None or not flat, \
            "padded-lattice smoothers are lattice-resident only"
        ctx = self._fused_kernel_ctx(sp, coupling, gamma)
        if ctx is None:
            return None
        factors, (ny, nx), planes, (r0, c0, pr, pc) = ctx
        from ..ops.pallas_kernels import fused_chebyshev_2d
        from ..parallel.lattice import flat_to_lattice, to_flat

        shape_dof = sp.n_points_1d

        def builder(lam, degree, eig_ratio):
            from ..precond.gmg import FusedSmoother

            def mk(mode):
                return fused_chebyshev_2d(
                    factors, (ny, nx), planes, (r0, c0, pr, pc), float(lam),
                    degree=degree, eig_ratio=eig_ratio, dtype=dtype,
                    mode=mode, phys=phys)

            ap2 = mk("smooth")
            if ap2 is None:
                return None

            if flat:
                def apply(b):
                    return to_flat(ap2(flat_to_lattice(b, shape_dof)))
            else:
                apply = ap2

            pre = post = None
            # pre/post fuse the V-cycle's residual / coarse-correction
            # stages into the sweep (one halo row of validity each; both
            # match the composed form in interpret mode,
            # tests/test_fused_cheb.py).  Status on the v5e runtime after
            # the round-3 triage (the round-2 "hangs/faults" were two
            # separate defects):
            #   - the standalone hang was DMA-pipeline pressure from 22
            #     per-step input refs; fixed by column-stacking the 5 patch
            #     planes into one array (3 plane DMAs per step).  All three
            #     modes now run standalone at fine 1025/2049/4097.
            #   - "pre" composes cleanly into the FULL solve (validated at
            #     refs 10 and 12, iteration parity 4=4) — ON by default.
            #   - "post" still faults the runtime in one specific program
            #     shape: a coupling scatter-add placed AFTER a post-bearing
            #     CG while_loop in the same jit (minimal repro:
            #     aug_inv(u0) + Ct(lam) faults; aug_inv(u0 - Ct(lam))
            #     passes; an optimization_barrier does not help, so it is
            #     a runtime memory-assignment defect, not scheduling) —
            #     opt-in via FDAL_FUSED_CHEB_PREPOST=1.
            # pre is a TWO-OUTPUT kernel — fault trigger T2 above the
            # LAT_MAX_FINE gate (see there); disabled in the big regime
            if (os.environ.get("FDAL_FUSED_CHEB_PRE", "1") == "1"
                    and not self._lat_big()):
                pre2 = mk("pre")
                if pre2 is not None:
                    if flat:
                        def pre(b):
                            x2, r2 = pre2(flat_to_lattice(b, shape_dof))
                            return to_flat(x2), to_flat(r2)
                    else:
                        def pre(b):
                            return tuple(pre2(b))
            # post (single-output) is ON BY DEFAULT in the big regime: the
            # restricted composition (op kernel, no pre, no XLA patch)
            # composes cleanly with it on the v5e (ref 12: 0.364 -> 0.338 s,
            # iteration parity 4 = 4).  BELOW the gate it still faults —
            # post-only faults too, so the round-3 defect involves the XLA
            # patch + post interaction, not pre+post — and stays opt-in.
            post_default = "1" if self._lat_big() else "0"
            if os.environ.get("FDAL_FUSED_CHEB_PREPOST",
                              post_default) == "1":
                post2 = mk("post")
                if post2 is not None:
                    if flat:
                        def post(b, x0):
                            return to_flat(post2(
                                flat_to_lattice(b, shape_dof),
                                flat_to_lattice(x0, shape_dof)))
                    else:
                        post = post2
            return FusedSmoother(apply, pre, post)

        return builder

    def _masked_wrap(self, sp, apply):
        """m * apply(m * x) with the Dirichlet mask of ``sp`` — makes the AL
        term consistent with the fused masked stiffness (the wheres fuse into
        the neighboring ops in XLA)."""
        m = self.free if sp is self.space else jnp.asarray(
            ~sp.boundary_dof_mask(list(self.cfg.dirichlet_ids)))

        def mv(x):
            return jnp.where(m, apply(jnp.where(m, x, 0.0)), 0.0)

        return mv

    def _factory_k(self, sp):
        K = self.K if sp is self.space else laplace_matrix(
            sp, order=self.cfg.embedding_space_degree + 1)
        fused = self._fused_masked_k(sp)
        if fused is not None:
            return self._k_apply(sp, K), self._k_diag(sp, K), fused
        return self._k_apply(sp, K), self._k_diag(sp, K)

    def _c_linops(self):
        C_lin = LinOp(self.C.mv, self.C.shape, self.C.rmv, name="C")
        return C_lin, C_lin.T

    # -- solve branches -----------------------------------------------------

    def solve(self):
        """Build (once) and execute the jitted end-to-end solver for the
        configured mode.  The whole preconditioned Krylov solve — outer loop,
        inner CG, GMG cycles — compiles to a single XLA computation; repeat
        calls hit the jit cache."""
        if not hasattr(self, "_solvers"):
            self._solvers = {}
        key = self.cfg.solver
        if key not in self._solvers:
            with self.timer.scope("Build solver"):
                builder = {
                    "CG": self._build_schur_cg,
                    "ELMAN_triang": self._build_elman,
                    "rational": self._build_rational,
                    "augmented": self._build_augmented,
                }[key]
                self._solvers[key] = builder()
        with self.timer.scope("Solve system"):
            u, lam, info = self._solvers[key](self.rhs_f, self.rhs_g,
                                              self.bc_values)
            u = jax.block_until_ready(u)
        self._finalize(u, lam, info)
        self.results.update(
            dofs_background=self.space.n_dofs,
            dofs_immersed=self.imm_space.n_dofs,
        )
        return u, lam, info

    def _build_schur_cg(self):
        """Exact-Schur CG (immersed_laplace.cc:507-525)."""
        cfg = self.cfg
        K_c, K_inv = self._kg_inv()
        C_lin, Ct_lin = self._c_linops()
        K_lin = self.K.as_linop()
        free = self.free

        def run(rhs_f, rhs_g, bc_values):
            b0 = dirichlet_rhs(K_lin, rhs_f, free, bc_values)

            def S(lam):
                return C_lin(K_inv(Ct_lin(lam)))

            rhs = C_lin(K_inv(b0)) - rhs_g
            lam, info = cg(S, rhs, tol=cfg.schur.tolerance,
                           reduction=cfg.schur.reduction,
                           max_steps=cfg.schur.max_steps)
            u = K_inv(b0 - Ct_lin(lam))
            u = jnp.where(free, u, bc_values)
            return u, lam, info

        return self._jit_solver(run)

    def _build_elman(self):
        """Elman BFBt block-triangular GMRES (immersed_laplace.cc:526-584)."""
        cfg = self.cfg
        K_c, K_inv = self._kg_inv()
        C_lin, Ct_lin = self._c_linops()
        K_lin = self.K.as_linop()
        layout = self.layout
        free = self.free

        def CCt(lam):
            return C_lin(Ct_lin(lam))

        def CCt_inv(v):
            x, _ = cg(CCt, v, tol=1e-12, max_steps=40, fixed_iters=True)
            return x

        def S_inv(v):
            return CCt_inv(C_lin(K_c(Ct_lin(CCt_inv(v)))))

        def prec(x):
            x0, x1 = layout.split(x)
            s = S_inv(x1)
            return layout.concat((K_inv(x0) + K_inv(Ct_lin(s)), -s))

        AA = block_operator(layout, layout, [[K_c, Ct_lin], [C_lin, None]])

        def run(rhs_f, rhs_g, bc_values):
            b0 = dirichlet_rhs(K_lin, rhs_f, free, bc_values)
            b = layout.concat((b0, rhs_g))
            x, info = gmres(AA, b, prec, tol=cfg.schur.tolerance,
                            reduction=cfg.schur.reduction,
                            max_steps=cfg.schur.max_steps,
                            restart=cfg.fgmres_restart)
            u, lam = layout.split(x)
            u = jnp.where(free, u, bc_values)
            return u, lam, info

        return self._jit_solver(run)

    def _build_rational(self):
        """MinRes + rational preconditioner diag(K⁻¹, (−Δ_Γ)^{-1/2})
        (immersed_laplace.cc:585-635, rational_preconditioner.h).

        In f32 (the TPU solve precision) the outer is FGMRES instead of
        MinRes: the preconditioner's inner solves (tight K GMG-CG + 17
        shifted pole CGs) stop on tolerances, so in single precision the
        preconditioner varies visibly between outer iterations and MinRes —
        which assumes a FIXED SPD preconditioner — stagnates (measured at
        ref 5: 1000 iterations, residual stuck 20x above the 3e-5 stop;
        flexible FGMRES converges in 22).  The f64 path keeps MinRes and the
        reference-parity golden counts (tests/test_baseline_tables.py)."""
        from ..precond.rational import rational_preconditioner

        cfg = self.cfg
        K_c, K_inv = self._kg_inv()
        C_lin, Ct_lin = self._c_linops()
        K_lin = self.K.as_linop()
        layout = self.layout
        free = self.free
        # rho bound: linfty norm of A_imm over min diag of M (lines 609-614)
        A_dense_norm = self._imm_linfty_norm(self.A_imm)
        rho_bound = A_dense_norm / float(self.M.diag().min())
        prec = rational_preconditioner(layout, K_inv, self.A_imm, self.M,
                                       rho_bound)
        AA = block_operator(layout, layout, [[K_c, Ct_lin], [C_lin, None]])
        f32 = jnp.zeros(0).dtype == jnp.float32
        # restart truncation stalls the f32 rational FGMRES near its
        # precision floor (measured ref 8: 244 iterations at restart 50 vs
        # 42 at 200); keep a generous basis within a ~2 GB memory budget,
        # but ALSO hard-cap by memory so huge layouts can't blow past it
        # (FGMRES stores both the V and Z bases: ~8 bytes/dof per vector)
        budget = min(200, int(2e9 / (4 * max(layout.total, 1))))
        hard_cap = max(8, int(6e9 / (8 * max(layout.total, 1))))
        restart = min(max(cfg.fgmres_restart, budget), hard_cap)

        def run(rhs_f, rhs_g, bc_values):
            b0 = dirichlet_rhs(K_lin, rhs_f, free, bc_values)
            b = layout.concat((b0, rhs_g))
            if f32:
                x, info = fgmres(AA, b, prec, tol=cfg.schur.tolerance,
                                 reduction=cfg.schur.reduction,
                                 max_steps=cfg.schur.max_steps,
                                 restart=restart)
            else:
                x, info = minres(AA, b, prec, tol=cfg.schur.tolerance,
                                 reduction=cfg.schur.reduction,
                                 max_steps=cfg.schur.max_steps)
            u, lam = layout.split(x)
            u = jnp.where(free, u, bc_values)
            return u, lam, info

        return self._jit_solver(run)

    @staticmethod
    def _imm_linfty_norm(A) -> float:
        rows, _, vals = A.to_coo()
        sums = np.zeros(A.shape[0])
        np.add.at(sums, rows, np.abs(vals))
        return float(sums.max())

    def _jit_solver(self, run):
        """jit a solver with its large closed-over constants (Γ-band stencil
        weights, GMG diagonals/masks, Dirichlet masks) hoisted to runtime
        arguments — the compile payload stays a few KB at the reference's
        16.8M-dof row (tables/results.md:19) instead of shipping hundreds of
        MB of baked constants to the compiler."""
        from ..utils.hoist import jit_hoisted

        ex = tuple(jax.ShapeDtypeStruct(a.shape, a.dtype)
                   for a in (self.rhs_f, self.rhs_g, self.bc_values))
        return jit_hoisted(run, ex)

    def _build_augmented(self):
        """FGMRES + AL preconditioner (immersed_laplace.cc:636-944)."""
        return self._jit_solver(self._augmented_run())

    def build_sharded_solver(self, mesh):
        """The flagship augmented solve jitted under SPMD over ``mesh``
        (a ``jax.sharding.Mesh``): background dof vectors block-partitioned
        over every mesh device, immersed-side vectors replicated — the
        TPU-native form of the reference's (latent) MPI decomposition
        (SURVEY §5 'Distributed communication backend'; utilities.h:755-837).

        The SAME program as the serial ``solver='augmented'`` path — outer
        FGMRES, AL preconditioner, inner CG, full GMG hierarchy — with
        lattice stencils lowering to ICI halo exchanges under GSPMD.
        Returns ``run(rhs_f, rhs_g, bc_values) -> (u, lam, info)``.
        """
        from jax.sharding import NamedSharding, PartitionSpec as P

        self._fused_enabled = False  # GSPMD cannot partition a custom kernel;
        try:                         # the sharded program uses XLA stencils
            run = self._augmented_run()
        finally:
            self._fused_enabled = True
        axes = tuple(mesh.axis_names)
        vec = NamedSharding(mesh, P(axes))   # background dof vector: blocked
        rep = NamedSharding(mesh, P())       # immersed side: replicated

        # constraints go INSIDE the program (not jit in_shardings): the
        # lattice has (2^r + 1)^2 dofs — never divisible by the device count —
        # and GSPMD handles uneven block sharding with internal padding
        def sharded_run(rhs_f, rhs_g, bc_values):
            rhs_f = jax.lax.with_sharding_constraint(rhs_f, vec)
            rhs_g = jax.lax.with_sharding_constraint(rhs_g, rep)
            bc_values = jax.lax.with_sharding_constraint(bc_values, vec)
            u, lam, info = run(rhs_f, rhs_g, bc_values)
            return (jax.lax.with_sharding_constraint(u, vec),
                    jax.lax.with_sharding_constraint(lam, rep), info)

        # hoisted like the serial path: the Γ-band weights / GMG diagonals /
        # masks become runtime arguments instead of baked jaxpr constants, so
        # the sharded program's compile payload stays KB-sized at 16M+ dofs
        # (VERDICT r2 weak #7); GSPMD reshards the parked constants on entry
        return self._jit_solver(sharded_run)

    def build_correction_solver(self):
        """jit of ``(b0, b1) -> (du, dlam, info)``: one AL-preconditioned
        FGMRES solve of the augmented system with a RAW right-hand side —
        the inner engine of :meth:`solve_refined`."""
        from ..utils.hoist import jit_hoisted
        from ..utils.refine import capped_max_steps

        dt = self.rhs_f.dtype
        ex = (jax.ShapeDtypeStruct((self.space.n_dofs,), dt),
              jax.ShapeDtypeStruct((self.imm_space.n_dofs,), dt))
        with capped_max_steps(self.cfg.schur):
            # one short device program per refinement step (watchdog-safe);
            # guarded_refinement restarts from the host — see utils.refine.
            # The cap must span jit_hoisted: max_steps is read at TRACE time.
            run = self._augmented_run(raw_rhs=True)
            return jit_hoisted(run, ex)

    def solve_refined(self, tol_abs: float = 1e-10, max_refine: int = 12):
        """Mixed-precision iterative refinement to REFERENCE solve quality on
        TPU: the f32 jitted AL-preconditioned FGMRES produces corrections on
        device; the TRUE residual of the augmented system is evaluated in f64
        on the host (ops.host_ref) and the loop runs until it reaches
        ``tol_abs`` — the reference configs' 1e-10 'Schur solver control
        Tolerance' (parameters/circle/*.prm), which plain f32 cannot reach.

        Returns ``(u, lam, history)`` with f64 iterates and the per-step true
        residual norms; ``self.results`` records total outer iterations.
        Divergence-guarded: see utils.refine.guarded_refinement.  The host
        reference and correction solver are cached per ``setup()``; any
        mutation of rhs/bc/γ state must go through ``setup()`` (or reset
        ``_refine_cache``) to take effect here."""
        from ..ops.host_ref import HostAugmentedSystem
        from ..utils.refine import guarded_refinement

        # memoized per setup(): a second solve_refined on the same
        # problem re-runs the CACHED executable (table timing runs
        # warm-up + timed pass, like the plain-solve rows)
        if getattr(self, '_refine_cache', None) is None:
            self._refine_cache = (HostAugmentedSystem(self),
                                  self.build_correction_solver())
        host, corr = self._refine_cache
        dt = self.rhs_f.dtype

        def correct(rs):
            du, dlam, info = corr(*(jnp.asarray(r.astype(dt)) for r in rs))
            return ([np.asarray(du, dtype=np.float64),
                     np.asarray(dlam, dtype=np.float64)],
                    int(info.iterations))

        (u, lam), history, total_iters, converged = guarded_refinement(
            host.residual, correct,
            (self.space.n_dofs, self.imm_space.n_dofs), tol_abs, max_refine)
        self.u, self.lam = jnp.asarray(u, dtype=dt), jnp.asarray(lam, dtype=dt)
        self.results.update(outer_iterations=total_iters,
                            refined_residual=history[-1],
                            refine_steps=len(history) - 1,
                            converged=converged)
        return u, lam, history

    def _augmented_run(self, raw_rhs: bool = False):
        """Un-jitted flagship solve (shared by the serial and sharded jits).
        With ``raw_rhs`` the returned function takes the assembled block
        right-hand side ``(b0, b1)`` directly (no Dirichlet lifting / AL rhs
        augmentation) — used for iterative-refinement correction solves."""
        cfg = self.cfg
        C_lin, Ct_lin = self._c_linops()
        layout = self.layout
        k_mv = self._k_apply(self.space, self.K)
        K_lin = LinOp(k_mv, self.K.shape, k_mv)  # symmetric
        free = self.free

        if cfg.use_operator_form:
            # gamma scaled by 1/h_Gamma; AL term = particle mass on Gamma.
            # On uniform Q1 lattices it materializes as a 9-point
            # variable-coefficient patch stencil (no gather/scatter); compact
            # dense block otherwise.
            gamma = cfg.gamma / self.curve.h_max

            def particle_coupling(sp):
                return build_coupling(sp, self.imm_space,
                                      order=2 * cfg.embedding_space_degree + 1)

            def particle_al(sp, Cp=None):
                Cp = Cp or particle_coupling(sp)
                st = Cp.patch_stencil_al(sp, gamma)
                return st if st is not None else Cp.compact_al(gamma)

            Cp_fine = particle_coupling(self.space)
            AL, al_diag_fine = particle_al(self.space, Cp_fine)
            inv_w = (inv_diag(self.M) if cfg.use_diagonal_inverse
                     else inv_exact(self.M))

            _coupling_cache = {}

            def coupling_for(sp):
                if sp is self.space:
                    return Cp_fine
                key = id(sp)
                if key not in _coupling_cache:
                    _coupling_cache[key] = particle_coupling(sp)
                return _coupling_cache[key]

            def al_factory(sp):
                if sp is self.space:
                    return AL, al_diag_fine
                return particle_al(sp, coupling_for(sp))

            def cheb_builder(sp):
                return self._fused_cheb_builder(sp, coupling_for(sp), gamma,
                                                dtype=gmg_dt)

            def fused_aug(sp, dtype=None):
                # The region composition (_fused_aug_mv: Pallas stencil +
                # .at[patch].add) ABORTS the v5e runtime when the
                # dynamic-update-slice consumes the pallas_call output inside
                # the solve loops (reproduced at refs 10-12; the masked-wrap
                # composition below measures the same 1.10s at 16.8M dofs, so
                # nothing is lost).  Keep the region API for the masked
                # weights; do not feed pallas outputs through DUS.
                return None
        else:
            gamma = cfg.gamma
            w_diag = 1.0 / np.asarray(self.M.diag()) ** 2
            inv_w = (inv_diag_squared(self.M) if cfg.use_diagonal_inverse
                     else inv_squared_exact(self.M))
            if cfg.use_diagonal_inverse:
                # W = diag(M)^2 is diagonal: the compact dense AL block is
                # exact for the outer operator as well
                AL, al_diag_fine = self.C.compact_al(gamma, w_diag)
            else:
                # exact (non-diagonal) W^{-1}: keep the operator form for the
                # outer system; the GMG below uses the diagonal surrogate
                # (mirroring the reference, whose AMG is built on the
                # diag-weighted explicit matrix, immersed_laplace.cc:711-715)
                AL = self.C.al_term(inv_w, gamma)
                al_diag_fine = self.C.al_term_diag(w_diag, gamma)

            def al_factory(sp):
                if sp is self.space and cfg.use_diagonal_inverse:
                    return AL, al_diag_fine
                Cl = self.C if sp is self.space else build_coupling(
                    sp, self.imm_space, cfg.coupling_quadrature_order)
                return Cl.compact_al(gamma, w_diag)

            def fused_aug(sp, dtype=None):
                return None  # explicit-form AL has no patch-region form

            def cheb_builder(sp):
                return None  # (no patch planes in explicit form)

        gmg_dt = jnp.bfloat16 if cfg.use_bf16_multigrid else None

        # --- lattice-resident inner solve --------------------------------
        # On TPU the reshape between a flat dof vector and the (ny, nx)
        # lattice is a REAL relayout (nx = 2^r + 1 is never lane-aligned):
        # measured 0.45 ms per round trip at 4097² — chaining the stencil
        # kernel on a 2D carry runs 308 GB/s vs 101 GB/s on a flat carry.
        # When the fused lattice kernels are active, the inner CG + the
        # whole GMG hierarchy therefore run ON LATTICE ARRAYS; the flat
        # boundary is crossed once per aug_inv call (outer FGMRES stays on
        # flat block vectors — a handful of applies per solve).
        lat_mode = False
        aug_k_fine = None
        if cfg.use_operator_form and self._lat_mode_ok():
            phys_fine = self._lat_phys(self.space)
            f2_fine = self._fused_masked_k_lat(self.space, phys=phys_fine)
            al_fine_lat = Cp_fine.patch_al_lattice(
                self.space, gamma, free=np.asarray(self.free),
                phys=phys_fine)
            if self._lat_big() and not cfg.use_bf16_multigrid:
                # restricted composition (see LAT_MAX_FINE): the augmented
                # apply must be the single-pass mode="op" kernel — the XLA
                # patch AL form is fault trigger T1 at this scale.  (bf16
                # GMG is excluded: the fused kernels are f32-only, so its
                # fine level would fall back to the XLA patch.)
                aug_k_fine = self._fused_aug_lat(self.space, Cp_fine, gamma,
                                                 phys=phys_fine)
            lat_mode = (al_fine_lat is not None
                        and (not self._lat_big() or aug_k_fine is not None))

        al_apply_fine = AL.mv if hasattr(AL, "mv") else AL
        if lat_mode:
            from ..parallel.lattice import flat_to_lattice, to_flat

            shape_fine = self.space.n_points_1d
            lat_fine = tuple(reversed(shape_fine))
            al_mv2_fine = al_fine_lat[0]

            def _padf(x2):
                """Logical (ny, nx) -> physical (py, px) (padded mode)."""
                if phys_fine is None:
                    return x2
                return jnp.pad(x2, ((0, phys_fine[0] - lat_fine[0]),
                                    (0, phys_fine[1] - lat_fine[1])))

            def _unpadf(x2):
                if phys_fine is None:
                    return x2
                return x2[:lat_fine[0], :lat_fine[1]]

            if aug_k_fine is not None:
                aug_mv_lat = aug_k_fine
            else:
                def aug_mv_lat(x2):
                    return f2_fine(x2) + al_mv2_fine(x2)

            def aug_mv(x):
                return to_flat(_unpadf(aug_mv_lat(_padf(
                    flat_to_lattice(x, shape_fine)))))

            n = self.space.n_dofs
            Aug = LinOp(aug_mv, (n, n), aug_mv, name="Aug")
        else:
            fused_pair = fused_aug(self.space)
            if fused_pair is not None:
                # ONE Pallas pass + in-place patch add: identical semantics
                # to constrain(K + AL, free)
                aug_mv = fused_pair[0]
                n = self.space.n_dofs
                Aug = LinOp(aug_mv, (n, n), aug_mv, name="Aug")
            else:
                fused_fine = self._fused_masked_k(self.space)
                if fused_fine is not None:
                    al_m = self._masked_wrap(self.space, al_apply_fine)

                    def aug_mv(x):
                        return fused_fine(x) + al_m(x)

                    n = self.space.n_dofs
                    Aug = LinOp(aug_mv, (n, n), aug_mv, name="Aug")
                else:
                    Aug_raw = K_lin + LinOp(*_unpack((AL, None),
                                                     self.space.n_dofs))
                    Aug = constrain(Aug_raw, self.free)

        def aug_op_factory(sp):
            K_l = self.K if sp is self.space else laplace_matrix(
                sp, order=cfg.embedding_space_degree + 1)
            k_apply = self._k_apply(sp, K_l)
            al_mv, al_diag = al_factory(sp)
            al_apply = al_mv.mv if hasattr(al_mv, "mv") else al_mv

            def mv(x):
                return k_apply(x) + al_apply(x)

            diag = self._k_diag(sp, K_l) + al_diag
            fp = fused_aug(sp, dtype=gmg_dt)
            if fp is not None:
                return mv, diag, fp[0]
            fused_k = self._fused_masked_k(sp, dtype=gmg_dt)
            if fused_k is not None:
                al_m_l = self._masked_wrap(sp, al_apply)

                def fused_mv(x, fused_k=fused_k, al_m_l=al_m_l):
                    return fused_k(x) + al_m_l(x)

                return mv, diag, fused_mv, cheb_builder(sp)
            return mv, diag

        def aug_op_factory_lat(sp):
            """Lattice-resident level ops for build_gmg(lattice=True): every
            apply consumes/produces lattice (ny, nx) arrays — physically
            padded to _lat_phys(sp) in the padded-lattice mode."""
            K_l = self.K if sp is self.space else laplace_matrix(
                sp, order=cfg.embedding_space_degree + 1)
            phys_l = self._lat_phys(sp)
            f2l = self._fused_masked_k_lat(sp, dtype=gmg_dt, phys=phys_l)
            assert f2l is not None  # lat_mode gates are whole-solver
            free_l = (np.asarray(self.free) if sp is self.space
                      else ~sp.boundary_dof_mask(list(cfg.dirichlet_ids)))
            al = coupling_for(sp).patch_al_lattice(sp, gamma, free=free_l,
                                                   phys=phys_l)
            lat_shape = tuple(reversed(sp.n_points_1d))
            if al is not None:
                al_mv2, al_diag = al
            else:
                # Γ-band not interior at this (coarse) lattice: flat AL with
                # reshape boundary — the level is small, relayouts are cheap
                al_flat, al_diag = al_factory(sp)
                al_apply = al_flat.mv if hasattr(al_flat, "mv") else al_flat
                al_m = self._masked_wrap(sp, al_apply)

                def al_mv2(x2, al_m=al_m, lat_shape=lat_shape,
                           phys_l=phys_l):
                    xl = (x2 if phys_l is None
                          else x2[:lat_shape[0], :lat_shape[1]])
                    out = al_m(xl.reshape(-1)).reshape(lat_shape)
                    if phys_l is not None:
                        out = jnp.pad(out,
                                      ((0, phys_l[0] - lat_shape[0]),
                                       (0, phys_l[1] - lat_shape[1])))
                    return out

            aug_k = (self._fused_aug_lat(sp, coupling_for(sp), gamma,
                                         dtype=gmg_dt, phys=phys_l)
                     if self._lat_big() else None)
            if aug_k is not None:
                mv = aug_k   # single-pass kernel (big regime, see above);
                # kernel-gated levels (< FUSED_CHEB_MIN_ROWS) fall through
                # to the XLA form below — their patch extents are far under
                # the ≳1024-row fault threshold
            else:
                def mv(x2, f2l=f2l, al_mv2=al_mv2):
                    return f2l(x2) + al_mv2(x2)

            diag = self._k_diag(sp, K_l) + al_diag
            cb = self._fused_cheb_builder(sp, coupling_for(sp), gamma,
                                          dtype=gmg_dt, flat=False,
                                          phys=phys_l)
            return mv, diag, mv, cb

        gmg = build_gmg(self.space,
                        aug_op_factory_lat if lat_mode else aug_op_factory,
                        free_mask=self.free,
                        smoother_degree=cfg.gmg_smoother_degree,
                        dtype=jnp.bfloat16 if cfg.use_bf16_multigrid else None,
                        lattice=lat_mode,
                        lattice_phys=self._lat_phys if lat_mode else None)
        self._last_gmg = gmg  # exposed for diagnostics (tests, kernel triage)

        if lat_mode:
            def aug_inv(v):
                # the flat<->lattice boundary (a relayout; plus the pad in
                # padded mode) is crossed ONCE per aug_inv, not per apply
                v2 = _padf(flat_to_lattice(v, shape_fine))
                x2, _ = cg(aug_mv_lat, v2, M=gmg.apply,
                           tol=cfg.inner_tolerance,
                           max_steps=cfg.inner_max_steps)
                return to_flat(_unpadf(x2))
        else:
            def aug_inv(v):
                x, _ = cg(Aug, v, M=gmg.apply, tol=cfg.inner_tolerance,
                          max_steps=cfg.inner_max_steps)
                return x

        AA = block_operator(layout, layout, [[Aug, Ct_lin], [C_lin, None]])
        prec = al_preconditioner(layout, aug_inv, Ct_lin, inv_w, gamma)

        # FGMRES stores BOTH the V and Z bases (2 x restart x n x 4 bytes);
        # cap the restart so they fit a ~6 GB budget on huge layouts (67.1M
        # dofs at the configured 50 would need 25 GB > the v5e's 16 GB HBM).
        # Floor of 12: the AL-preconditioned solve is h-independent at ~4
        # outer iterations, so truncation below the floor never engages.
        n_tot = layout.total
        restart = min(cfg.fgmres_restart,
                      max(12, int(6e9 / (8 * max(n_tot, 1)))))

        def solve_core(b):
            return fgmres(AA, b, prec, tol=cfg.schur.tolerance,
                          reduction=cfg.schur.reduction,
                          max_steps=cfg.schur.max_steps,
                          restart=restart)

        if raw_rhs:
            def run_raw(b0, b1):
                x, info = solve_core(layout.concat((b0, b1)))
                u, lam = layout.split(x)
                return u, lam, info

            return run_raw

        def run(rhs_f, rhs_g, bc_values):
            b0 = dirichlet_rhs(K_lin, rhs_f, free, bc_values)
            b0 = b0 + jnp.where(free, gamma * Ct_lin(inv_w(rhs_g)), 0.0)
            x, info = solve_core(layout.concat((b0, rhs_g)))
            u, lam = layout.split(x)
            u = jnp.where(free, u, bc_values)
            return u, lam, info

        return run

    def _finalize(self, u, lam, info):
        self.u = u
        self.lam = lam
        self.results["outer_iterations"] = int(info.iterations)
        self.results["residual"] = float(info.residual)
        self.results["converged"] = bool(info.converged)

    # -- diagnostics --------------------------------------------------------

    def constraint_residual(self) -> float:
        """||C u - (g, psi)||_inf: residual of the constraint block equation
        (the elliptic_interface.cc:973-984 sanity check, adapted)."""
        return float(jnp.max(jnp.abs(self.C.mv(self.u) - self.rhs_g)))

    def cct_condition_estimate(self, max_steps: int = 100) -> float:
        """cond(CCᵀ) via the CG condition-number slot
        (immersed_laplace.cc:987-1010)."""
        C_lin, Ct_lin = self._c_linops()
        rng = np.random.default_rng(0)
        b = jnp.asarray(rng.standard_normal(self.imm_space.n_dofs))
        _, info, (al, be) = cg(lambda v: C_lin(Ct_lin(v)), b, tol=1e-12,
                               max_steps=max_steps, track_tridiag=True)
        return cg_condition_number(al, be, info.iterations)

    def run(self):
        self.setup()
        self.solve()
        return self.results


def _unpack(pair, n):
    mv, _ = pair
    apply = mv.mv if hasattr(mv, "mv") else mv
    return apply, (n, n)
