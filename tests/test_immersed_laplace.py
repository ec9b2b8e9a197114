"""End-to-end tests for the immersed_laplace problem (all solver modes).

Manufactured case: the reference's Circle_parameters_smooth.prm —
f = 8π² sin(2πx) sin(2πy), g = sin(2πx) sin(2πy) on a circle Γ.  Since g is
the trace of the unconstrained solution, u = sin(2πx)sin(2πy) exactly and the
multiplier vanishes; L2 errors must converge at the FE rate and (for the AL
solver) outer FGMRES iteration counts must stay flat under refinement — the
paper's headline property.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from fictitious_domain_al_preconditioners_tpu.models import (
    ImmersedLaplaceConfig, ImmersedLaplaceProblem,
)
from fictitious_domain_al_preconditioners_tpu.ops.assembly import l2_error


def smooth_config(**kw) -> ImmersedLaplaceConfig:
    base = dict(
        initial_refinement=5,
        initial_embedded_refinement=5,
        embedded_configuration=("R*cos(2*pi*x)+Cx; R*sin(2*pi*x)+Cy",
                                "R=.2, Cx=.4, Cy=.4"),
        embedding_rhs=("8*pi^2*sin(2*pi*x)*sin(2*pi*y)", ""),
        embedded_value=("sin(2*pi*x)*sin(2*pi*y)", ""),
        dirichlet_boundary=("0", ""),
        solver="augmented",
    )
    base.update(kw)
    return ImmersedLaplaceConfig(**base)


def exact(p):
    return jnp.sin(2 * jnp.pi * p[:, 0]) * jnp.sin(2 * jnp.pi * p[:, 1])


class TestAugmented:
    def test_operator_form(self):
        prob = ImmersedLaplaceProblem(smooth_config(
            use_operator_form=True, use_diagonal_inverse=True))
        prob.setup()
        u, lam, info = prob.solve()
        assert prob.results["converged"]
        assert prob.results["outer_iterations"] < 60
        err = l2_error(prob.space, u, exact)
        assert err < 6e-3
        assert prob.constraint_residual() < 1e-6

    def test_explicit_form(self):
        prob = ImmersedLaplaceProblem(smooth_config(
            use_operator_form=False, use_diagonal_inverse=True))
        prob.setup()
        u, lam, info = prob.solve()
        assert prob.results["converged"]
        err = l2_error(prob.space, u, exact)
        assert err < 6e-3

    def test_exact_mass_inverse(self):
        prob = ImmersedLaplaceProblem(smooth_config(
            use_operator_form=False, use_diagonal_inverse=False))
        prob.setup()
        u, lam, info = prob.solve()
        assert prob.results["converged"]
        assert l2_error(prob.space, u, exact) < 6e-3

    def test_iteration_count_h_independence(self):
        """The headline property: outer FGMRES iterations flat in h."""
        iters = []
        for ref in (4, 5, 6):
            prob = ImmersedLaplaceProblem(smooth_config(
                initial_refinement=ref, initial_embedded_refinement=ref,
                use_operator_form=True, use_diagonal_inverse=True))
            prob.setup()
            prob.solve()
            assert prob.results["converged"]
            iters.append(prob.results["outer_iterations"])
        # flat: no growth beyond a small additive margin
        assert iters[2] <= iters[0] + 10, iters
        assert max(iters) < 60, iters

    def test_error_convergence(self):
        errs = []
        for ref in (4, 5, 6):
            prob = ImmersedLaplaceProblem(smooth_config(
                initial_refinement=ref, initial_embedded_refinement=ref,
                use_operator_form=True, use_diagonal_inverse=True))
            prob.setup()
            u, _, _ = prob.solve()
            errs.append(l2_error(prob.space, u, exact))
        rate = np.log2(errs[1] / errs[2])
        assert rate > 1.5, (errs, rate)


class TestOtherSolvers:
    def test_schur_cg(self):
        prob = ImmersedLaplaceProblem(smooth_config(solver="CG"))
        prob.setup()
        u, lam, info = prob.solve()
        assert prob.results["converged"]
        assert l2_error(prob.space, u, exact) < 6e-3

    def test_elman(self):
        prob = ImmersedLaplaceProblem(smooth_config(
            solver="ELMAN_triang",
            schur=__import__(
                "fictitious_domain_al_preconditioners_tpu.models.immersed_laplace",
                fromlist=["SolverControlConfig"]).SolverControlConfig(
                    max_steps=300, tolerance=1e-9, reduction=1e-9)))
        prob.setup()
        u, lam, info = prob.solve()
        assert prob.results["converged"]
        assert l2_error(prob.space, u, exact) < 6e-3

    def test_rational(self):
        prob = ImmersedLaplaceProblem(smooth_config(solver="rational"))
        prob.setup()
        u, lam, info = prob.solve()
        assert prob.results["converged"]
        assert l2_error(prob.space, u, exact) < 6e-3


class TestConfigFromPrm:
    def test_reference_prm_roundtrip(self):
        import os

        path = "/root/reference/parameters/circle/Circle_parameters_smooth.prm"
        if not os.path.exists(path):
            pytest.skip("reference not mounted")
        cfg = ImmersedLaplaceConfig.from_prm(path)
        assert cfg.solver == "augmented"
        assert cfg.initial_refinement == 9
        assert cfg.initial_embedded_refinement == 9
        assert cfg.coupling_quadrature_order == 3
        assert cfg.schur.tolerance == 1e-10
        assert "8*pi^2" in cfg.embedding_rhs[0]

    def test_small_run_from_prm_text(self):
        text = """
subsection Distributed Lagrange<1,2>
  set Coupling quadrature order                    = 3
  set Initial embedded space refinement            = 5
  set Initial embedding space refinement           = 5
  set Solver                                       = augmented
  subsection AL preconditioner
    set Use operator version = true
    set Use diagonal inverse = true
  end
  subsection Embedded configuration
    set Function constants  = R=.2, Cx=.4, Cy=.4
    set Function expression = R*cos(2*pi*x)+Cx; R*sin(2*pi*x)+Cy
    set Variable names      = x,y,t
  end
  subsection Embedded value
    set Function expression = 1
  end
  subsection Embedding rhs function
    set Function expression = 0
  end
  subsection Embedding Dirichlet boundary conditions
    set Function expression = 0
  end
  subsection Schur solver control
    set Max steps     = 1000
    set Tolerance     = 1.e-10
  end
end
"""
        cfg = ImmersedLaplaceConfig.from_prm(text)
        prob = ImmersedLaplaceProblem(cfg)
        res = prob.run()
        assert res["converged"]
        # u == 1 on Gamma; interior plateau near 1
        assert prob.constraint_residual() < 1e-6


class TestRefinedSolve:
    """Mixed-precision iterative refinement to reference tolerances: the
    host f64 reference apply (ops.host_ref) must reproduce the jitted
    operator exactly, and solve_refined must drive the TRUE residual to the
    reference's 1e-10..1e-12 'Schur solver control' targets (VERDICT r1
    item 8; parameters/circle/*.prm)."""

    def test_host_residual_matches_jitted(self):
        from fictitious_domain_al_preconditioners_tpu.models.immersed_laplace import (
            SolverControlConfig,
        )
        from fictitious_domain_al_preconditioners_tpu.ops.host_ref import (
            HostAugmentedSystem,
        )

        prob = ImmersedLaplaceProblem(smooth_config(
            use_operator_form=True, use_diagonal_inverse=True,
            schur=SolverControlConfig(max_steps=1000, tolerance=1e-12,
                                      reduction=1e-13)))
        prob.setup()
        u, lam, info = prob.solve()
        host = HostAugmentedSystem(prob)
        r0, r1 = host.residual(np.asarray(u, float), np.asarray(lam, float))
        res = float(np.sqrt(r0 @ r0 + r1 @ r1))
        jres = float(info.residual)
        assert abs(res - jres) <= 1e-3 * max(jres, 1e-14), (res, jres)

    def test_refinement_reaches_reference_tolerance(self):
        prob = ImmersedLaplaceProblem(smooth_config(
            use_operator_form=True, use_diagonal_inverse=True))
        prob.cfg.schur.tolerance = 1e-8
        prob.cfg.schur.reduction = 1e-8
        prob.setup()
        u, lam, hist = prob.solve_refined(tol_abs=1e-12)
        assert prob.results["converged"]
        assert hist[-1] <= 1e-12
        assert prob.results["refine_steps"] <= 4


class TestUseDisplacement:
    """``Use displacement in embedded interface``: the configuration is
    identity + displacement (MappingQEulerian, immersed_laplace.cc:315-323)
    vs the direct configuration map (MappingFEField).  The same circle
    expressed both ways must give identical geometry and identical solves."""

    def test_displacement_matches_direct(self):
        direct = ImmersedLaplaceProblem(smooth_config(
            use_operator_form=True, use_diagonal_inverse=True))
        direct.setup()

        disp = ImmersedLaplaceProblem(smooth_config(
            use_operator_form=True, use_diagonal_inverse=True,
            use_displacement=True,
            embedded_configuration=(
                "R*cos(2*pi*x)+Cx - x; R*sin(2*pi*x)+Cy",
                "R=.2, Cx=.4, Cy=.4")))
        disp.setup()

        np.testing.assert_allclose(
            np.asarray(disp.imm_space.dof_points),
            np.asarray(direct.imm_space.dof_points), atol=1e-13)

        u_d, lam_d, info_d = direct.solve()
        u_e, lam_e, info_e = disp.solve()
        assert int(info_d.iterations) == int(info_e.iterations)
        np.testing.assert_allclose(np.asarray(u_e), np.asarray(u_d),
                                   atol=1e-12)
