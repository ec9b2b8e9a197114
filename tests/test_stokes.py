"""End-to-end tests for the immersed-boundary Stokes problem."""

import numpy as np
import pytest

from fictitious_domain_al_preconditioners_tpu.models import (
    StokesConfig, StokesProblem,
)
from fictitious_domain_al_preconditioners_tpu.models.stokes import ALControl


def config_2d(**kw) -> StokesConfig:
    base = dict(
        spacedim=2,
        initial_refinement=4,
        initial_embedded_refinement=5,
        solver="IBStokesAL",
    )
    base.update(kw)
    return StokesConfig(**base)


class TestIBStokesAL2D:
    def test_solves_grad_div(self):
        prob = StokesProblem(config_2d(
            al=ALControl(grad_div_stabilization=True,
                         inverse_diag_square=True)))
        prob.setup()
        u, p, lam, info = prob.solve()
        assert prob.results["converged"]
        assert abs(prob.results["outer_iterations"] - 29) <= 2  # golden
        assert prob.constraint_residual() < 1e-6
        # velocity on Gamma should be close to g = (-.5, .5): spot check the
        # interpolated values at quad points
        vals = np.asarray(prob.Cs.interp_bg(
            np.asarray(u).reshape(2, -1).T))
        np.testing.assert_allclose(vals[:, 0], -0.5, atol=0.05)
        np.testing.assert_allclose(vals[:, 1], 0.5, atol=0.05)

    def test_exact_mass_inverse(self):
        prob = StokesProblem(config_2d(
            al=ALControl(grad_div_stabilization=True,
                         inverse_diag_square=False)))
        prob.setup()
        u, p, lam, info = prob.solve()
        assert prob.results["converged"]

    def test_minres_diag_spd(self):
        prob = StokesProblem(config_2d(
            al=ALControl(grad_div_stabilization=True,
                         inverse_diag_square=True, diagonal_spd_prec=True),
        ))
        prob.cfg.outer.tolerance = 1e-7
        prob.setup()
        u, p, lam, info = prob.solve()
        assert prob.results["converged"]

    def test_disc_pressure(self):
        prob = StokesProblem(config_2d(
            use_disc_pressure=True,
            al=ALControl(grad_div_stabilization=True,
                         inverse_diag_square=True)))
        prob.setup()
        u, p, lam, info = prob.solve()
        assert prob.results["converged"]
        assert abs(prob.results["outer_iterations"] - 37) <= 2  # golden

    def test_iteration_flatness(self):
        iters = []
        for ref, eref in ((4, 5), (5, 6)):
            prob = StokesProblem(config_2d(
                initial_refinement=ref, initial_embedded_refinement=eref,
                al=ALControl(grad_div_stabilization=True,
                             inverse_diag_square=True)))
            prob.setup()
            prob.solve()
            assert prob.results["converged"]
            iters.append(prob.results["outer_iterations"])
        golden = (29, 32)                     # per-size golden counts
        assert all(abs(g - i) <= 2 for g, i in zip(golden, iters)), iters


class TestBaselines:
    def test_plain_stokes_schur(self):
        # lid-driven-like: body force drives the flow; no immersed body
        prob = StokesProblem(config_2d(solver="Stokes"))
        prob.setup()
        u, p, lam, info = prob.solve()
        assert prob.results["converged"]
        assert prob.divergence_residual() < 1e-5

    def test_ibstokes_unpreconditioned(self):
        prob = StokesProblem(config_2d(
            solver="IBStokes", initial_refinement=3,
            initial_embedded_refinement=4))
        prob.setup()
        u, p, lam, info = prob.solve()
        assert prob.results["converged"]
        assert prob.constraint_residual() < 1e-6


class TestPrm:
    def test_reference_prm(self):
        import os

        path = "/root/reference/parameters_stokes.prm"
        if not os.path.exists(path):
            pytest.skip("reference not mounted")
        cfg = StokesConfig.from_prm(path, spacedim=2)
        assert cfg.solver == "IBStokesAL"
        assert cfg.al.gamma == 10.0
        assert cfg.al.gamma_grad_div == 10.0
        assert cfg.al.grad_div_stabilization
        assert cfg.al.tolerance == 1e-2
        assert cfg.embedded_value[0].replace(" ", "") == "-.5;.5"
        assert cfg.velocity_degree == 2

    def test_reference_prm_3d(self):
        import os

        path = "/root/reference/parameters_stokes_3d.prm"
        if not os.path.exists(path):
            pytest.skip("reference not mounted")
        cfg = StokesConfig.from_prm(path, spacedim=3)
        assert cfg.al.inverse_diag_square
        assert cfg.spacedim == 3


@pytest.mark.slow
class Test3D:
    def test_ibstokes_al_3d(self):
        prob = StokesProblem(StokesConfig(
            spacedim=3, initial_refinement=3, initial_embedded_refinement=1,
            dirichlet_ids=(0, 1, 2, 3, 4, 5),
            body_force=("1;0;0", ""),
            dirichlet_bc=("0;0;0;0", ""),
            embedded_value=("-.1;.1;0", ""),
            al=ALControl(grad_div_stabilization=True,
                         inverse_diag_square=True)))
        prob.cfg.outer.tolerance = 1e-6
        prob.setup()
        u, p, lam, info = prob.solve()
        assert prob.results["converged"]
        assert prob.constraint_residual() < 1e-4


class TestRefinedSolve:
    """Mixed-precision iterative refinement for IBStokesAL (VERDICT r3 #2):
    the host f64 reference apply (ops.host_ref.HostStokesSystem) must
    reproduce the jitted block operator, and solve_refined must drive the
    TRUE residual to the reference's 1e-8 'Stokes solver control'
    (parameters_stokes.prm)."""

    def test_host_residual_matches_jitted(self):
        from fictitious_domain_al_preconditioners_tpu.ops.host_ref import (
            HostStokesSystem,
        )

        prob = StokesProblem(config_2d(
            al=ALControl(grad_div_stabilization=True,
                         inverse_diag_square=True)))
        prob.cfg.outer.tolerance = 1e-9
        prob.setup()
        u, p, lam, info = prob.solve()
        host = HostStokesSystem(prob)
        r0, r1, r2 = host.residual(np.asarray(u, float),
                                   np.asarray(p, float),
                                   np.asarray(lam, float))
        res = float(np.sqrt(r0 @ r0 + r1 @ r1 + r2 @ r2))
        jres = float(info.residual)
        assert abs(res - jres) <= 1e-3 * max(jres, 1e-14), (res, jres)

    @pytest.mark.parametrize("diag_w", [True, False])
    def test_refinement_reaches_reference_tolerance(self, diag_w):
        prob = StokesProblem(config_2d(
            al=ALControl(grad_div_stabilization=True,
                         inverse_diag_square=diag_w)))
        prob.cfg.outer.tolerance = 1e-5
        prob.setup()
        u, p, lam, hist = prob.solve_refined(tol_abs=1e-10)
        assert prob.results["converged"], hist
        assert hist[-1] <= 1e-10
        assert prob.results["refine_steps"] <= 5, hist
