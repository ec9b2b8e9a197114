"""Divergence guard of the mixed-precision refinement loop (VERDICT r4 #5).

A diverged f32 correction (nan or gross overshoot — the round-4 elasticity
failure mode that published a nan row) must never poison the f64 iterate:
utils.refine.guarded_refinement rejects any step whose new TRUE residual is
not finite or not smaller, retries once at half step, then stops with
converged=False.  Also pins the tensor-product exact lattice mass inverse
(precond.weights.lattice_mass_inverse) that replaced the >DENSE_INV_MAX
nested-CG fallback (VERDICT r4 #2).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from fictitious_domain_al_preconditioners_tpu.utils.refine import (
    guarded_refinement,
)


def _identity_residual(b):
    def residual(x):
        return (b - x,)

    return residual


class TestGuardedRefinement:
    def test_exact_correction_converges_in_one_step(self):
        b = np.linspace(1.0, 2.0, 5)

        def correct(rs):
            return [rs[0].copy()], 3  # exact solve of I·dx = r

        (x,), hist, iters, conv = guarded_refinement(
            _identity_residual(b), correct, (5,), 1e-12, 10)
        assert conv and iters == 3
        assert len(hist) == 2 and hist[-1] <= 1e-12
        np.testing.assert_allclose(x, b, atol=1e-14)

    def test_nan_correction_rejected_and_loop_exits_finite(self):
        b = np.ones(4)

        def correct(rs):
            return [np.full(4, np.nan)], 7  # a diverged f32 solve

        (x,), hist, iters, conv = guarded_refinement(
            _identity_residual(b), correct, (4,), 1e-12, 10)
        assert not conv
        assert np.all(np.isfinite(x)) and np.all(x == 0.0)  # rolled back
        assert np.isfinite(hist[-1]) and len(hist) == 1
        assert iters == 7  # the attempt is still accounted

    def test_overshoot_retried_at_half_step(self):
        """A 2x-overshoot correction leaves the residual unchanged at full
        step (|b - 2b| = |b|) but halves... the half-step retry (exactly b)
        must be ACCEPTED and converge."""
        b = np.ones(3)

        def correct(rs):
            return [2.0 * rs[0]], 1

        (x,), hist, iters, conv = guarded_refinement(
            _identity_residual(b), correct, (3,), 1e-12, 10)
        assert conv
        np.testing.assert_allclose(x, b, atol=1e-14)

    def test_stagnating_correction_stops_unconverged(self):
        """Zero corrections stall: max_no_improve BOUNDED steps are taken
        (a changed iterate re-seeds the next correction — the measured v5e
        elliptic-cycle-2 transient), then the loop stops unconverged with a
        finite iterate."""
        b = np.ones(3)

        def correct(rs):
            return [np.zeros(3)], 2  # no progress at any step length

        (x,), hist, iters, conv = guarded_refinement(
            _identity_residual(b), correct, (3,), 1e-12, 10)
        assert not conv
        assert np.all(np.isfinite(x))
        assert len(hist) == 3 and iters == 4   # 2 no-improve steps, stop
        assert hist[0] == hist[1] == hist[2]

    def test_bounded_growth_transient_recovers(self):
        """The measured v5e elliptic-cycle-2 pattern: the FIRST correction
        grows the true residual 2.3x, the next one contracts 1e4x.  The
        guard must take the bounded growth step and converge."""
        b = np.ones(3)
        calls = []

        def correct(rs):
            calls.append(1)
            if len(calls) == 1:
                # overshoot: full step -> 3x growth, half step -> exactly
                # 1.0x (not improving) — only the bounded-growth path
                # can accept
                return [4.0 * rs[0]], 4
            return [rs[0].copy()], 4      # exact solve afterwards

        (x,), hist, iters, conv = guarded_refinement(
            _identity_residual(b), correct, (3,), 1e-12, 10)
        assert conv and len(calls) == 2 and iters == 8
        assert hist[1] > hist[0]          # the accepted growth step
        np.testing.assert_allclose(x, b, atol=1e-14)

    def test_growing_correction_stops_and_rolls_back(self):
        """A correction that keeps GROWING the residual exhausts the bounded
        budget (per-step and vs-initial growth_cap), stops, and rolls back
        to the best iterate."""
        b = np.ones(3)

        def correct(rs):
            return [-5.0 * rs[0]], 3   # moves the iterate the wrong way

        (x,), hist, iters, conv = guarded_refinement(
            _identity_residual(b), correct, (3,), 1e-12, 10)
        assert not conv and len(hist) <= 3 and iters <= 9
        assert np.all(x == 0.0)   # rolled back to the initial iterate


class TestModelLevelGuard:
    def test_laplace_solve_refined_survives_nan_correction(self):
        """End-to-end: a deliberately-diverging correction solver must leave
        solve_refined with a FINITE iterate and converged=False (the
        structural fix for the round-4 elasticity nan row)."""
        from fictitious_domain_al_preconditioners_tpu.models import (
            ImmersedLaplaceConfig, ImmersedLaplaceProblem,
        )
        from fictitious_domain_al_preconditioners_tpu.ops.host_ref import (
            HostAugmentedSystem,
        )

        cfg = ImmersedLaplaceConfig(
            initial_refinement=4, initial_embedded_refinement=5,
            solver="augmented", use_operator_form=True,
            use_diagonal_inverse=True)
        prob = ImmersedLaplaceProblem(cfg)
        prob.setup()

        class _Info:
            iterations = 5

        def bad_corr(r0, r1):
            return (jnp.full(r0.shape, jnp.nan), jnp.full(r1.shape, jnp.nan),
                    _Info())

        prob._refine_cache = (HostAugmentedSystem(prob), bad_corr)
        u, lam, hist = prob.solve_refined(tol_abs=1e-10, max_refine=5)
        assert not prob.results["converged"]
        assert np.all(np.isfinite(u)) and np.all(np.isfinite(lam))
        assert np.all(np.isfinite(hist))


class TestLatticeMassInverse:
    @pytest.mark.parametrize("dim,ref", [(2, 4), (3, 2)])
    def test_exact_vs_assembled(self, dim, ref):
        """M⁻¹ and M⁻² from the tensor factorization match the dense solve
        of the ASSEMBLED immersed mass matrix to f64 roundoff."""
        from fictitious_domain_al_preconditioners_tpu.core.generators import (
            background_grid_from_name, immersed_mesh_from_name,
        )
        from fictitious_domain_al_preconditioners_tpu.core.grid import (
            GridSpace,
        )
        from fictitious_domain_al_preconditioners_tpu.core.immersed import (
            ImmersedSpace,
        )
        from fictitious_domain_al_preconditioners_tpu.ops.assembly import (
            imm_mass_matrix,
        )
        from fictitious_domain_al_preconditioners_tpu.precond.weights import (
            lattice_mass_inverse,
        )

        args = "-0.14: 0.44: true"
        grid = background_grid_from_name("hyper_cube", args, dim, ref)
        gs = GridSpace.q(grid, 1)
        mesh = immersed_mesh_from_name("hyper_cube", args, dim, ref)
        sp = ImmersedSpace(mesh, gs.fe, gs.cell_dofs, gs.n_dofs)
        M = imm_mass_matrix(sp, order=2)
        n = M.shape[0]
        rows, cols, vals = M.to_coo()
        dense = np.zeros((n, n))
        np.add.at(dense, (rows, cols), vals)
        x = np.random.default_rng(0).standard_normal(n)

        y1 = np.asarray(lattice_mass_inverse(gs)(jnp.asarray(x)))
        ref1 = np.linalg.solve(dense, x)
        assert np.abs(y1 - ref1).max() <= 1e-10 * np.abs(ref1).max()

        y2 = np.asarray(lattice_mass_inverse(gs, squared=True)(jnp.asarray(x)))
        ref2 = np.linalg.solve(dense, ref1)
        assert np.abs(y2 - ref2).max() <= 1e-10 * np.abs(ref2).max()

        # componentwise stacks (vector multiplier use)
        xs = np.random.default_rng(1).standard_normal((n, dim))
        ys = np.asarray(lattice_mass_inverse(gs, squared=True)(jnp.asarray(xs)))
        refs = np.linalg.solve(dense, np.linalg.solve(dense, xs))
        assert np.abs(ys - refs).max() <= 1e-10 * np.abs(refs).max()

    def test_scale_and_ineligible_spaces(self):
        from fictitious_domain_al_preconditioners_tpu.core.grid import (
            GridSpace, UniformGrid,
        )
        from fictitious_domain_al_preconditioners_tpu.precond.weights import (
            lattice_mass_inverse,
        )

        grid = UniformGrid.hyper_cube(2, 0.0, 1.0, 3)
        q1 = GridSpace.q(grid, 1)
        q2 = GridSpace.q(grid, 2)
        assert lattice_mass_inverse(None) is None
        assert lattice_mass_inverse(q2) is None  # Q1-only fast path
        inv = lattice_mass_inverse(q1, scale=4.0)
        base = lattice_mass_inverse(q1)
        x = jnp.ones(q1.n_dofs)
        np.testing.assert_allclose(np.asarray(inv(x)),
                                   4.0 * np.asarray(base(x)), rtol=1e-12)


class TestCappedMaxSteps:
    """Correction-solve device programs are bounded (watchdog safety): one
    short program per refinement step instead of a single minutes-long
    while_loop the v5e worker kills."""

    def test_caps_and_restores(self):
        from dataclasses import dataclass

        from fictitious_domain_al_preconditioners_tpu.utils.refine import (
            CORRECTION_MAX_OUTER, capped_max_steps,
        )

        @dataclass
        class Ctl:
            max_steps: int = 1000

        c = Ctl()
        with capped_max_steps(c):
            assert c.max_steps == CORRECTION_MAX_OUTER
        assert c.max_steps == 1000
        c = Ctl(max_steps=10)   # an already-smaller bound is kept
        with capped_max_steps(c):
            assert c.max_steps == 10
        try:                     # restored even when the build raises
            with capped_max_steps(Ctl()) as _:
                raise RuntimeError
        except RuntimeError:
            pass

    def test_refinement_restarts_across_capped_programs(self, monkeypatch):
        """With the per-program cap forced to 4, solve_refined still reaches
        the reference tolerance by restarting from the host: total its ≤
        cap × steps, and more than one (short) program ran."""
        from fictitious_domain_al_preconditioners_tpu.models import (
            ImmersedLaplaceConfig, ImmersedLaplaceProblem,
        )
        from fictitious_domain_al_preconditioners_tpu.utils import refine

        monkeypatch.setattr(refine, "CORRECTION_MAX_OUTER", 4)
        cfg = ImmersedLaplaceConfig(
            initial_refinement=4, initial_embedded_refinement=4,
            embedded_configuration=("R*cos(2*pi*x)+Cx; R*sin(2*pi*x)+Cy",
                                    "R=.2, Cx=.4, Cy=.4"),
            embedding_rhs=("8*pi^2*sin(2*pi*x)*sin(2*pi*y)", ""),
            embedded_value=("sin(2*pi*x)*sin(2*pi*y)", ""),
            solver="augmented", use_operator_form=True,
            use_diagonal_inverse=True)
        prob = ImmersedLaplaceProblem(cfg)
        prob.setup()
        u, lam, hist = prob.solve_refined(tol_abs=1e-10, max_refine=30)
        steps = prob.results["refine_steps"]
        assert prob.results["converged"]
        assert hist[-1] <= 1e-10
        assert steps > 1  # the cap forced more than one program
        assert prob.results["outer_iterations"] <= 4 * steps
