"""Guarded mixed-precision iterative-refinement driver.

One loop shared by every model's ``solve_refined``: f32 correction solves on
device, TRUE f64 residual on the host (ops.host_ref), iterated to the
reference's absolute tolerances (SURVEY §6 solve-quality targets;
parameters/*/: 'Tolerance').

The guard exists because a DIVERGED f32 correction (nan, or a gross
overshoot — the round-4 elasticity failure mode) must never poison the f64
iterate.  It is deliberately NOT monotone: near the f32 conditioning limit
the FIRST correction of a cycle can overshoot and grow the true residual
(measured on the v5e, elliptic cycle 2: step 0 grows 2.31x, steps 1-4 then
contract 1e4x per step to 2e-12 — classic iterative-refinement transient
when kappa*eps_f32 ~ 1).  The cap is 64x, not a tight bound: elliptic
cycle 3's transient measures 7.64x on CPU f32 and crosses 8x on the v5e
(same correction, different f32 rounding) — with an 8x cap the guard was
rejecting a convergent process at every cycle >= 3 (0.016 -> 0.125 ->
1.2e-4 -> 9.1e-7 -> 9.8e-11 once accepted).  So a step is accepted if it
improves, OR if it is finite and bounded (<= growth_cap x the current AND
the initial residual);
at most ``max_no_improve`` consecutive non-improving steps are taken, the
best iterate seen is tracked, and the loop always returns that best iterate
— a nan or unbounded correction can never poison the result, it only ends
the loop with ``converged=False`` and the last good iterate.
"""

from __future__ import annotations

from contextlib import contextmanager

import numpy as np

__all__ = ["guarded_refinement", "capped_max_steps", "CORRECTION_MAX_OUTER"]

# Upper bound on the outer Krylov steps of ONE correction-solve device
# program.  The whole FGMRES runs inside a single XLA while_loop; with the
# reference's max_steps=1000 a STALLED f32 solve (tolerance below the f32
# noise floor) grinds the full 1000 iterations in one program — minutes of
# device time that the v5e worker watchdog kills ("TPU worker crashed", the
# round-4/5 elliptic:3 / stokes:9:10 / elasticity:2 failure signature).
# Capping per-program steps and letting guarded_refinement restart from the
# host is mathematically restarted FGMRES with f64 residual recomputation —
# equal or better numerically — and bounds every device program to seconds.
# Converged solves are unaffected: measured per-step counts across all five
# families are 8-30 iterations, well under the cap.
CORRECTION_MAX_OUTER = 64


@contextmanager
def capped_max_steps(control, cap: int | None = None):
    """Temporarily cap ``control.max_steps`` while a correction solver is
    BUILT (the jitted program bakes the bound at trace time)."""
    if cap is None:
        cap = CORRECTION_MAX_OUTER   # resolved at call time (testable)
    old = control.max_steps
    control.max_steps = min(old, cap)
    try:
        yield
    finally:
        control.max_steps = old


def guarded_refinement(residual, correct, sizes, tol_abs: float,
                       max_refine: int, growth_cap: float = 64.0,
                       max_no_improve: int = 2):
    """Run the refinement loop.

    ``residual(*xs) -> tuple[np.ndarray]``: f64 block residuals b - A·x.
    ``correct(rs) -> (parts, iterations)``: solve A·dx = r for the (already
    residual-normalized) block rhs ``rs``; returns f64 block corrections.
    ``sizes``: block sizes of the iterate.

    A full step is taken if it improves the true residual OR stays finite
    and within ``growth_cap`` of both the current and initial residual (the
    measured transient at the f32 conditioning limit); an out-of-bounds full
    step retries ONCE at half length (improvement required).  At most
    ``max_no_improve`` consecutive non-improving steps are allowed; the BEST
    iterate seen is always what is returned.

    Returns ``(xs, history, total_iterations, converged)`` — ``history``
    holds the accepted true residual norms (``len(history) - 1`` is the
    number of accepted refinement steps; ``xs``/``converged`` reflect the
    best iterate, which may precede ``history[-1]``).
    """
    xs = [np.zeros(n) for n in sizes]
    rs = residual(*xs)
    res = float(np.sqrt(sum(float(r @ r) for r in rs)))
    res0 = res
    history = [res]
    best = (res, xs)
    total_iters = 0
    steps = 0
    no_improve = 0
    while steps < max_refine and np.isfinite(res) and best[0] > tol_abs:
        s = res  # normalize so f32 corrections stay well-scaled
        parts, iters = correct([r / s for r in rs])
        total_iters += int(iters)
        steps += 1

        def _trial(damp):
            t = [x + damp * s * p for x, p in zip(xs, parts)]
            t_rs = residual(*t)
            return (float(np.sqrt(sum(float(r @ r) for r in t_rs))), t, t_rs)

        def _bounded(t):
            return (np.isfinite(t[0]) and t[0] <= growth_cap * res
                    and t[0] <= growth_cap * res0)

        # prefer an IMPROVING step (full, then halved retry); else take a
        # BOUNDED finite one (the measured overshoot transient); else stop.
        full = _trial(1.0)
        if np.isfinite(full[0]) and full[0] < res:
            accepted = full
        else:
            half = _trial(0.5)
            if np.isfinite(half[0]) and half[0] < res:
                accepted = half
            elif _bounded(full):
                accepted = full
            elif _bounded(half):
                accepted = half
            else:
                break  # diverged correction: return the best iterate so far
        res, xs, rs = accepted
        history.append(res)
        if res < best[0]:
            best = (res, xs)
            no_improve = 0
        else:
            no_improve += 1
            if no_improve >= max_no_improve:
                break
    res, xs = best
    return xs, history, total_iters, bool(res <= tol_abs)
