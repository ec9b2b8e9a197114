"""Guarded mixed-precision iterative-refinement driver.

One loop shared by every model's ``solve_refined``: f32 correction solves on
device, TRUE f64 residual on the host (ops.host_ref), iterated to the
reference's absolute tolerances (SURVEY §6 solve-quality targets;
parameters/*/: 'Tolerance').

The guard exists because a DIVERGED f32 correction (nan, or a gross
overshoot — the round-4 elasticity failure mode) must never poison the f64
iterate: each step is accepted only if the new true residual is finite and
strictly smaller than the current one.  A rejected step rolls back, retries
ONCE at half step length (a garbage direction with a usable component), and
the loop stops with ``converged=False`` if the retry fails too — turning a
silent nan row into a diagnosable failure.
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
                       max_refine: int):
    """Run the refinement loop.

    ``residual(*xs) -> tuple[np.ndarray]``: f64 block residuals b - A·x.
    ``correct(rs) -> (parts, iterations)``: solve A·dx = r for the (already
    residual-normalized) block rhs ``rs``; returns f64 block corrections.
    ``sizes``: block sizes of the iterate.

    Returns ``(xs, history, total_iterations, converged)`` — ``history``
    holds the ACCEPTED true residual norms (``history[-1]`` is final;
    ``len(history) - 1`` is the number of accepted refinement steps).
    """
    xs = [np.zeros(n) for n in sizes]
    rs = residual(*xs)
    res = float(np.sqrt(sum(float(r @ r) for r in rs)))
    history = [res]
    total_iters = 0
    steps = 0
    while steps < max_refine and np.isfinite(res) and res > tol_abs:
        s = res  # normalize so f32 corrections stay well-scaled
        parts, iters = correct([r / s for r in rs])
        total_iters += int(iters)
        steps += 1
        accepted = False
        damp = 1.0
        for _ in range(2):  # full step, then one halved retry
            trial = [x + damp * s * p for x, p in zip(xs, parts)]
            trial_rs = residual(*trial)
            trial_res = float(np.sqrt(sum(float(r @ r) for r in trial_rs)))
            if np.isfinite(trial_res) and trial_res < res:
                xs, rs, res = trial, trial_rs, trial_res
                history.append(res)
                accepted = True
                break
            damp *= 0.5
        if not accepted:
            break  # diverged correction: iterate stays at the last good one
    return xs, history, total_iters, bool(res <= tol_abs)
