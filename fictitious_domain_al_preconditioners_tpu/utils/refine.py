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

import numpy as np

__all__ = ["guarded_refinement"]


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
