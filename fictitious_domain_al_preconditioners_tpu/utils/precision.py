"""Full-precision f32 matmuls for the element-form model families.

On TPU, f32 ``dot_general`` defaults to MXU passes with bf16-class operand
rounding (~4e-3 relative).  For the Pallas-stencil flagship that is
irrelevant (the hot applies are VPU stencils), but the element-form /
dense-block families (Stokes, elasticity, elliptic interface, Nitsche)
apply their operators THROUGH matmuls — and a 4e-3 operator error caps
mixed-precision iterative refinement far above the reference tolerances.

Measured on the v5e (Stokes ref 4/5 correction solve, diag script in
PARITY.md round-4 notes): claimed device residual 1.8e-4 vs TRUE f64
reduction 2.1e-2 at default precision — 165x apart; at HIGHEST precision
claimed == true == 1.27e-4 and the outer count drops 6 -> 3.  The fix is
baked in at trace time so every ``dot_general`` in these solvers carries
``precision=HIGHEST`` (full f32 via multi-pass bf16 on the MXU).
"""

from __future__ import annotations

import functools

import jax

__all__ = ["full_matmul_precision"]


def full_matmul_precision(fn):
    """Wrap ``fn`` so it traces under ``jax.default_matmul_precision
    ("highest")`` — compose UNDER ``jax.jit`` / ``jit_hoisted`` so the
    precision is baked into the traced program."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapped
