"""Chebyshev polynomial preconditioner/smoother (deal.II
``PreconditionChebyshev`` analog; the GMG smoother replacing ML-AMG's
Chebyshev/SGS sweeps, reference utilities.h:304-317 smoother settings)."""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.linop import LinOp

__all__ = ["chebyshev"]


def chebyshev(A, diag_inv, lam_max: float, degree: int = 4,
              eig_ratio: float = 30.0, lam_max_safety: float = 1.1):
    """Chebyshev iteration for D⁻¹A with spectrum bounded by ``lam_max``
    (estimated by Lanczos, ops.krylov.lanczos_max_eig).  Targets
    ``[lam_max/eig_ratio, lam_max*safety]`` — the standard smoother range.

    Returns a traceable ``b -> x ≈ A⁻¹ b`` (x0 = 0)."""
    lmax = lam_max * lam_max_safety
    lmin = lam_max / eig_ratio
    theta = 0.5 * (lmax + lmin)
    delta = 0.5 * (lmax - lmin)
    sigma1 = theta / delta

    def apply(b):
        dinv_b = diag_inv * b
        x = dinv_b / theta
        rho = 1.0 / sigma1
        p = x
        for _ in range(degree - 1):
            r = b - A(x)
            rho_new = 1.0 / (2.0 * sigma1 - rho)
            p = (rho_new * rho) * p + (2.0 * rho_new / delta) * (diag_inv * r)
            x = x + p
            rho = rho_new
        return x

    return apply
