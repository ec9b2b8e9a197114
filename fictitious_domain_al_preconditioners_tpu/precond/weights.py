"""Inverse-weight (W⁻¹) operators for the AL term γ·CᵀW⁻¹C.

The reference offers several immersed mass-matrix surrogates W (SURVEY §0):
M (exact UMFPACK inverse), M² (exact inverse applied twice), diag(M),
diag(M)², diag(M²), and h-scaled M (W = M/h²).  Exact inverses are realized
here by tightly-converged Jacobi-preconditioned CG (immersed mass matrices are
well-conditioned; this is the UMFPACK stand-in, reference N10).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ops.krylov import cg
from ..ops.linop import LinOp, diag_op
from ..ops.operators import CellMatrix

__all__ = [
    "inv_diag", "inv_diag_squared", "inv_exact", "inv_squared_exact",
    "inv_diag_of_m_squared",
]


def inv_diag(M: CellMatrix) -> LinOp:
    """W = diag(M)  (operator-form immersed_laplace, lines 856-863)."""
    return diag_op(1.0 / M.diag())


def inv_diag_squared(M: CellMatrix) -> LinOp:
    """W = diag(M)²  (explicit-form immersed_laplace lines 869-874; Stokes
    'Diagonal mass immersed', stokes_immersed_boundary.cc:965-973)."""
    return diag_op(1.0 / M.diag() ** 2)


# Immersed matrices up to this size get a PRECOMPUTED dense inverse (host
# f64) applied as one MXU matmul — the closest TPU analog of the reference's
# UMFPACK factor-once/solve-cheap pattern.  A CG solve per W⁻¹ application
# is ~30 sequential latency-bound ops on TPU; when W⁻¹ sits inside the
# augmented operator of an inner CG (elliptic modified AL), that nesting
# dominated the whole solve.
DENSE_INV_MAX = 4096

_DENSE_OVERRIDE_LOGGED = False


def _dense_inv(M: CellMatrix) -> np.ndarray:
    rows, cols, vals = M.to_coo()
    n = M.shape[0]
    dense = np.zeros((n, n))
    np.add.at(dense, (rows, cols), vals)
    return np.linalg.inv(dense)


def inv_exact(M: CellMatrix, tol: float = 0.0, reduction: float = 1e-14,
              max_steps: int = 1000, scale: float = 1.0) -> LinOp:
    """W = M/scale solved exactly (UMFPACK M⁻¹ stand-in,
    immersed_laplace.cc:849-878): precomputed dense inverse (one matmul per
    apply) up to DENSE_INV_MAX dofs, Jacobi-CG to machine-level reduction
    above.  ``scale`` supports the h-scaled variant W = M/h² -> W⁻¹ =
    h²·M⁻¹.  The dense path supersedes any tol/reduction/max_steps passed
    (it is exact, i.e. strictly tighter than any CG control); that
    precedence is logged once when non-default controls are overridden."""
    if M.shape[0] <= DENSE_INV_MAX:
        if (tol, reduction, max_steps) != (0.0, 1e-14, 1000):
            global _DENSE_OVERRIDE_LOGGED
            if not _DENSE_OVERRIDE_LOGGED:
                _DENSE_OVERRIDE_LOGGED = True
                print("inv_exact: n <= DENSE_INV_MAX -> exact dense inverse; "
                      "explicit solve controls are superseded", flush=True)
        inv = jnp.asarray(scale * _dense_inv(M))

        def mv(x):
            return inv.astype(x.dtype) @ x

        return LinOp(mv, M.shape, mv, name="M^-1")
    dinv = 1.0 / M.diag()

    def mv(x):
        # f32 floor: a 1e-14 reduction is unreachable in single precision,
        # so the nested CG would spin max_steps on EVERY W^-1 apply —
        # stalling the compiled solver long enough to trip the v5e worker
        # watchdog (the elliptic:3+ table-row "crashes"; same signature as
        # the Stokes inner-CG item in PARITY.md).  Jacobi-CG on a mass
        # matrix reaches the f32 floor in ~30 steps.
        red = reduction
        if x.dtype == jnp.float32:
            red = max(reduction, 2e-7)
        y, _ = cg(M.mv, x, M=lambda r: dinv * r, tol=tol,
                  reduction=red, max_steps=max_steps)
        return scale * y

    return LinOp(mv, M.shape, mv, name="M^-1")


def inv_squared_exact(M: CellMatrix, **kw) -> LinOp:
    """W = M²: exact inverse applied twice (immersed_laplace.cc:875-878).
    Small matrices fold both applications into ONE precomputed (M⁻¹)²
    matmul."""
    if M.shape[0] <= DENSE_INV_MAX:
        scale = kw.get("scale", 1.0)
        inv = _dense_inv(M)
        inv2 = jnp.asarray(scale * scale * (inv @ inv))

        def mv(x):
            return inv2.astype(x.dtype) @ x

        return LinOp(mv, M.shape, mv, name="M^-2")
    inv = inv_exact(M, **kw)
    return inv @ inv


def inv_diag_of_m_squared(M: CellMatrix) -> LinOp:
    """W = diag(M·M): row-wise Σ_j M_ij² of the *assembled* matrix — the
    reference's ``compute_inverse_diagonal_mass_squared`` (utilities.h:348-374),
    computed here from deduplicated COO instead of a sparse mat-mat."""
    rows, cols, vals = M.to_coo()
    # sum duplicate (row, col) entries, then accumulate squares per row
    ncols = M.shape[1]
    key = rows.astype(np.int64) * ncols + cols.astype(np.int64)
    order = np.argsort(key, kind="stable")
    key_s, vals_s = key[order], vals[order]
    boundaries = np.flatnonzero(np.diff(key_s)) + 1
    seg_vals = np.add.reduceat(vals_s, np.concatenate([[0], boundaries]))
    seg_rows = (key_s[np.concatenate([[0], boundaries])] // ncols).astype(np.int64)
    diag_m2 = np.zeros(M.shape[0])
    np.add.at(diag_m2, seg_rows, seg_vals ** 2)
    return diag_op(jnp.asarray(1.0 / diag_m2))
