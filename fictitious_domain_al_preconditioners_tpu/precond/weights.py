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
    "inv_diag_of_m_squared", "lattice_mass_inverse",
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


def _lattice_1d_mass(n: int, h: float) -> np.ndarray:
    """1D Q1 mass matrix on a uniform n-point line: tridiag(h/6, 2h/3, h/6)
    with boundary diagonal h/3 (parallel.lattice module header)."""
    M = np.zeros((n, n))
    i = np.arange(n - 1)
    M[i, i + 1] = h / 6.0
    M[i + 1, i] = h / 6.0
    d = np.full(n, 2.0 * h / 3.0)
    d[0] = d[-1] = h / 3.0
    M[np.arange(n), np.arange(n)] = d
    return M


def lattice_mass_inverse(space, squared: bool = False,
                         scale: float = 1.0) -> LinOp | None:
    """EXACT W⁻¹ = scale·M⁻¹ (or scale²·M⁻²) for the mass matrix of a
    uniform tensor-product Q1 lattice, at ANY size and O(1) apply latency.

    On such a grid the assembled mass matrix factors exactly as
    M = M₁ ⊗ M₁ (⊗ M₁ in 3D) — the 1D factors are tiny k×k matrices
    (k = points per axis), inverted once on the host in f64 and applied as
    one small dense matmul per axis on the lattice-reshaped vector.  This
    replaces the former >DENSE_INV_MAX fallback (a ~30-step Jacobi-CG nested
    inside the augmented operator of the inner solves — a latency explosion
    that made the reference-scale elliptic/elasticity cycles untractable on
    TPU) with the MXU-native analog of the reference's factor-once UMFPACK
    W⁻¹ (elliptic_interface.cc:700-739, N10).

    Returns ``None`` when ``space`` is not an eligible lattice (callers fall
    back to the dense-inverse / CG paths below).  The returned apply accepts
    flat ``(n,)`` vectors or ``(n, k)`` stacks (componentwise vector use)."""
    if (space is None or not getattr(space, "continuous", False)
            or space.fe.degree != 1 or not hasattr(space, "n_points_1d")):
        return None
    npts = tuple(int(x) for x in space.n_points_1d)    # coordinate order
    hs = tuple(float(x) for x in space.grid.h)
    # Factor inverses applied as BANDED diagonal stencils, not matmuls: the
    # 1D mass inverse decays like (2-√3)^|i-j| ≈ 0.268^|i-j|, so truncating
    # below 1e-15 relative keeps a band of ~25 (≈50 for M⁻²) — exact to
    # machine precision in both f32 and f64.  Deliberately DOT-FREE: on the
    # tunneled v5e every matrix×matrix dot_general shape pays a pathological
    # remote-autotune on first compile (measured: 205-430 s for a single
    # (65,65)@(65,65) f32 GEMM program, while matvec/stencil programs
    # compile in ~1 s) — a shift-FMA apply sidesteps the entire class.
    bands = []
    for n, h in zip(reversed(npts), reversed(hs)):     # lattice axis order
        inv = np.linalg.inv(_lattice_1d_mass(n, h))
        if squared:
            inv = inv @ inv
        tol = 1e-15 * np.abs(inv).max()
        b = 0
        for k in range(1, n):
            if np.abs(np.diagonal(inv, k)).max() <= tol:
                break
            b = k
        # coefficient planes per offset: W[k+b, i] = inv[i, i+k]
        W = np.zeros((2 * b + 1, n))
        for k in range(-b, b + 1):
            dg = np.diagonal(inv, k)
            W[k + b, max(0, -k):max(0, -k) + len(dg)] = dg
        bands.append((b, jnp.asarray(W)))
    lat_shape = tuple(reversed(npts))
    d = len(lat_shape)
    total = int(np.prod(npts))
    s = scale * scale if squared else scale

    def mv(x):
        trail = x.shape[1:]
        u = x.reshape(lat_shape + trail)
        for ax, (b, W) in enumerate(bands):
            n = lat_shape[ax]
            pads = [(0, 0)] * u.ndim
            pads[ax] = (b, b)
            up = jnp.pad(u, pads)
            acc = None
            for k in range(2 * b + 1):
                sl = [slice(None)] * u.ndim
                sl[ax] = slice(k, k + n)
                wsh = [1] * u.ndim
                wsh[ax] = n
                term = W[k].reshape(wsh).astype(x.dtype) * up[tuple(sl)]
                acc = term if acc is None else acc + term
            u = acc
        return (s * u).reshape(x.shape)

    return LinOp(mv, (total, total), mv,
                 name="M^-2(lat)" if squared else "M^-1(lat)")

_DENSE_OVERRIDE_LOGGED = False


def _dense_inv(M: CellMatrix) -> np.ndarray:
    rows, cols, vals = M.to_coo()
    n = M.shape[0]
    dense = np.zeros((n, n))
    np.add.at(dense, (rows, cols), vals)
    return np.linalg.inv(dense)


def inv_exact(M: CellMatrix, tol: float = 0.0, reduction: float = 1e-14,
              max_steps: int = 1000, scale: float = 1.0,
              space=None) -> LinOp:
    """W = M/scale solved exactly (UMFPACK M⁻¹ stand-in,
    immersed_laplace.cc:849-878): tensor-product exact inverse when
    ``space`` is a uniform Q1 lattice (any size, see
    :func:`lattice_mass_inverse`), precomputed dense inverse (one matmul per
    apply) up to DENSE_INV_MAX dofs, Jacobi-CG to machine-level reduction
    above.  ``scale`` supports the h-scaled variant W = M/h² -> W⁻¹ =
    h²·M⁻¹.  The dense path supersedes any tol/reduction/max_steps passed
    (it is exact, i.e. strictly tighter than any CG control); that
    precedence is logged once when non-default controls are overridden."""
    lat = lattice_mass_inverse(space, squared=False, scale=scale)
    if lat is not None:
        return lat
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


def inv_squared_exact(M: CellMatrix, space=None, **kw) -> LinOp:
    """W = M²: exact inverse applied twice (immersed_laplace.cc:875-878).
    Uniform Q1 lattices use the tensor-product (M₁⁻²)⊗(M₁⁻²) at any size
    (:func:`lattice_mass_inverse`); small matrices fold both applications
    into ONE precomputed (M⁻¹)² matmul."""
    lat = lattice_mass_inverse(space, squared=True,
                               scale=kw.get("scale", 1.0))
    if lat is not None:
        return lat
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
