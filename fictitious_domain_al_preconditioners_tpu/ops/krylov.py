"""Jitted Krylov solvers: CG, MINRES, GMRES/FGMRES with deal.II-style controls.

TPU-native replacement for deal.II SolverCG / SolverMinRes / SolverGMRES /
SolverFGMRES + SolverControl / ReductionControl / IterationNumberControl
(reference N8; usage immersed_laplace.cc:574-577, elliptic_interface.cc:862-892).
Everything runs in ``lax.while_loop`` with static shapes: flexible
preconditioners (themselves inner CG loops) trace into the outer loop body, so
a full AL-preconditioned FGMRES solve compiles to a single XLA computation.

Control semantics:
  - ``tol``: absolute residual tolerance (SolverControl::check)
  - ``reduction``: stop at ``max(tol, reduction * ||r0||)`` (ReductionControl)
  - ``max_steps``: iteration cap; with ``fixed_iters=True`` the run is counted
    as converged regardless (IterationNumberControl — the reference's trick for
    robust inner AL solves, elliptic_interface.cc:887-892)

FGMRES orthogonalizes with classical Gram-Schmidt applied twice (CGS2): two
(m × n) matmuls per iteration instead of deal.II's modified Gram-Schmidt loop —
numerically equivalent to MGS with reorthogonalization and MXU-friendly.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["SolveInfo", "cg", "minres", "fgmres", "gmres",
           "cg_condition_number", "lanczos_max_eig"]


class SolveInfo(NamedTuple):
    iterations: jnp.ndarray
    residual: jnp.ndarray
    res0: jnp.ndarray
    converged: jnp.ndarray


def _dot(a, b):
    return jnp.sum(a * b)


def _norm(a):
    return jnp.sqrt(_dot(a, a))


def _threshold(tol, reduction, res0):
    if reduction is not None:
        return jnp.maximum(tol, reduction * res0)
    return jnp.asarray(tol, dtype=res0.dtype)


def cg(A: Callable, b, M: Optional[Callable] = None, x0=None, *,
       tol: float = 1e-10, reduction: float | None = None,
       max_steps: int = 100, fixed_iters: bool = False,
       track_tridiag: bool = False, norm_weight=None):
    """Preconditioned conjugate gradients.  Returns (x, SolveInfo[, (alphas,
    betas)]).  With ``track_tridiag`` the CG Lanczos coefficients are recorded
    for condition-number estimation (the reference's condition-number slot,
    immersed_laplace.cc:987-1010).  ``norm_weight`` (optional vector) changes
    only the CONVERGENCE-CHECK norm to ``||norm_weight * r||`` — used by
    callers iterating in rescaled variables to keep the original system's
    stopping semantics (e.g. the Stokes diag-scaled inner solve)."""
    M = M or (lambda x: x)
    _cnorm = (_norm if norm_weight is None
              else (lambda rr: _norm(norm_weight * rr)))
    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - A(x)
    res0 = _cnorm(r)
    thr = _threshold(tol, reduction, res0)
    z = M(r)
    p = z
    rz = _dot(r, z)
    alphas = jnp.zeros(max_steps, dtype=b.dtype)
    betas = jnp.zeros(max_steps, dtype=b.dtype)

    def cond(state):
        _, _, _, _, res, it, _, _ = state
        return (res > thr) & (it < max_steps)

    def body(state):
        x, r, p, rz, res, it, alphas, betas = state
        Ap = A(p)
        pAp = _dot(p, Ap)
        alpha = rz / pAp
        x = x + alpha * p
        r = r - alpha * Ap
        res = _cnorm(r)
        z = M(r)
        rz_new = _dot(r, z)
        beta = rz_new / rz
        p = z + beta * p
        if track_tridiag:
            alphas = alphas.at[it].set(alpha)
            betas = betas.at[it].set(beta)
        return x, r, p, rz_new, res, it + 1, alphas, betas

    x, r, p, rz, res, it, alphas, betas = lax.while_loop(
        cond, body, (x, r, p, rz, res0, jnp.int32(0), alphas, betas))
    conv = (res <= thr) | jnp.asarray(fixed_iters)
    info = SolveInfo(it, res, res0, conv)
    if track_tridiag:
        return x, info, (alphas, betas)
    return x, info


def batched_cg(A: Callable, B, M: Optional[Callable] = None, *,
               tol: float = 1e-12, reduction: float | None = None,
               max_steps: int = 1000):
    """CG on k independent systems sharing one batched operator.

    ``B`` is (n, k); ``A``/``M`` map (n, k) -> (n, k) column-wise.  All inner
    products are per-column; converged columns freeze while the rest iterate.
    This turns e.g. the rational preconditioner's 20 shifted solves
    (rational_preconditioner.h:41-52, sequential CG + fresh AMG each) into one
    batched Krylov loop whose iterations are single fused batched SpMVs — the
    TPU-native formulation."""
    M = M or (lambda x: x)
    X = jnp.zeros_like(B)
    R = B - A(X)
    res0 = jnp.sqrt(jnp.sum(R * R, axis=0))
    if reduction is not None:
        thr = jnp.maximum(tol, reduction * res0)
    else:
        thr = jnp.full_like(res0, tol)
    Z = M(R)
    P = Z
    rz = jnp.sum(R * Z, axis=0)

    def cond(state):
        _, _, _, _, res, it = state
        return jnp.any(res > thr) & (it < max_steps)

    def body(state):
        X, R, P, rz, res, it = state
        active = res > thr
        AP = A(P)
        pAp = jnp.sum(P * AP, axis=0)
        alpha = jnp.where(active, rz / jnp.where(pAp != 0, pAp, 1.0), 0.0)
        X = X + alpha[None, :] * P
        R = R - alpha[None, :] * AP
        res = jnp.sqrt(jnp.sum(R * R, axis=0))
        Z = M(R)
        rz_new = jnp.sum(R * Z, axis=0)
        beta = jnp.where(active, rz_new / jnp.where(rz != 0, rz, 1.0), 0.0)
        P = jnp.where(active[None, :], Z + beta[None, :] * P, P)
        return X, R, P, rz_new, res, it + 1

    X, R, P, rz, res, it = lax.while_loop(
        cond, body, (X, R, P, rz, res0, jnp.int32(0)))
    return X, SolveInfo(it, jnp.max(res), jnp.max(res0), jnp.all(res <= thr))


def cg_condition_number(alphas, betas, k) -> float:
    """Spectral condition estimate from CG's Lanczos tridiagonal (the
    'condition number slot', immersed_laplace.cc:993-1010).  Host-side."""
    import numpy as np

    alphas = np.asarray(alphas)[:int(k)]
    betas = np.asarray(betas)[:int(k)]
    m = len(alphas)
    if m == 0:
        return 1.0
    T = np.zeros((m, m))
    T[0, 0] = 1.0 / alphas[0]
    for i in range(1, m):
        T[i, i] = 1.0 / alphas[i] + betas[i - 1] / alphas[i - 1]
        off = np.sqrt(betas[i - 1]) / alphas[i - 1]
        T[i, i - 1] = off
        T[i - 1, i] = off
    ev = np.linalg.eigvalsh(T)
    ev = ev[ev > 0]
    return float(ev.max() / ev.min()) if len(ev) else 1.0


def lanczos_max_eig(A: Callable, n: int, steps: int = 8, key=None,
                    dtype=jnp.float64):
    """Largest-eigenvalue estimate by ``steps`` Lanczos iterations — replaces
    ``compute_l2_norm_matrix``'s 8-step Lanczos on CCᵀ (utilities.h:37-60) and
    feeds Chebyshev smoother bounds.  Runs as ONE jitted computation (a single
    device dispatch — setup-time calls would otherwise scatter hundreds of tiny
    eager ops)."""
    import numpy as np

    key = key if key is not None else jax.random.PRNGKey(0)

    def run(key):
        v = jax.random.normal(key, (n,), dtype=dtype)
        v = v / _norm(v)
        alphas = jnp.zeros(steps, dtype=dtype)
        betas = jnp.zeros(steps, dtype=dtype)
        v_prev = jnp.zeros_like(v)
        beta = jnp.asarray(0.0, dtype)
        for i in range(steps):
            w = A(v) - beta * v_prev
            alpha = _dot(v, w)
            w = w - alpha * v
            beta_new = _norm(w)
            alphas = alphas.at[i].set(alpha)
            betas = betas.at[i].set(beta_new)
            v_prev = v
            v = w / jnp.maximum(beta_new, 1e-300)
            beta = beta_new
        return alphas, betas

    # constants hoisted: at 16M+ dofs the operator closure captures
    # O(100 MB) arrays (stencil weights, diagonals) that must not be baked
    # into this setup program's compile payload
    from ..utils.hoist import jit_hoisted

    alphas, betas = jit_hoisted(run, (key,))(key)
    alphas = np.asarray(alphas)
    betas = np.asarray(betas)
    T = np.diag(alphas)
    for i in range(steps - 1):
        T[i + 1, i] = T[i, i + 1] = betas[i]
    return float(np.linalg.eigvalsh(T).max())


def minres(A: Callable, b, M: Optional[Callable] = None, x0=None, *,
           tol: float = 1e-10, reduction: float | None = None,
           max_steps: int = 1000, fixed_iters: bool = False):
    """Preconditioned MINRES (M must be SPD) — deal.II SolverMinRes stand-in
    (rational-preconditioner mode immersed_laplace.cc:585-635; diagonal SPD AL
    Stokes mode stokes_immersed_boundary.cc:1056-1064)."""
    M = M or (lambda x: x)
    x = jnp.zeros_like(b) if x0 is None else x0
    r1 = b - A(x)
    y = M(r1)
    beta1 = jnp.sqrt(jnp.maximum(_dot(r1, y), 0.0))
    res0 = beta1
    thr = _threshold(tol, reduction, res0)
    eps = jnp.finfo(b.dtype).tiny

    def cond(state):
        return (state["phibar"] > thr) & (state["it"] < max_steps)

    def body(s):
        it = s["it"]
        v = s["y"] / jnp.maximum(s["beta"], eps)
        y = A(v)
        y = y - jnp.where(it > 0, s["beta"] / jnp.maximum(s["oldb"], eps), 0.0) * s["r1"]
        alfa = _dot(v, y)
        y = y - (alfa / jnp.maximum(s["beta"], eps)) * s["r2"]
        r1 = s["r2"]
        r2 = y
        y = M(r2)
        oldb = s["beta"]
        beta = jnp.sqrt(jnp.maximum(_dot(r2, y), 0.0))
        oldeps = s["epsln"]
        delta = s["cs"] * s["dbar"] + s["sn"] * alfa
        gbar = s["sn"] * s["dbar"] - s["cs"] * alfa
        epsln = s["sn"] * beta
        dbar = -s["cs"] * beta
        gamma = jnp.maximum(jnp.sqrt(gbar ** 2 + beta ** 2), eps)
        cs = gbar / gamma
        sn = beta / gamma
        phi = cs * s["phibar"]
        phibar = sn * s["phibar"]
        w1 = s["w2"]
        w2 = s["w"]
        w = (v - oldeps * w1 - delta * w2) / gamma
        x = s["x"] + phi * w
        return dict(x=x, r1=r1, r2=r2, y=y, oldb=oldb, beta=beta,
                    epsln=epsln, dbar=dbar, cs=cs, sn=sn, phibar=phibar,
                    w=w, w2=w2, it=it + 1)

    zero = jnp.zeros_like(b)
    state = dict(x=x, r1=r1, r2=r1, y=y, oldb=jnp.asarray(0.0, b.dtype),
                 beta=beta1, epsln=jnp.asarray(0.0, b.dtype),
                 dbar=jnp.asarray(0.0, b.dtype),
                 cs=jnp.asarray(-1.0, b.dtype), sn=jnp.asarray(0.0, b.dtype),
                 phibar=beta1, w=zero, w2=zero, it=jnp.int32(0))
    state = lax.while_loop(cond, body, state)
    conv = (state["phibar"] <= thr) | jnp.asarray(fixed_iters)
    return state["x"], SolveInfo(state["it"], state["phibar"], res0, conv)


def _givens_apply(h, cs, sn, j, m):
    """Apply rotations 0..j-1 to column h (length m+1)."""

    def body(i, h):
        hi, hi1 = h[i], h[i + 1]
        pred = i < j
        new_hi = jnp.where(pred, cs[i] * hi + sn[i] * hi1, hi)
        new_hi1 = jnp.where(pred, -sn[i] * hi + cs[i] * hi1, hi1)
        return h.at[i].set(new_hi).at[i + 1].set(new_hi1)

    return lax.fori_loop(0, m, body, h)


def _gmres_core(A, b, M, x0, *, tol, reduction, max_steps, restart, flexible,
                m_returns_aux=False):
    n = b.shape[0]
    dtype = b.dtype
    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - A(x)
    res0 = _norm(r)
    thr = _threshold(tol, reduction, res0)
    m = restart

    def apply_M(v):
        """Preconditioner apply; with ``m_returns_aux`` the preconditioner
        returns (z, aux_scalar) and aux is accumulated across the solve (the
        reference's total-inner-CG-iterations metric, nitsche_bcs.cc:652-667)."""
        if m_returns_aux:
            return M(v)
        return M(v), jnp.asarray(0.0, dtype)

    def cycle(carry):
        x, res, tot_it, aux_sum = carry
        r = b - A(x)
        beta = _norm(r)
        V = jnp.zeros((m + 1, n), dtype=dtype)
        V = V.at[0].set(r / jnp.maximum(beta, jnp.finfo(dtype).tiny))
        Z = jnp.zeros((m, n), dtype=dtype) if flexible else None
        R = jnp.zeros((m + 1, m), dtype=dtype)
        cs = jnp.zeros(m, dtype=dtype)
        sn = jnp.zeros(m, dtype=dtype)
        g = jnp.zeros(m + 1, dtype=dtype).at[0].set(beta)

        def inner_cond(st):
            j, res, *_ = st
            return (j < m) & (res > thr) & (tot_it + j < max_steps)

        def inner_body(st):
            j, _, V, Z, R, cs, sn, g, aux = st
            vj = V[j]
            z, aux_j = apply_M(vj)
            aux = aux + aux_j
            w = A(z)
            # CGS2 orthogonalization: two masked (m+1, n) matmuls
            mask = (jnp.arange(m + 1) <= j).astype(dtype)
            h1 = (V @ w) * mask
            w = w - V.T @ h1
            h2 = (V @ w) * mask
            w = w - V.T @ h2
            h = h1 + h2
            hnew = _norm(w)
            V = V.at[j + 1].set(w / jnp.maximum(hnew, jnp.finfo(dtype).tiny))
            if flexible:
                Z = Z.at[j].set(z)
            h = _givens_apply(h, cs, sn, j, m)
            hj = h[j]
            denom = jnp.sqrt(hj ** 2 + hnew ** 2)
            safe = denom > 0
            c = jnp.where(safe, hj / jnp.maximum(denom, 1e-300), 1.0)
            s = jnp.where(safe, hnew / jnp.maximum(denom, 1e-300), 0.0)
            h = h.at[j].set(denom)
            cs = cs.at[j].set(c)
            sn = sn.at[j].set(s)
            gj = g[j]
            g = g.at[j].set(c * gj).at[j + 1].set(-s * gj)
            R = R.at[:, j].set(h[:m + 1])
            res = jnp.abs(g[j + 1])
            return j + 1, res, V, Z, R, cs, sn, g, aux

        j0 = jnp.int32(0)
        st = (j0, beta, V, Z, R, cs, sn, g, aux_sum)
        j, res, V, Z, R, cs, sn, g, aux_sum = lax.while_loop(
            inner_cond, inner_body, st)

        # solve the j x j triangular system (inactive rows/cols -> identity)
        active = jnp.arange(m) < j
        Rm = R[:m, :m]
        eye = jnp.eye(m, dtype=dtype)
        Rsafe = jnp.where(active[:, None] & active[None, :], Rm, eye)
        gsafe = jnp.where(active, g[:m], 0.0)
        y = jax.scipy.linalg.solve_triangular(Rsafe, gsafe, lower=False)
        y = jnp.where(active, y, 0.0)
        if flexible:
            x = x + Z.T @ y
        else:
            z, aux_f = apply_M(V[:m].T @ y)
            aux_sum = aux_sum + aux_f
            x = x + z
        return x, res, tot_it + j, aux_sum

    def outer_cond(carry):
        _, res, tot_it, _ = carry
        return (res > thr) & (tot_it < max_steps)

    x, res, tot_it, aux_sum = lax.while_loop(
        outer_cond, cycle, (x, res0, jnp.int32(0), jnp.asarray(0.0, dtype)))
    info = SolveInfo(tot_it, res, res0, res <= thr)
    if m_returns_aux:
        return x, info, aux_sum
    return x, info


def fgmres(A: Callable, b, M: Callable, x0=None, *, tol: float = 1e-10,
           reduction: float | None = None, max_steps: int = 1000,
           restart: int = 50, m_returns_aux: bool = False):
    """Flexible GMRES, right-preconditioned, restarted (deal.II SolverFGMRES
    with max_basis_size, elliptic_interface.cc:862-865).  ``M`` may be an
    inner iterative solve — it traces into the loop body.  With
    ``m_returns_aux`` the preconditioner returns (z, aux) and the summed aux
    is returned as a third output (inner-iteration accounting)."""
    return _gmres_core(A, b, M, x0, tol=tol, reduction=reduction,
                       max_steps=max_steps, restart=restart, flexible=True,
                       m_returns_aux=m_returns_aux)


def gmres(A: Callable, b, M: Optional[Callable] = None, x0=None, *,
          tol: float = 1e-10, reduction: float | None = None,
          max_steps: int = 1000, restart: int = 50):
    """Right-preconditioned restarted GMRES (deal.II SolverGMRES with
    right-preconditioning + re-orthogonalization, immersed_laplace.cc:574-577)."""
    M = M or (lambda x: x)
    return _gmres_core(A, b, M, x0, tol=tol, reduction=reduction,
                       max_steps=max_steps, restart=restart, flexible=False)
