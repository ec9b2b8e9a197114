"""Fused degree-k Chebyshev smoother kernel vs the unfused reference.

Runs the Pallas kernel in INTERPRET mode on the CPU backend (bit-level Mosaic
behavior is validated on hardware; this pins the math: halo/validity logic,
Dirichlet masking, the symmetric 5-plane patch reconstruction, and the
polynomial recurrence)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from fictitious_domain_al_preconditioners_tpu.ops.pallas_kernels import (
    fused_chebyshev_2d, stencil_factors_2d,
)
from fictitious_domain_al_preconditioners_tpu.precond.chebyshev import chebyshev


def _synthetic_patch(ny, nx, h, rng, nq=400):
    """Random symmetric Γ-band patch with the exact structure of
    ops.coupling.Coupling.patch_w9 (bilinear hats on a circle)."""
    s = rng.uniform(0, 2 * np.pi, nq)
    px = 0.4 + 0.2 * np.cos(s)
    py = 0.4 + 0.2 * np.sin(s)
    cx = np.clip((px / h).astype(int), 1, nx - 3)
    cy = np.clip((py / h).astype(int), 1, ny - 3)
    fx = px / h - cx
    fy = py / h - cy
    corners = [(0, 0), (0, 1), (1, 0), (1, 1)]
    phi = np.stack([((1 - fy) if dy == 0 else fy) *
                    ((1 - fx) if dx == 0 else fx) for dy, dx in corners],
                   axis=1)
    jxw = rng.uniform(0.5, 1.5, nq) * h
    rows = np.stack([cy + dy for dy, dx in corners], axis=1)
    cols = np.stack([cx + dx for dy, dx in corners], axis=1)
    locmat = jxw[:, None, None] * phi[:, :, None] * phi[:, None, :]
    r0, r1 = int(rows.min()), int(rows.max())
    c0, c1 = int(cols.min()), int(cols.max())
    pr, pc = r1 - r0 + 1, c1 - c0 + 1
    w9 = np.zeros((3, 3, pr, pc))
    for i in range(4):
        for j in range(4):
            dr = rows[:, j] - rows[:, i] + 1
            dc = cols[:, j] - cols[:, i] + 1
            np.add.at(w9, (dr, dc, rows[:, i] - r0, cols[:, i] - c0),
                      locmat[:, i, j])
    return (r0, c0, pr, pc), w9 * (10.0 / h)


@pytest.mark.parametrize("n,degree", [(521, 4), (521, 3), (530, 4)])
def test_fused_matches_unfused(n, degree):
    ny = nx = n
    h = 1.0 / (n - 1)
    factors = stencil_factors_2d((h, h))
    K0, M0, K1, M1 = factors
    Kc = K0[1] * M1[1] + M0[1] * K1[1]
    rng = np.random.default_rng(0)
    (r0, c0, pr, pc), w9 = _synthetic_patch(ny, nx, h, rng)

    planes = np.zeros((5, ny, nx), dtype=np.float32)
    for k, (a, b) in enumerate(((1, 1), (1, 2), (2, 1), (2, 2), (2, 0))):
        planes[k, r0:r0 + pr, c0:c0 + pc] = w9[a, b]

    w9full = np.zeros((3, 3, ny, nx), dtype=np.float32)
    w9full[:, :, r0:r0 + pr, c0:c0 + pc] = w9
    w9full_j = jnp.asarray(w9full)
    mask_np = np.zeros((ny, nx), np.float32)
    mask_np[1:-1, 1:-1] = 1.0
    mask = jnp.asarray(mask_np)
    wconst = np.outer(np.asarray(K0), np.asarray(M1)) + \
        np.outer(np.asarray(M0), np.asarray(K1))

    def ref_op(x):
        z = x * mask
        up = jnp.pad(z, 1)
        acc = None
        for a in range(3):
            for b in range(3):
                t = (float(wconst[a][b]) + w9full_j[a, b]) * \
                    lax.dynamic_slice(up, (a, b), (ny, nx))
                acc = t if acc is None else acc + t
        return mask * acc + (1 - mask) * x

    diag = np.where(mask_np > 0, Kc + w9full[1, 1], 1.0)
    dinv = jnp.asarray(np.where(mask_np > 0, 1.0 / diag, 1.0)
                       .astype(np.float32))
    lam = 1.2
    ref = chebyshev(ref_op, dinv, lam, degree=degree, eig_ratio=30.0)
    fused = fused_chebyshev_2d(factors, (ny, nx), planes,
                               (r0, c0, pr, pc), lam,
                               degree=degree, eig_ratio=30.0,
                               dtype=jnp.float32, interpret=True)
    assert fused is not None

    b = jnp.asarray(rng.standard_normal((ny, nx)).astype(np.float32))
    x_ref = np.asarray(ref(b))
    x_f = np.asarray(fused(b))
    scale = np.abs(x_ref).max()
    assert np.abs(x_f - x_ref).max() <= 2e-5 * scale

    # boundary rows carry b through the identity block — fused must agree
    np.testing.assert_allclose(x_f[0], x_ref[0], rtol=1e-5, atol=2e-6 * scale)
    np.testing.assert_allclose(x_f[:, -1], x_ref[:, -1], rtol=1e-5,
                               atol=2e-6 * scale)


def _setup_ref(n, rng_seed=0):
    ny = nx = n
    h = 1.0 / (n - 1)
    factors = stencil_factors_2d((h, h))
    K0, M0, K1, M1 = factors
    Kc = K0[1] * M1[1] + M0[1] * K1[1]
    rng = np.random.default_rng(rng_seed)
    (r0, c0, pr, pc), w9 = _synthetic_patch(ny, nx, h, rng)
    planes = np.zeros((5, ny, nx), dtype=np.float32)
    for k, (a, b) in enumerate(((1, 1), (1, 2), (2, 1), (2, 2), (2, 0))):
        planes[k, r0:r0 + pr, c0:c0 + pc] = w9[a, b]
    w9full = np.zeros((3, 3, ny, nx), dtype=np.float32)
    w9full[:, :, r0:r0 + pr, c0:c0 + pc] = w9
    w9full_j = jnp.asarray(w9full)
    mask_np = np.zeros((ny, nx), np.float32)
    mask_np[1:-1, 1:-1] = 1.0
    mask = jnp.asarray(mask_np)
    wconst = np.outer(np.asarray(K0), np.asarray(M1)) + \
        np.outer(np.asarray(M0), np.asarray(K1))

    def ref_op(x):
        z = x * mask
        up = jnp.pad(z, 1)
        acc = None
        for a in range(3):
            for b in range(3):
                t = (float(wconst[a][b]) + w9full_j[a, b]) * \
                    lax.dynamic_slice(up, (a, b), (ny, nx))
                acc = t if acc is None else acc + t
        return mask * acc + (1 - mask) * x

    diag = np.where(mask_np > 0, Kc + w9full[1, 1], 1.0)
    dinv = jnp.asarray(np.where(mask_np > 0, 1.0 / diag, 1.0)
                       .astype(np.float32))
    return factors, planes, (r0, c0, pr, pc), ref_op, dinv, rng


def test_fused_pre_mode_matches():
    """pre: one pass emitting (x, b - A x) — the V-cycle's pre-smooth +
    residual without the separate stencil apply (gmg.GMG._vcycle)."""
    n = 521
    factors, planes, box, ref_op, dinv, rng = _setup_ref(n)
    lam = 1.2
    ref = chebyshev(ref_op, dinv, lam, degree=4, eig_ratio=30.0)
    fused = fused_chebyshev_2d(factors, (n, n), planes, box, lam,
                               degree=4, eig_ratio=30.0,
                               dtype=jnp.float32, interpret=True,
                               mode="pre")
    b = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32))
    x_ref = ref(b)
    r_ref = np.asarray(b - ref_op(x_ref))
    x_f, r_f = fused(b)
    scale = np.abs(np.asarray(x_ref)).max()
    assert np.abs(np.asarray(x_f) - np.asarray(x_ref)).max() <= 2e-5 * scale
    rscale = max(np.abs(r_ref).max(), 1e-30)
    assert np.abs(np.asarray(r_f) - r_ref).max() <= 5e-5 * rscale


def test_fused_op_mode_matches():
    """op: the single-pass MASKED AUGMENTED OPERATOR APPLY b -> A b
    (constrained stiffness stencil + Γ-band AL planes in one kernel) —
    the v5e-safe replacement for the XLA patch AL form above the
    LAT_MAX_FINE gate (models.immersed_laplace._fused_aug_lat)."""
    n = 521
    factors, planes, box, ref_op, dinv, rng = _setup_ref(n)
    fused = fused_chebyshev_2d(factors, (n, n), planes, box, 1.0,
                               dtype=jnp.float32, interpret=True,
                               mode="op")
    b = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32))
    x_ref = np.asarray(ref_op(b))
    x_f = np.asarray(fused(b))
    scale = np.abs(x_ref).max()
    assert np.abs(x_f - x_ref).max() <= 2e-5 * scale
    # boundary rows/cols pass through the identity block
    np.testing.assert_allclose(np.asarray(x_f)[0], np.asarray(x_ref)[0],
                               rtol=1e-5, atol=2e-6 * scale)
    np.testing.assert_allclose(np.asarray(x_f)[:, -1],
                               np.asarray(x_ref)[:, -1],
                               rtol=1e-5, atol=2e-6 * scale)


def test_fused_post_mode_matches():
    """post: (b, x0) -> x0 + cheb(b - A x0) in one pass (the V-cycle's
    coarse-corrected post-smooth)."""
    n = 521
    factors, planes, box, ref_op, dinv, rng = _setup_ref(n)
    lam = 1.2
    ref = chebyshev(ref_op, dinv, lam, degree=4, eig_ratio=30.0)
    fused = fused_chebyshev_2d(factors, (n, n), planes, box, lam,
                               degree=4, eig_ratio=30.0,
                               dtype=jnp.float32, interpret=True,
                               mode="post")
    b = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32))
    x0 = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32))
    x_ref = np.asarray(x0 + ref(b - ref_op(x0)))
    x_f = np.asarray(fused(b, x0))
    scale = np.abs(x_ref).max()
    assert np.abs(x_f - x_ref).max() <= 5e-5 * scale


def test_fused_nopatch_matches():
    n = 521
    ny = nx = n
    h = 1.0 / (n - 1)
    factors = stencil_factors_2d((h, h))
    K0, M0, K1, M1 = factors
    Kc = K0[1] * M1[1] + M0[1] * K1[1]
    rng = np.random.default_rng(1)
    mask_np = np.zeros((ny, nx), np.float32)
    mask_np[1:-1, 1:-1] = 1.0
    mask = jnp.asarray(mask_np)
    wconst = np.outer(np.asarray(K0), np.asarray(M1)) + \
        np.outer(np.asarray(M0), np.asarray(K1))

    def ref_op(x):
        z = x * mask
        up = jnp.pad(z, 1)
        acc = None
        for a in range(3):
            for b in range(3):
                t = float(wconst[a][b]) * \
                    lax.dynamic_slice(up, (a, b), (ny, nx))
                acc = t if acc is None else acc + t
        return mask * acc + (1 - mask) * x

    dinv = jnp.asarray(np.where(mask_np > 0, 1.0 / Kc, 1.0)
                       .astype(np.float32))
    ref = chebyshev(ref_op, dinv, 1.2, degree=4, eig_ratio=30.0)
    fused = fused_chebyshev_2d(factors, (ny, nx), None, None, 1.2,
                               degree=4, eig_ratio=30.0,
                               dtype=jnp.float32, interpret=True)
    b = jnp.asarray(rng.standard_normal((ny, nx)).astype(np.float32))
    x_ref = np.asarray(ref(b))
    x_f = np.asarray(fused(b))
    assert np.abs(x_f - x_ref).max() <= 2e-5 * np.abs(x_ref).max()
