"""Pallas TPU kernels for the structured-lattice hot path.

The background Q1 operators are sums of tensor products of 1D three-point
operators (parallel.lattice).  The XLA separable implementation makes one HBM
round trip per axis pass; the Pallas kernel here fuses the full 2D 9-point
stencil into ONE pass: row bands are DMA'd from HBM into VMEM (with a 1-row
halo) and the nine shifted FMAs run on the VPU from VMEM.

Boundary rows/columns of the FEM operator differ from the interior stencil by
rank-1 corrections per axis (boundary diagonal of the 1D operators); these are
applied exactly afterwards on the 4 edge lines + corners (O(n) work).

Status: the kernel is validated (bit-identical modulo fp reassociation to the
separable reference, and benchmarked on a v5e) but the XLA separable path is
currently the production default — measured equal-or-faster at feasible sizes
because XLA fuses the axis passes; the Pallas path is kept for future fusion
of whole smoother sweeps (multiple stencil applications per HBM round trip).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["SeparableStencil2D", "laplace_stencil_2d"]


def _conv9_pallas(up, ny, nx, w):
    """9-point stencil of the zero-padded (ny+2, nx+2) input ``up`` ->
    (ny, nx).  Row-band grid; each band DMAs its tile + halo to VMEM."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T = 256
    BAND = T + 8            # DMA band height: sublane-aligned (multiple of 8)
    nbands = -(-ny // T)
    ny_pad = nbands * T
    # rows: ny_pad + halo top(1, already in up) + enough bottom slack for the
    # last band's BAND-row DMA; cols: round up to the 128-lane tile
    W = -(-(nx + 2) // 128) * 128
    up = jnp.pad(up, ((0, ny_pad + BAND - (up.shape[0] - 1)),
                      (0, W - up.shape[1])))

    w_flat = [float(w[di][dj]) for di in range(3) for dj in range(3)]

    def kernel(u_hbm, out_ref):
        i = pl.program_id(0)

        def body(scratch, sem):
            cp = pltpu.make_async_copy(
                u_hbm.at[pl.ds(i * T, BAND), :], scratch, sem)
            cp.start()
            cp.wait()
            acc = None
            idx = 0
            for di in range(3):
                for dj in range(3):
                    term = w_flat[idx] * scratch[di:di + T, dj:dj + nx]
                    acc = term if acc is None else acc + term
                    idx += 1
            out_ref[:] = acc

        pl.run_scoped(body,
                      scratch=pltpu.VMEM((BAND, W), up.dtype),
                      sem=pltpu.SemaphoreType.DMA(()))

    out = pl.pallas_call(
        kernel,
        grid=(nbands,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],  # stay in HBM; bands are DMA'd
        out_specs=pl.BlockSpec((T, nx), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ny_pad, nx), up.dtype),
    )(up)
    return out[:ny]


def _conv9_xla(up, ny, nx, w):
    """Same 9-point stencil with jnp shifts (fallback / CPU tests)."""
    acc = None
    for di in range(3):
        for dj in range(3):
            term = w[di][dj] * jax.lax.dynamic_slice(up, (di, dj), (ny, nx))
            acc = term if acc is None else acc + term
    return acc


def _line_stencil(v, off, diag, axis):
    """3-point Toeplitz stencil with zero ends along ``axis`` of a 1D/2D array."""
    v = jnp.moveaxis(jnp.atleast_2d(v), axis, 0)
    pad = jnp.zeros_like(v[:1])
    out = diag * v + off * (jnp.concatenate([pad, v[:-1]], 0) +
                            jnp.concatenate([v[1:], pad], 0))
    return jnp.moveaxis(out, 0, axis)


class SeparableStencil2D:
    """A = Σ_k  P_k ⊗ Q_k  of 1D three-point operators, applied as one fused
    9-point pass + exact boundary corrections.

    Each 1D operator is (off, diag, bdiag): Toeplitz(off, diag, off) with the
    first/last diagonal replaced by bdiag.  Rank-1 boundary parts E = (bdiag -
    diag)(e₀e₀ᵀ + eₙeₙᵀ) generate the edge/corner corrections.
    """

    def __init__(self, pairs):
        self.pairs = pairs  # [((off,diag,bdiag) axis0, (…) axis1), …]
        w = np.zeros((3, 3))
        for (p0, p1) in pairs:
            s0 = np.array([p0[0], p0[1], p0[0]])
            s1 = np.array([p1[0], p1[1], p1[0]])
            w += np.outer(s0, s1)
        self.w = w

    def __call__(self, u, use_pallas: bool | None = None):
        ny, nx = u.shape
        up = jnp.pad(u, 1)
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        conv = (_conv9_pallas if use_pallas else _conv9_xla)(up, ny, nx, self.w)

        # boundary corrections: for each pair (P0, P1),
        #   E0 ⊗ T1 acts on the first/last ROWS with T1 along axis 1,
        #   T0 ⊗ E1 acts on the first/last COLS with T0 along axis 0,
        #   E0 ⊗ E1 acts on the 4 corners.
        out = conv
        row_line = jnp.zeros((2, nx), dtype=u.dtype)   # rows 0, ny-1
        col_line = jnp.zeros((ny, 2), dtype=u.dtype)   # cols 0, nx-1
        corner = 0.0
        rows = jnp.stack([u[0], u[-1]])                # (2, nx)
        cols = jnp.stack([u[:, 0], u[:, -1]], axis=1)  # (ny, 2)
        for (p0, p1) in self.pairs:
            c0 = p0[2] - p0[1]  # bdiag - diag
            c1 = p1[2] - p1[1]
            row_line = row_line + c0 * _line_stencil(rows, p1[0], p1[1], 1)
            col_line = col_line + c1 * _line_stencil(cols, p0[0], p0[1], 0)
            corner = corner + c0 * c1
        out = out.at[0].add(row_line[0]).at[-1].add(row_line[1])
        out = out.at[:, 0].add(col_line[:, 0]).at[:, -1].add(col_line[:, 1])
        crn = corner * jnp.stack([u[0, 0], u[0, -1], u[-1, 0], u[-1, -1]])
        out = out.at[0, 0].add(crn[0]).at[0, -1].add(crn[1])
        out = out.at[-1, 0].add(crn[2]).at[-1, -1].add(crn[3])
        return out


@functools.lru_cache(maxsize=None)
def laplace_stencil_2d(h0: float, h1: float) -> SeparableStencil2D:
    """Fused 2D Q1 Laplace: K₀⊗M₁ + M₀⊗K₁ (lattice axis order)."""
    K0 = (-1.0 / h0, 2.0 / h0, 1.0 / h0)
    M0 = (h0 / 6.0, 2.0 * h0 / 3.0, h0 / 3.0)
    K1 = (-1.0 / h1, 2.0 / h1, 1.0 / h1)
    M1 = (h1 / 6.0, 2.0 * h1 / 3.0, h1 / 3.0)
    return SeparableStencil2D([(K0, M1), (M0, K1)])


# ---------------------------------------------------------------------------
# Fused Dirichlet-masked 9-point stencil (the production hot-path kernel)
# ---------------------------------------------------------------------------
#
# The augmented solve's innermost op is the CONSTRAINED stiffness apply
#
#     out = m ⊙ conv9(m ⊙ u) + (1 - m) ⊙ u,    m = interior mask
#
# (ops.operators.constrain / the GMG level mask wrap).  The separable XLA
# implementation makes ~10 HBM round trips per apply (axis passes + mask
# wheres; 38 GB/s effective at 16.8M dofs on v5e), and XLA does NOT fuse
# shifted slices into one loop (measured: the 9-slice form is no faster).
# This Pallas kernel does the whole thing in ONE read + ONE write: the grid
# streams T-row bands through VMEM; the 1-row halo comes from two extra
# 8-row block views of the same input (block-granular index maps, no manual
# DMA — Mosaic's pipeline double-buffers all three streams), stitched with
# sublane rolls; column neighbors are lane rolls; Dirichlet masking folds
# into the same pass.  Measured 5.7x the separable form at 4097^2 f32.

MASKED_STENCIL_MIN_ROWS = 64  # below this the XLA fallback wins (setup cost)


def force_xla_kernels() -> bool:
    """When set (env FDAL_FORCE_XLA_KERNELS=1), every builder in this module
    returns its XLA form (masked_laplace_2d) or None (fused_chebyshev_2d) —
    used to build the lattice-resident ALL-XLA composition that survives the
    v5e runtime fault at fine lattices > LAT_MAX_FINE (PARITY.md: any Pallas
    kernel inside the composed CG-while + GMG at 4097² kills the worker;
    the identical program with all kernels in XLA form passes)."""
    import os

    return os.environ.get("FDAL_FORCE_XLA_KERNELS", "0") == "1"


def _masked_conv9_pallas(factors, ny: int, nx: int, dtype, T: int = 256,
                         phys=None):
    """``factors = (K0, M0, K1, M1)``: symmetric 3-point 1D operators of the
    tensor-product stencil K0⊗M1 + M0⊗K1.  The separable common-subexpression
    evaluation (2 vertical combinations, then 4 lane shifts) measures at the
    pipeline's copy speed — the 9-term direct form costs ~35% more.

    ``phys = (py, px)`` (optional): the arrays are physically (py, px) with
    the logical (ny, nx) lattice in the top-left corner and ZERO pad beyond —
    the lane-aligned padded-lattice mode (px a multiple of 128, py of the
    sublane tile).  All masks stay logical; pad rows/columns pass through the
    identity branch, so zero pad stays zero."""
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import jax.numpy as jnp_

    py, px = (int(phys[0]), int(phys[1])) if phys is not None else (ny, nx)
    H = 16 if dtype == jnp_.bfloat16 else 8   # halo rows = sublane tile
    T = min(T, max(H, (py // H) * H))
    nb = -(-py // T)
    nhb = -(-py // H)
    K0, M0, K1, M1 = [[float(v) for v in f] for f in factors]

    # bf16 is a STORAGE dtype only: Mosaic has no sub-32-bit rotates, so
    # all in-register arithmetic runs f32 (HBM traffic stays bf16-sized)
    cd = jnp.float32 if dtype == jnp_.bfloat16 else dtype

    def kernel(mid_ref, up_ref, dn_ref, out_ref):
        i = pl.program_id(0)
        g0 = i * T
        mid = mid_ref[:, :].astype(cd)

        rows = g0 + lax.broadcasted_iota(jnp.int32, (T, px), 0)
        cols = lax.broadcasted_iota(jnp.int32, (T, px), 1)
        in_row = (rows >= 1) & (rows <= ny - 2)
        in_col = (cols >= 1) & (cols <= nx - 2)
        inmask = (in_row & in_col).astype(cd)

        m_mid = mid * inmask
        # halo rows (global rows g0-1 / g0+T), input-masked like the interior
        one = jnp.ones((), cd)
        zero = jnp.zeros((), cd)
        up_row = up_ref[H - 1, :].astype(cd) * jnp.where(g0 - 1 >= 1, one, zero)
        dn_row = dn_ref[0, :].astype(cd) * jnp.where(g0 + T <= ny - 2, one, zero)
        ccol = lax.broadcasted_iota(jnp.int32, (1, px), 1)
        cmask = ((ccol >= 1) & (ccol <= nx - 2)).astype(cd)[0]
        up_row = up_row * cmask
        dn_row = dn_row * cmask

        # halo stitching by sublane concatenation (bf16-safe: Mosaic has no
        # bf16 sublane rotate on this target)
        r_up = jnp.concatenate([up_row[None, :], m_mid[:T - 1, :]], axis=0)
        r_dn = jnp.concatenate([m_mid[1:, :], dn_row[None, :]], axis=0)

        vsum = r_up + r_dn
        sk = K0[0] * vsum + K0[1] * m_mid
        sm = M0[0] * vsum + M0[1] * m_mid
        skl = pltpu.roll(sk, 1, 1)
        skr = pltpu.roll(sk, px - 1, 1)
        sml = pltpu.roll(sm, 1, 1)
        smr = pltpu.roll(sm, px - 1, 1)
        acc = (M1[1] * sk + M1[0] * (skl + skr) +
               K1[1] * sm + K1[0] * (sml + smr))
        out_ref[:, :] = jnp.where(in_row & in_col, acc, mid).astype(dtype)

    def apply(u):
        return pl.pallas_call(
            kernel,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((T, px), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((H, px),
                             lambda i: (jnp.maximum(i * (T // H) - 1, 0), 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((H, px),
                             lambda i: (jnp.minimum(i * (T // H) + T // H,
                                                    nhb - 1), 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((T, px), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((py, px), dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(u, u, u)

    return apply


def _masked_conv9_xla(w, ny: int, nx: int, dtype, phys=None):
    """Reference/CPU form: identical semantics, XLA shifts + wheres."""
    import jax.numpy as jnp

    py, px = (int(phys[0]), int(phys[1])) if phys is not None else (ny, nx)
    wj = [[jnp.asarray(w[a][b], dtype) for b in range(3)] for a in range(3)]

    def apply(u):
        m = jnp.zeros((py, px), u.dtype).at[1:ny - 1, 1:nx - 1].set(1.0)
        um = u * m
        up = jnp.pad(um, 1)
        acc = None
        for di in range(3):
            for dj in range(3):
                t = wj[di][dj].astype(u.dtype) * \
                    jax.lax.dynamic_slice(up, (di, dj), (py, px))
                acc = t if acc is None else acc + t
        return m * acc + (1 - m) * u

    return apply


def stencil_factors_2d(h):
    """(K0, M0, K1, M1) 1D factors of the Q1 Laplace tensor-product stencil
    K0⊗M1 + M0⊗K1 for per-lattice-axis cell sizes ``h``."""
    h0, h1 = float(h[0]), float(h[1])
    K0 = np.array([-1.0 / h0, 2.0 / h0, -1.0 / h0])
    M0 = np.array([h0 / 6.0, 2.0 * h0 / 3.0, h0 / 6.0])
    K1 = np.array([-1.0 / h1, 2.0 / h1, -1.0 / h1])
    M1 = np.array([h1 / 6.0, 2.0 * h1 / 3.0, h1 / 6.0])
    return K0, M0, K1, M1


def masked_laplace_2d(h, shape, dtype=None, phys=None):
    """Constrained Q1 stiffness apply on an (ny, nx) lattice (lattice axis
    order): ``m*K(m*u) + (1-m)*u`` with ``m`` the all-sides-Dirichlet interior
    mask.  Pallas fused kernel on TPU; XLA fallback elsewhere.  ``h`` is the
    per-lattice-axis cell size.  ``phys = (py, px)`` (optional) runs on
    lane-aligned zero-padded arrays with the logical lattice top-left (see
    :func:`_masked_conv9_pallas`)."""
    import jax.numpy as jnp

    ny, nx = int(shape[0]), int(shape[1])
    K0, M0, K1, M1 = stencil_factors_2d(h)
    w = np.outer(K0, M1) + np.outer(M0, K1)
    dtype = dtype or jnp.zeros(0).dtype
    if (jax.default_backend() == "tpu" and ny >= MASKED_STENCIL_MIN_ROWS
            and not force_xla_kernels()):
        return _masked_conv9_pallas((K0, M0, K1, M1), ny, nx, dtype,
                                    phys=phys)
    return _masked_conv9_xla(w, ny, nx, dtype, phys=phys)


# ---------------------------------------------------------------------------
# Fused degree-k Chebyshev smoother (whole GMG smoother sweep in ONE pass)
# ---------------------------------------------------------------------------
#
# The GMG smoother is where the solve's HBM bytes go: a degree-k Chebyshev
# sweep on the augmented operator makes k masked stencil applies + k AL
# Γ-band patch applies + ~5k elementwise vector passes, each a full HBM round
# trip (~2.8 GB per sweep at 16.8M dofs).  This kernel runs the ENTIRE
# recurrence
#
#     x₀ = D⁻¹b/θ;  p₀ = x₀
#     for j = 1..k-1:  r = b − op(x);  p = (ρ'ρ)p + (2ρ'/δ)D⁻¹r;  x += p
#     op(x) = m ⊙ (conv9(m ⊙ x) + patch(m ⊙ x)) + (1−m) ⊙ x
#
# per VMEM-resident band: bands of T output rows stream through VMEM with an
# 8-row halo (validity shrinks one row per application, so halo ≥ degree−1),
# the Γ-band patch coefficients are loaded ONCE per band and reused by all k
# applications, and D⁻¹ is derived in-register from the stencil center +
# patch center (diag = Kc + w_c on free dofs) — no diagonal plane input.
# Traffic per sweep: read b + 5 patch planes + write x ≈ 7 lattice planes,
# vs ~40+ for the unfused sweep (VERDICT r2 #2).
#
# The 9 patch coefficient planes compress to 5 by symmetry of the AL local
# matrices (w_{−e}[q] = w_e[q−e]): for the four "positive" offsets
# e ∈ {(0,1),(1,0),(1,1),(1,−1)},
#
#     patch(z) = w_c·z + Σ_e ( w_e·shift_{−e}(z) + shift_{+e}(w_e·z) ),
#
# i.e. the mirrored-offset term is a shifted read of the UNSHIFTED product.

import os as _os

FUSED_CHEB_MIN_ROWS = int(_os.environ.get(
    "FDAL_FUSED_CHEB_MIN_ROWS", "512"))   # below: unfused XLA smoother wins


def _cheb_scalars(lam_max: float, degree: int, eig_ratio: float,
                  lam_max_safety: float = 1.1):
    """Per-step Chebyshev coefficients (a_j, c_j) with p ← a_j p + c_j D⁻¹r,
    precomputed host-side from the (concrete) Lanczos bound — mirrors
    precond.chebyshev.chebyshev exactly."""
    lmax = float(lam_max) * lam_max_safety
    lmin = float(lam_max) / eig_ratio
    theta = 0.5 * (lmax + lmin)
    delta = 0.5 * (lmax - lmin)
    sigma1 = theta / delta
    rho = 1.0 / sigma1
    coeffs = []
    for _ in range(degree - 1):
        rho_new = 1.0 / (2.0 * sigma1 - rho)
        coeffs.append((rho_new * rho, 2.0 * rho_new / delta))
        rho = rho_new
    return theta, coeffs


def fused_chebyshev_2d(factors, shape, planes, patch_box, lam_max,
                       *, degree: int = 4, eig_ratio: float = 30.0,
                       dtype=None, T: int | None = None,
                       interpret: bool = False, mode: str = "smooth",
                       phys=None):
    """Build the fused smoother apply ``b -> x`` for the Dirichlet-masked
    augmented lattice operator.

    ``mode`` selects the V-cycle stage fused into the pass (each extra
    operator application costs one halo row of validity; H=8 covers
    degree 4 + one residual):

    - ``"smooth"``: ``b -> x``                       (plain sweep)
    - ``"pre"``:    ``b -> (x, b - A x)``            (pre-smooth + residual:
      the V-cycle's next step reads the residual straight from this pass
      instead of paying a separate stencil apply + subtraction round trip)
    - ``"post"``:   ``(b, x0) -> x0 + cheb(b - A x0)`` (coarse-corrected
      iterate in, post-smoothed iterate out, one pass)

    ``factors = (K0, M0, K1, M1)`` 1D stencil factors as in
    :func:`masked_laplace_2d`; ``shape = (ny, nx)`` lattice (reversed-axis)
    order; ``planes``: None or the symmetric patch planes, a float32 array
    (5, ny, nx) [order: center, (0,1), (1,0), (1,1), (1,-1)] zero outside the
    Γ-band; ``patch_box = (r0, c0, pr, pc)`` the band's bounding box.
    ``lam_max``: CONCRETE Lanczos bound of D⁻¹A (host scalar at build time).
    ``phys = (py, px)`` (optional): arrays are physically (py, px),
    lane-aligned, logical lattice top-left, zero pad beyond (masks stay
    logical; pad stays zero through the recurrence since b's pad is zero and
    non-interior points take the identity branch).

    Banded plane access: the planes are stored column-windowed to the
    lane-aligned patch box, and their row-block index maps are CLAMPED to the
    patch rows — Mosaic skips the DMA when a block index repeats, so bands
    outside the Γ-band fetch no plane bytes.  In-kernel, patch arithmetic
    runs on the window and is embedded into the full row by aligned concat.

    Returns None when not applicable (off-TPU, tiny lattice).
    """
    import jax.numpy as jnp_

    ny, nx = int(shape[0]), int(shape[1])
    py, px = (int(phys[0]), int(phys[1])) if phys is not None else (ny, nx)
    if not interpret and (jax.default_backend() != "tpu"
                          or ny < FUSED_CHEB_MIN_ROWS
                          or force_xla_kernels()):
        return None
    # Band height: 96 keeps the WHOLE program's resident Pallas footprint
    # (this kernel at every GMG level + the single-apply stencil kernels,
    # whose pipeline buffers and spill temporaries coexist in VMEM) under
    # the v5e limit at fine lattices up to 4097.  T=128 compiles and runs
    # standalone at 4097 but the composed ref-12 solve faults the runtime
    # (reproduced: any T=128 instance in that program, even only at coarse
    # levels, faults; T<=96 everywhere is clean).  Root cause: VMEM
    # oversubscription across kernels, not a kernel bug.
    if T is None:
        T = int(_os.environ.get("FDAL_FUSED_CHEB_T", "96"))
    dtype = dtype or jnp.zeros(0).dtype
    if dtype == jnp_.bfloat16:
        return None  # f32 in-register math; bf16 cycle keeps unfused path

    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert mode in ("smooth", "pre", "post", "op"), mode
    H = 8
    # validity budget: each op application shrinks the extended band by one
    # row per side; the sweep applies op degree-1 times, pre/post add one.
    # mode="op" is the single AUGMENTED OPERATOR APPLY b -> A b (masked
    # stencil + Γ-band planes in one pass): the v5e-safe replacement for
    # the XLA patch-slice AL form, which faults the runtime when composed
    # into the CG while_loop at fine lattices > 4096 (exp5 bisection,
    # PARITY.md round 4).
    n_ops = 1 if mode == "op" else (degree - 1) + (mode != "smooth")
    if n_ops > H:
        return None
    T = min(T, max(H, (py // H) * H))
    nb = -(-py // T)
    nhb = -(-py // H)
    K0, M0, K1, M1 = [[float(v) for v in f] for f in factors]
    Kc = K0[1] * M1[1] + M0[1] * K1[1]   # constant interior stencil center
    theta, coeffs = ((1.0, []) if mode == "op"
                     else _cheb_scalars(lam_max, degree, eig_ratio))
    have_patch = planes is not None
    if have_patch:
        r0, c0, pr, pc = [int(v) for v in patch_box]
        # lane-aligned column window [c0a, c1a) covering the patch ± 1 column
        # (shifted reads); plane values are zero at the window edge columns,
        # which keeps lane-roll wraparound harmless
        c0a = max(0, ((c0 - 1) // 128) * 128)
        c1a = min(px, -(-(c0 + pc + 1) // 128) * 128)
        PW = c1a - c0a
        # the 5 column-windowed planes are stacked along columns into ONE
        # (py, 5*PW) array so each grid step issues 3 plane DMAs (mid/up/dn)
        # instead of 15 — the 22-ref post-mode pipeline hung the v5e runtime
        # at fine lattices >= 1025 (DMA pipeline pressure), and fewer refs is
        # strictly simpler for every mode.  PW is lane-aligned (multiple of
        # 128), so the in-kernel window slices stay aligned.
        planes_np = np.asarray(planes)
        if (py, px) != (ny, nx):
            planes_np = np.pad(planes_np,
                               ((0, 0), (0, py - ny), (0, px - nx)))
        planes_w = jnp.asarray(
            np.concatenate(list(planes_np[:, :, c0a:c1a]), axis=1), dtype)
        # clamped block-index ranges (row-banded plane fetches)
        mlo, mhi = r0 // T, (r0 + pr - 1) // T
        hlo, hhi = r0 // H, (r0 + pr - 1) // H

    E = T + 2 * H  # extended working height

    def shift_rows(a, dr, fill=None):
        """Rows shifted by dr within the extended array (zero fill)."""
        z = jnp.zeros_like(a[:1]) if fill is None else fill
        if dr == 1:     # out[r] = a[r-1]
            return jnp.concatenate([z, a[:-1]], axis=0)
        if dr == -1:    # out[r] = a[r+1]
            return jnp.concatenate([a[1:], z], axis=0)
        return a

    def shift_cols(a, dc, width):
        if dc == 1:
            return pltpu.roll(a, 1, 1)
        if dc == -1:
            return pltpu.roll(a, width - 1, 1)
        return a

    pb = 6 if mode == "post" else 3   # plane refs base offset

    def kernel(*refs):
        # refs: b_mid, b_up, b_dn, [x_mid, x_up, x_dn if post],
        #       [pw_mid, pw_up, pw_dn] (5 planes column-stacked),
        #       out, [r_out if pre]
        b_mid, b_up, b_dn = refs[0], refs[1], refs[2]
        out_ref = refs[-2] if mode == "pre" else refs[-1]
        i = pl.program_id(0)
        g0 = i * T

        # extended b: rows [g0-H, g0+T+H)
        b_ext = jnp.concatenate(
            [b_up[:, :], b_mid[:, :], b_dn[:, :]], axis=0).astype(jnp.float32)

        rows = (g0 - H) + lax.broadcasted_iota(jnp.int32, (E, px), 0)
        cols = lax.broadcasted_iota(jnp.int32, (E, px), 1)
        inm = ((rows >= 1) & (rows <= ny - 2) &
               (cols >= 1) & (cols <= nx - 2))
        # rows of the last partial band beyond ny are Pallas block padding and
        # may read garbage — zero them with where (NOT multiply: 0*NaN = NaN)
        # so padding cannot contaminate interior rows through the stencil
        # shifts.  Real boundary rows keep their b values (identity block).
        in_rows = (rows >= 0) & (rows < ny)
        b_ext = jnp.where(in_rows, b_ext, 0.0)
        inmf = inm.astype(jnp.float32)

        if mode == "post":
            x0_ext = jnp.concatenate(
                [refs[4][:, :], refs[3][:, :], refs[5][:, :]],
                axis=0).astype(jnp.float32)
            x0_ext = jnp.where(in_rows, x0_ext, 0.0)

        if have_patch:
            # order matches b_ext: UP halo block, then mid, then DOWN halo.
            # The fetched blocks are only meaningful on patch rows (clamped
            # index maps fetch in-patch blocks for out-of-patch bands): mask
            # by the true plane-row range — the true values there are zero.
            # fresh iota (slicing the lane-replicated `rows` iota hits an
            # unimplemented extract_strided_slice layout case in Mosaic)
            rows_w = (g0 - H) + lax.broadcasted_iota(
                jnp.int32, (E, 5 * PW), 0)
            prow = (rows_w >= r0) & (rows_w <= r0 + pr - 1)
            pw_all = jnp.where(prow, jnp.concatenate(
                [refs[pb + 1][:, :], refs[pb][:, :], refs[pb + 2][:, :]],
                axis=0).astype(jnp.float32), 0.0)
            pe = [pw_all[:, k * PW:(k + 1) * PW] for k in range(5)]
            # zero-width segments crash Mosaic ("vector types must have
            # positive constant sizes") — drop them from the concat
            zleft = jnp.zeros((E, c0a), jnp.float32) if c0a else None
            zright = (jnp.zeros((E, px - c1a), jnp.float32)
                      if px - c1a else None)

            def embed(aw):
                parts = [p for p in (zleft, aw, zright) if p is not None]
                if len(parts) == 1:
                    return aw
                return jnp.concatenate(parts, axis=1)

            w_c = embed(pe[0])
        else:
            w_c = 0.0

        dinv = jnp.where(inm, 1.0 / (Kc + w_c), 1.0)

        def op(x):
            z = x * inmf
            # constant-coefficient tensor-product stencil (separable CSE)
            vsum = shift_rows(z, 1) + shift_rows(z, -1)
            sk = K0[0] * vsum + K0[1] * z
            sm = M0[0] * vsum + M0[1] * z
            acc = (M1[1] * sk + M1[0] * (shift_cols(sk, 1, px) +
                                         shift_cols(sk, -1, px)) +
                   K1[1] * sm + K1[0] * (shift_cols(sm, 1, px) +
                                         shift_cols(sm, -1, px)))
            if have_patch:
                # symmetric reconstruction on the column window: the direct
                # term is W_e[p]·z[p+e]; the mirrored offset is
                # W_{−e}[p]·z[p−e] = (W_e·z)[p−e], a shifted read of the
                # UNSHIFTED product (W_{−e}[q] = W_e[q−e] by symmetry of the
                # AL local matrices).  Lane-roll wrap is harmless: planes are
                # zero at the window edge columns.
                zw = z[:, c0a:c1a]
                accw = pe[0] * zw
                for k, (dr, dc) in enumerate(((0, 1), (1, 0), (1, 1),
                                              (1, -1)), start=1):
                    accw = (accw +
                            pe[k] * shift_cols(shift_rows(zw, -dr), -dc, PW) +
                            shift_cols(shift_rows(pe[k] * zw, dr), dc, PW))
                acc = acc + embed(accw)
            return jnp.where(inm, acc, x)

        if mode == "op":
            out_ref[:, :] = op(b_ext)[H:H + T, :].astype(dtype)
            return

        rhs = b_ext if mode != "post" else b_ext - op(x0_ext)
        x = dinv * rhs * (1.0 / theta)
        p = x
        for (a_j, c_j) in coeffs:
            r = rhs - op(x)
            p = a_j * p + c_j * (dinv * r)
            x = x + p
        if mode == "post":
            x = x0_ext + x
        out_ref[:, :] = x[H:H + T, :].astype(dtype)
        if mode == "pre":
            res = b_ext - op(x)
            refs[-1][:, :] = res[H:H + T, :].astype(dtype)

    def mid_spec():
        return pl.BlockSpec((T, px), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def up_spec():
        return pl.BlockSpec((H, px),
                            lambda i: (jnp.maximum(i * (T // H) - 1, 0), 0),
                            memory_space=pltpu.VMEM)

    def dn_spec():
        return pl.BlockSpec((H, px),
                            lambda i: (jnp.minimum(i * (T // H) + T // H,
                                                   nhb - 1), 0),
                            memory_space=pltpu.VMEM)

    in_specs = [mid_spec(), up_spec(), dn_spec()]
    if mode == "post":
        in_specs += [mid_spec(), up_spec(), dn_spec()]
    if have_patch:
        def pw_mid():
            return pl.BlockSpec((T, 5 * PW),
                                lambda i: (jnp.clip(i, mlo, mhi), 0),
                                memory_space=pltpu.VMEM)

        def pw_up():
            return pl.BlockSpec(
                (H, 5 * PW),
                lambda i: (jnp.clip(jnp.maximum(i * (T // H) - 1, 0),
                                    hlo, hhi), 0),
                memory_space=pltpu.VMEM)

        def pw_dn():
            return pl.BlockSpec(
                (H, 5 * PW),
                lambda i: (jnp.clip(jnp.minimum(i * (T // H) + T // H,
                                                nhb - 1), hlo, hhi), 0),
                memory_space=pltpu.VMEM)

        in_specs += [pw_mid(), pw_up(), pw_dn()]

    o_spec = pl.BlockSpec((T, px), lambda i: (i, 0), memory_space=pltpu.VMEM)
    o_shape = jax.ShapeDtypeStruct((py, px), dtype)
    call = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=[o_spec, o_spec] if mode == "pre" else o_spec,
        out_shape=[o_shape, o_shape] if mode == "pre" else o_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )

    def plane_args():
        if have_patch:
            return [planes_w, planes_w, planes_w]
        return []

    if mode == "post":
        def apply(b, x0):
            return call(b, b, b, x0, x0, x0, *plane_args())
    else:
        def apply(b):
            return call(b, b, b, *plane_args())

    return apply
