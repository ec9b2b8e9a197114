"""Geometric multigrid on the structured background grid.

TPU-native replacement for Trilinos ML-AMG (reference N9, utilities.h:304-317,
568-576, 726-733): the background is always a uniform tensor-product grid, so
coarsening is exact 2:1 grid coarsening, prolongation is FE embedding evaluated
by O(1) point location, and every level's operator is *re-discretized* —
including the AL term γ·CᵀW⁻¹C, whose per-level coupling table is rebuilt by
relocating the (fixed) immersed quadrature points in the coarser grid.  Keeping
the AL term on all levels is what preserves AMG-like iteration counts on the
augmented operator (SURVEY §7 hard part #1).

Smoother: Chebyshev with Lanczos-estimated eigenvalue bounds.  Coarse solve:
dense LU (factorized at setup).  The V-cycle is symmetric, so it is a valid CG
preconditioner.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..core.grid import GridSpace
from ..ops.krylov import lanczos_max_eig
from ..ops.linop import LinOp
from .chebyshev import chebyshev

__all__ = ["Prolongation", "build_gmg", "GMG"]


@dataclass
class Prolongation:
    """FE embedding coarse -> fine: pure gather-einsum (no scatter on the
    forward path; restriction is the scatter-add transpose)."""

    cell_dofs: jnp.ndarray  # (n_fine, nloc) coarse dofs under each fine dof
    phi: jnp.ndarray        # (n_fine, nloc) coarse basis values
    shape: tuple            # (n_fine, n_coarse)

    def mv(self, xc):
        return jnp.einsum("fa,fa->f", xc[self.cell_dofs], self.phi)

    def rmv(self, xf):
        out = jnp.zeros(self.shape[1], dtype=xf.dtype)
        return out.at[self.cell_dofs].add(self.phi * xf[:, None])

    def mv_multi(self, xc):
        """(n_coarse, k) -> (n_fine, k)."""
        return jnp.einsum("fak,fa->fk", xc[self.cell_dofs], self.phi)

    def rmv_multi(self, xf):
        out = jnp.zeros((self.shape[1], xf.shape[1]), dtype=xf.dtype)
        return out.at[self.cell_dofs].add(self.phi[:, :, None] * xf[:, None, :])


def make_prolongation(fine, coarse) -> Prolongation:
    """FE-embedding prolongation by point location + tabulation; adaptive
    (locally refined) spaces go through their folded ``tabulate_at`` so
    hanging-node constraints are built into the transfer."""
    pts = fine.dof_points
    if hasattr(coarse, "tabulate_at"):
        dofs, phi = coarse.tabulate_at(pts)
    else:
        cells, refs = coarse.grid.locate(pts)
        phi = coarse.fe.tabulate(refs)
        dofs = coarse.cell_dofs[cells]
    return Prolongation(jnp.asarray(dofs),
                        jnp.asarray(phi), (fine.n_dofs, coarse.n_dofs))


@dataclass
class LatticeProlongation:
    """Scatter-free Q1 grid transfer on the background lattice
    (parallel.lattice reshape-interleave kernels); drop-in for
    :class:`Prolongation` on Q1-continuous hierarchies."""

    fine_shape: tuple    # n_points_1d of the fine space (dof order)
    coarse_shape: tuple
    shape: tuple         # (n_fine, n_coarse)

    def mv(self, xc):
        from ..parallel.lattice import flat_to_lattice, lattice_prolong

        return lattice_prolong(
            flat_to_lattice(xc, self.coarse_shape)).reshape(-1)

    def rmv(self, xf):
        from ..parallel.lattice import flat_to_lattice, lattice_restrict

        return lattice_restrict(
            flat_to_lattice(xf, self.fine_shape)).reshape(-1)

    def mv_multi(self, xc):
        return jax.vmap(self.mv, in_axes=1, out_axes=1)(xc)

    def rmv_multi(self, xf):
        return jax.vmap(self.rmv, in_axes=1, out_axes=1)(xf)


@dataclass
class LatticeTransfer2D:
    """Lattice-RESIDENT Q1 transfer: consumes and produces lattice
    (reversed-axis) 2D arrays directly — no flat round trip.  On TPU the
    reshape between a flat dof vector and a (ny, nx) lattice with nx not
    lane-aligned (2^r + 1 never is) is a real relayout costing a full HBM
    round trip; the lattice-mode GMG keeps every level's vectors in lattice
    shape so transfers, smoothers and stencils chain relayout-free.

    ``fine_phys`` / ``coarse_phys`` (optional): physical lane-aligned padded
    shapes of the padded-lattice mode — the transfer then slices off the
    (zero) pad, interpolates on the logical lattice, and re-pads."""

    fine_lat: tuple      # (ny, nx) of the finer level
    coarse_lat: tuple
    shape: tuple         # (n_fine, n_coarse) dof counts
    fine_phys: tuple = None
    coarse_phys: tuple = None

    @staticmethod
    def _unpad(a, lat):
        return a[:lat[0], :lat[1]] if a.shape != tuple(lat) else a

    @staticmethod
    def _pad(a, phys):
        if phys is None or tuple(phys) == a.shape:
            return a
        return jnp.pad(a, ((0, phys[0] - a.shape[0]),
                           (0, phys[1] - a.shape[1])))

    def mv(self, xc2):
        from ..parallel.lattice import lattice_prolong

        return self._pad(lattice_prolong(self._unpad(xc2, self.coarse_lat)),
                         self.fine_phys)

    def rmv(self, xf2):
        from ..parallel.lattice import lattice_restrict

        return self._pad(lattice_restrict(self._unpad(xf2, self.fine_lat)),
                         self.coarse_phys)


@dataclass
class VectorProlongation:
    """Componentwise prolongation for component-major vector fields (the
    Stokes velocity block; 'vector constant modes' analog of the reference's
    AMG setup, utilities.h:304-317)."""

    scalar: Prolongation
    n_comp: int

    @property
    def shape(self):
        return (self.scalar.shape[0] * self.n_comp,
                self.scalar.shape[1] * self.n_comp)

    def mv(self, xc):
        nc = self.scalar.shape[1]
        cols = xc.reshape(self.n_comp, nc).T
        return self.scalar.mv_multi(cols).T.reshape(-1)

    def rmv(self, xf):
        nf = self.scalar.shape[0]
        cols = xf.reshape(self.n_comp, nf).T
        return self.scalar.rmv_multi(cols).T.reshape(-1)


class FusedSmoother:
    """Smoother with optionally-fused V-cycle stages.

    ``__call__(b) -> x`` is the plain sweep.  When the backing kernel
    supports it, ``pre(b) -> (x, b - A x)`` emits the pre-smoothing
    residual from the same pass and ``post(b, x0) -> x0 + cheb(b - A x0)``
    folds the coarse-grid correction's post-smooth into one pass — the
    V-cycle uses them when present and falls back to composing ``op``
    otherwise (ops.pallas_kernels.fused_chebyshev_2d modes)."""

    def __init__(self, smooth, pre=None, post=None):
        self._smooth = smooth
        self.pre = pre
        self.post = post

    def __call__(self, b):
        return self._smooth(b)


@dataclass
class _Level:
    space: GridSpace
    op: object            # traceable mv
    diag_inv: jnp.ndarray
    mask: jnp.ndarray     # free-dof mask (float 0/1)
    smoother: object      # chebyshev apply
    prolong: Prolongation | None  # from next-coarser level


class GMG:
    """V-cycle preconditioner.  ``apply(b) -> x`` is traceable.

    ``dtype`` is the V-cycle working precision: with ``jnp.bfloat16`` the
    smoother sweeps and grid transfers read/write half the HBM bytes (the
    casts fuse into the stencil loops).  A preconditioner only needs the
    accuracy of the inner tolerance it serves (1e-2 for the AL inner solves),
    so reduced precision costs no outer iterations — apply() casts back to
    the caller's dtype at the boundary."""

    def __init__(self, levels, coarse_inv, n_cycles: int = 1, dtype=None,
                 coarse_lat=None, coarse_phys=None):
        self.levels = levels
        self.coarse_inv = coarse_inv
        self.n_cycles = n_cycles
        self.dtype = dtype or levels[0].diag_inv.dtype
        # padded-lattice mode: the coarse level's logical (ny, nx) and
        # physical (py, px) shapes, when they differ
        self.coarse_lat = coarse_lat
        self.coarse_phys = coarse_phys

    def _coarse_solve(self, b):
        # precomputed dense inverse: ONE MXU matmul per V-cycle — triangular
        # lu_solve is sequential and latency-bound on TPU.  The matmul runs
        # at the inverse's (full) precision.  In lattice mode ``b`` arrives
        # lattice-shaped; the coarse level is tiny, so the flat round trip
        # here costs nothing.
        if self.coarse_phys is not None and b.shape == tuple(self.coarse_phys):
            bl = b[:self.coarse_lat[0], :self.coarse_lat[1]]
            x = (self.coarse_inv @ bl.reshape(-1).astype(
                self.coarse_inv.dtype)).astype(self.dtype)
            return jnp.pad(x.reshape(self.coarse_lat),
                           ((0, b.shape[0] - self.coarse_lat[0]),
                            (0, b.shape[1] - self.coarse_lat[1])))
        x = (self.coarse_inv @ b.reshape(-1).astype(
            self.coarse_inv.dtype)).astype(self.dtype)
        return x.reshape(b.shape)

    def _vcycle(self, li: int, b):
        level = self.levels[li]
        if li == len(self.levels) - 1:
            return self._coarse_solve(b)
        sm = level.smoother
        pre = getattr(sm, "pre", None)
        if pre is not None:
            x, r = pre(b)          # fused: residual emitted by the sweep
        else:
            x = sm(b)
            r = b - level.op(x)
        coarse = self.levels[li + 1]
        # levels[li+1].prolong maps level li+1 -> level li
        rc = (coarse.mask * coarse.prolong.rmv(r)).astype(self.dtype)
        xc = self._vcycle(li + 1, rc)
        x = x + (level.mask * coarse.prolong.mv(xc)).astype(self.dtype)
        # post-smooth on the residual equation
        post = getattr(sm, "post", None)
        if post is not None:
            x = post(b, x)         # fused: b, x0 -> x0 + cheb(b - A x0)
        else:
            x = x + sm(b - level.op(x))
        return x

    def apply(self, b):
        x = self._vcycle(0, b.astype(self.dtype))
        for _ in range(self.n_cycles - 1):
            x = x + self._vcycle(0, b.astype(self.dtype) - self.levels[0].op(x))
        return x.astype(b.dtype)

    def as_linop(self) -> LinOp:
        n = self.levels[0].space.n_dofs
        return LinOp(self.apply, (n, n), self.apply, name="GMG")


def build_gmg(fine_space: GridSpace, op_factory, *, free_mask,
              n_levels: int | None = None, min_cells: int = 4,
              smoother_degree: int = 4, eig_ratio: float = 30.0,
              n_cycles: int = 1, lanczos_steps: int = 10,
              n_comp: int = 1, dtype=None, lattice: bool = False,
              lattice_phys=None) -> GMG:
    """Build a GMG hierarchy.

    ``op_factory(space) -> (mv, diag)`` re-discretizes the (augmented)
    operator on a level space: ``mv`` traceable, ``diag`` the assembled
    diagonal *before* constraint masking.  ``free_mask`` is the fine-level
    Dirichlet mask; coarse masks are derived geometrically (same faces).
    ``n_comp > 1`` builds the vector variant (component-major fields, e.g.
    the Stokes velocity block).

    ``lattice=True`` builds the LATTICE-RESIDENT cycle for 2D Q1 lattice
    hierarchies: every level's vectors stay in lattice (ny, nx) shape —
    ``op_factory`` must return lattice->lattice applies — and transfers use
    :class:`LatticeTransfer2D`, so the whole V-cycle chains with zero
    flat<->lattice relayouts (on TPU each such reshape of a non-lane-aligned
    lattice is a full HBM round trip).  ``apply(b)`` then takes and returns
    lattice-shaped arrays; the caller reshapes once at the solve boundary.

    ``lattice_phys`` (optional, lattice mode): ``fn(space) -> (py, px) or
    None`` giving the PHYSICAL lane-aligned padded shape per level — the
    padded-lattice mode.  Level vectors are physically (py, px) with the
    logical lattice top-left and zero pad beyond; op_factory applies must
    consume/produce that physical shape (masks stay logical, pad-preserving).
    """
    def coarsenable(sp):
        if hasattr(sp, "can_coarsen"):          # adaptive quadtree space
            return sp.can_coarsen(min_cells)
        g = sp.grid
        return not (any(n % 2 != 0 for n in g.ncells)
                    or min(g.ncells) // 2 < min_cells)

    spaces = [fine_space]
    while (n_levels is None or len(spaces) < n_levels):
        if not coarsenable(spaces[-1]):
            break
        spaces.append(spaces[-1].coarse_space())

    # which boundary faces are constrained on the fine level? (inspect the
    # first component's scalar slice)
    fine_mask = np.asarray(free_mask)
    scalar_fine_mask = fine_mask[:fine_space.n_dofs]
    constrained_ids = []
    for bid in range(2 * fine_space.grid.dim):
        bd = fine_space.boundary_dof_mask([bid])
        if not scalar_fine_mask[bd].any():
            constrained_ids.append(bid)

    if lattice:
        assert n_comp == 1 and all(
            hasattr(sp, "n_points_1d") and sp.grid.dim == 2 for sp in spaces)

    levels = []
    for i, sp in enumerate(spaces):
        if i == 0:
            mask = jnp.asarray(fine_mask, dtype=bool)
        else:
            m = ~sp.boundary_dof_mask(constrained_ids) if constrained_ids \
                else np.ones(sp.n_dofs, dtype=bool)
            m = np.tile(m, n_comp)
            mask = jnp.asarray(m)
        lat = tuple(reversed(sp.n_points_1d)) if lattice else None
        latp = None
        if lattice:
            latp = lattice_phys(sp) if lattice_phys is not None else None
            if latp is not None and tuple(latp) == tuple(lat):
                latp = None
            mask = mask.reshape(lat)
            if latp is not None:   # padded-lattice: pad is never free
                mask = jnp.pad(mask, ((0, latp[0] - lat[0]),
                                      (0, latp[1] - lat[1])))
        res = op_factory(sp)
        mv_raw, diag = res[0], res[1]
        if lattice:
            diag = diag.reshape(lat)
            if latp is not None:   # pad diag with 1s (masked to identity)
                diag = jnp.pad(diag, ((0, latp[0] - lat[0]),
                                      (0, latp[1] - lat[1])),
                               constant_values=1.0)
        # optional third element: a FUSED masked apply with the exact same
        # semantics as the wrap below (m*A(m*x) + (1-m)*x) — the Pallas
        # single-pass stencil kernel on TPU lattices (ops.pallas_kernels)
        fused = res[2] if len(res) > 2 else None
        # optional fourth element: a fused SMOOTHER builder
        # ``smoother_builder(lam_max) -> apply or None`` running the whole
        # degree-k Chebyshev sweep in one Pallas pass (ops.pallas_kernels.
        # fused_chebyshev_2d); falls back to the unfused chebyshev when None
        smoother_builder = res[3] if len(res) > 3 else None
        dt = dtype or diag.dtype
        maskf = mask.astype(dt)

        if fused is not None:
            def mv(x, fused=fused, dt=dt):
                return fused(x).astype(dt)
        else:
            def mv(x, mv_raw=mv_raw, maskf=maskf, dt=dt):
                return (maskf * mv_raw(maskf * x) +
                        (1.0 - maskf) * x).astype(dt)

        diag_inv = jnp.where(mask, 1.0 / diag, 1.0).astype(dt)
        # Lanczos eigenvalue estimation needs more precision than bf16 keeps
        lanc_dt = jnp.float32 if dt == jnp.bfloat16 else dt
        if lattice:
            # setup-time only: the flat round trip here costs nothing
            def lanc_mv(v, mv=mv, di=diag_inv, lat=lat, latp=latp):
                v2 = v.reshape(lat).astype(dt)
                if latp is not None:
                    v2 = jnp.pad(v2, ((0, latp[0] - lat[0]),
                                      (0, latp[1] - lat[1])))
                w2 = di * mv(v2)
                if latp is not None:
                    w2 = w2[:lat[0], :lat[1]]
                return w2.reshape(-1).astype(lanc_dt)
        else:
            def lanc_mv(v, mv=mv, di=diag_inv):
                return (di * mv(v.astype(dt))).astype(lanc_dt)
        lam = lanczos_max_eig(
            lanc_mv, sp.n_dofs * n_comp, steps=lanczos_steps, dtype=lanc_dt)
        smoother = None
        if smoother_builder is not None:
            smoother = smoother_builder(lam, degree=smoother_degree,
                                        eig_ratio=eig_ratio)
        if smoother is None:
            smoother = chebyshev(mv, diag_inv, lam, degree=smoother_degree,
                                 eig_ratio=eig_ratio)
        if i > 0:
            finer = spaces[i - 1]
            if lattice:
                fphys = (lattice_phys(finer) if lattice_phys is not None
                         else None)
                flat_ = tuple(reversed(finer.n_points_1d))
                if fphys is not None and tuple(fphys) == flat_:
                    fphys = None
                prolong = LatticeTransfer2D(
                    flat_, lat, (finer.n_dofs, sp.n_dofs),
                    fine_phys=fphys, coarse_phys=latp)
            elif sp.fe.degree == 1 and sp.continuous and hasattr(sp, "n_points_1d"):
                prolong = LatticeProlongation(
                    finer.n_points_1d, sp.n_points_1d,
                    (finer.n_dofs, sp.n_dofs))
            else:
                prolong = make_prolongation(finer, sp)
            if n_comp > 1:
                prolong = VectorProlongation(prolong, n_comp)
        else:
            prolong = None
        levels.append(_Level(sp, mv, diag_inv, maskf, smoother, prolong))

    # coarse dense inverse (SPD + well-conditioned at coarse sizes; the
    # explicit inverse turns every V-cycle's coarse solve into one matmul).
    # Built and applied at >= f32 even when the cycle runs bf16.
    coarse = levels[-1]
    nco = coarse.space.n_dofs * n_comp
    inv_dt = jnp.float32 if levels[0].mask.dtype == jnp.bfloat16 \
        else levels[0].mask.dtype
    eye = jnp.eye(nco, dtype=levels[0].mask.dtype)
    coarse_lat = coarse_phys = None
    if lattice:
        coarse_lat = tuple(reversed(coarse.space.n_points_1d))
        coarse_phys = (lattice_phys(coarse.space)
                       if lattice_phys is not None else None)
        if coarse_phys is not None and tuple(coarse_phys) == coarse_lat:
            coarse_phys = None
        if coarse_phys is not None:
            def col_op(col):
                c2 = jnp.pad(col.reshape(coarse_lat),
                             ((0, coarse_phys[0] - coarse_lat[0]),
                              (0, coarse_phys[1] - coarse_lat[1])))
                return coarse.op(c2)[:coarse_lat[0],
                                     :coarse_lat[1]].reshape(-1)
        else:
            def col_op(col):
                return coarse.op(col.reshape(coarse_lat)).reshape(-1)
    else:
        col_op = coarse.op
    dense = jax.vmap(col_op, in_axes=1, out_axes=1)(eye)
    # invert on the HOST in f64: setup-time only, more accurate than the
    # on-device factorization, and TPU XLA implements LuDecomposition for
    # f32 only (x64 runs would fail to compile)
    inv = jnp.asarray(
        np.linalg.inv(np.asarray(dense, dtype=np.float64))).astype(inv_dt)
    return GMG(levels, inv, n_cycles=n_cycles,
               coarse_lat=coarse_lat if coarse_phys is not None else None,
               coarse_phys=coarse_phys)
