"""Structured-lattice (tensor-product) background operators.

The TPU fast path: a Q1 field on the uniform background grid is a dense
lattice array; mass and stiffness apply as separable 1D three-point operators
along each axis (K = K₁⊗M₁ + M₁⊗K₁, M = M₁⊗M₁), implemented with shifts +
fused multiply-adds — no gather/scatter at all.  Under ``jax.sharding`` domain
decomposition the shifts become nearest-neighbor halo exchanges inserted by
XLA SPMD (`ppermute` over ICI): this is the deal.II/Trilinos-MPI replacement
(reference N15) in its natural TPU form.

Layout convention: lattice axis order is REVERSED relative to the dof index
(axis 0 = slowest coordinate), so a flat dof vector (first coordinate fastest,
core.grid numbering) converts to/from the lattice with a *zero-cost reshape* —
no transposes anywhere on the hot path.

1D reference matrices (Q1, cell size h): interior diag 2h/3 (mass) / 2/h
(stiffness); boundary diag h/3 / 1/h; off-diagonals h/6 / -1/h — boundary rows
are fixed up on two slices after the stencil pass, so Neumann-truncated rows
are exact.  Q1 grid-transfer (prolongation = linear interpolation,
restriction = its adjoint) is reshape-interleave based — the multigrid
transfer operators also run scatter-free.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
from jax import lax

from ..core.grid import GridSpace

__all__ = ["LatticeOps", "to_lattice", "to_flat", "flat_to_lattice",
           "lattice_prolong", "lattice_restrict"]


def _shift(v, s):
    """Shift along axis 0 with zero fill: (_shift(v,+1))[i] = v[i-1]."""
    pad = jnp.zeros_like(v[:1])
    if s == 1:
        return jnp.concatenate([pad, v[:-1]], axis=0)
    return jnp.concatenate([v[1:], pad], axis=0)


def _axis_slice(u, ax, start, stop, step=1):
    idx = tuple(slice(None) if i != ax else slice(start, stop, step)
                for i in range(u.ndim))
    return u[idx]


@dataclass(frozen=True)
class LatticeOps:
    """Separable mass/stiffness applies for a Q1 GridSpace.

    ``shape``/``h`` are in LATTICE axis order (reversed coordinates).
    ``padded`` (optional) is a physical array shape >= ``shape``; lattice
    arrays are zero-padded to it so every axis is divisible by the device
    mesh.  Stencil passes mask the pad region back to zero.
    """

    h: tuple            # cell size per lattice axis
    shape: tuple        # true lattice points per axis
    padded: tuple = None

    @classmethod
    def for_space(cls, space: GridSpace, padded: tuple | None = None) -> "LatticeOps":
        """``padded`` is given in dof (coordinate) order and reversed here."""
        assert space.fe.degree == 1 and space.continuous, \
            "lattice fast path is Q1-continuous only"
        return cls(tuple(float(x) for x in reversed(space.grid.h)),
                   tuple(reversed(space.n_points_1d)),
                   tuple(reversed(padded)) if padded is not None else None)

    @property
    def dof_shape(self) -> tuple:
        return tuple(reversed(self.shape))

    def _mask_pad(self, u):
        if self.padded is None or tuple(self.padded) == tuple(self.shape):
            return u
        m = jnp.ones((), u.dtype)
        for ax, (n, np_) in enumerate(zip(self.shape, self.padded)):
            shp = [1] * u.ndim
            shp[ax] = np_
            m = m * (jnp.arange(np_) < n).astype(u.dtype).reshape(shp)
        return u * m

    def _axis_apply_n(self, u, axis, off, diag, bdiag):
        n = self.shape[axis]
        v = jnp.moveaxis(u, axis, 0)
        out = diag * v + off * (_shift(v, 1) + _shift(v, -1))
        corr = diag - bdiag
        out = out.at[0].add(-corr * v[0])
        out = out.at[n - 1].add(-corr * v[n - 1])
        return jnp.moveaxis(out, 0, axis)

    def _mass_axis(self, u, axis):
        h = self.h[axis]
        return self._axis_apply_n(u, axis, h / 6.0, 2.0 * h / 3.0, h / 3.0)

    def _stiff_axis(self, u, axis):
        h = self.h[axis]
        return self._axis_apply_n(u, axis, -1.0 / h, 2.0 / h, 1.0 / h)

    def mass(self, u):
        for ax in range(len(self.shape)):
            u = self._mass_axis(u, ax)
        return self._mask_pad(u)

    def laplace(self, u):
        # NOTE: a fused single-pass 9-point variant exists
        # (ops.pallas_kernels.laplace_stencil_2d, both Pallas and XLA-shift
        # forms) — benchmarked identical to this separable form at 1M dofs on
        # v5e (57.3 vs 57.5 MDoF-iter/s end-to-end): XLA fuses the axis
        # passes.  The separable form stays, as it shards along any axis.
        dim = len(self.shape)
        out = None
        for d in range(dim):
            term = u
            for ax in range(dim):
                term = (self._stiff_axis(term, ax) if ax == d
                        else self._mass_axis(term, ax))
            out = term if out is None else out + term
        return self._mask_pad(out)

    def laplace_diag(self):
        """Assembled diagonal of the lattice stiffness as NumPy outer sums of
        the 1D operator diagonals — O(n^{1/dim}) setup arrays, no per-cell
        dof table (the generic CellMatrix.diag bakes a cell_dofs constant
        that breaks remote compiles at 16M+ dofs)."""
        import numpy as np

        dim = len(self.shape)
        dK, dM = [], []
        for ax in range(dim):
            h, n = self.h[ax], self.shape[ax]
            k = np.full(n, 2.0 / h)
            k[0] = k[-1] = 1.0 / h
            m = np.full(n, 2.0 * h / 3.0)
            m[0] = m[-1] = h / 3.0
            dK.append(k)
            dM.append(m)
        out = 0.0
        for d in range(dim):
            term = np.array(1.0)
            for ax in range(dim):
                vec = dK[ax] if ax == d else dM[ax]
                term = np.multiply.outer(term, vec)
            out = out + term
        return jnp.asarray(out.reshape(-1))

    def pad(self, u_lat):
        if self.padded is None:
            return u_lat
        pads = [(0, p - n) for n, p in zip(self.shape, self.padded)]
        return jnp.pad(u_lat, pads)

    def unpad(self, u_lat):
        if self.padded is None:
            return u_lat
        sl = tuple(slice(0, n) for n in self.shape)
        return u_lat[sl]


def flat_to_lattice(u_flat, shape):
    """shape in dof order (first coordinate fastest) -> lattice array in
    reversed axis order.  Pure reshape: zero cost."""
    return u_flat.reshape(tuple(reversed(shape)))


def to_lattice(space: GridSpace, u_flat):
    return flat_to_lattice(u_flat, space.n_points_1d)


def to_flat(u_lat):
    """Pure reshape back to the flat dof vector."""
    return u_lat.reshape(-1)


# ---------------------------------------------------------------------------
# Q1 multigrid transfer on lattices (scatter-free)
# ---------------------------------------------------------------------------

def _prolong_axis(u, ax):
    """Linear interpolation m -> 2m-1 along ``ax``."""
    m = u.shape[ax]
    left = _axis_slice(u, ax, 0, m - 1)
    right = _axis_slice(u, ax, 1, m)
    avg = 0.5 * (left + right)
    st = jnp.stack([left, avg], axis=ax + 1)
    newshape = u.shape[:ax] + (2 * (m - 1),) + u.shape[ax + 1:]
    inter = st.reshape(newshape)
    last = _axis_slice(u, ax, m - 1, m)
    return jnp.concatenate([inter, last], axis=ax)


def _restrict_axis(u, ax):
    """Adjoint of :func:`_prolong_axis`: 2m-1 -> m,
    out[i] = f[2i] + 0.5 f[2i-1] + 0.5 f[2i+1]."""
    even = _axis_slice(u, ax, 0, None, 2)   # (m, ...)
    odd = _axis_slice(u, ax, 1, None, 2)    # (m-1, ...)
    pad_shape = list(odd.shape)
    pad_shape[ax] = 1
    z = jnp.zeros(pad_shape, dtype=u.dtype)
    odd_lo = jnp.concatenate([z, odd], axis=ax)   # contributes to out[1:]
    odd_hi = jnp.concatenate([odd, z], axis=ax)   # contributes to out[:-1]
    return even + 0.5 * (odd_lo + odd_hi)


def lattice_prolong(u_coarse):
    for ax in range(u_coarse.ndim):
        u_coarse = _prolong_axis(u_coarse, ax)
    return u_coarse


def lattice_restrict(u_fine):
    for ax in range(u_fine.ndim):
        u_fine = _restrict_axis(u_fine, ax)
    return u_fine
