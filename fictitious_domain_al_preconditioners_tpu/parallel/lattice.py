"""Structured-lattice (tensor-product) background operators.

The TPU fast path: a Q1 field on the uniform background grid is a dense
(npx, npy[, npz]) *lattice array*; mass and stiffness apply as separable 1D
three-point operators along each axis (K = K₁⊗M₁ + M₁⊗K₁, M = M₁⊗M₁),
implemented with shifts + fused multiply-adds — no gather/scatter at all.
Under ``jax.sharding`` domain decomposition the shifts become nearest-neighbor
halo exchanges that XLA SPMD inserts automatically (`ppermute` over ICI): this
is the deal.II/Trilinos-MPI replacement (reference N15) in its natural
TPU form.

1D reference matrices (Q1, cell size h): interior diag 2h/3 (mass) / 2/h
(stiffness); boundary diag h/3 / 1/h; off-diagonals h/6 / -1/h — boundary rows
are fixed up on two slices after the stencil pass, so Neumann-truncated rows
are exact.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..core.grid import GridSpace

__all__ = ["LatticeOps", "to_lattice", "to_flat", "flat_to_lattice"]


def _shift(v, s):
    """Shift along axis 0 with zero fill: (_shift(v,+1))[i] = v[i-1]."""
    if s == 1:
        pad = jnp.zeros_like(v[:1])
        return jnp.concatenate([pad, v[:-1]], axis=0)
    pad = jnp.zeros_like(v[:1])
    return jnp.concatenate([v[1:], pad], axis=0)


@dataclass(frozen=True)
class LatticeOps:
    """Separable mass/stiffness applies for a Q1 GridSpace.

    ``padded`` (optional) is a physical array shape >= ``shape``; lattice
    arrays are zero-padded to it so that every axis is divisible by the device
    mesh (sharding requires even blocks).  Stencil passes mask the pad region
    back to zero, so padded and unpadded results agree on the true lattice.
    """

    h: tuple            # cell size per axis
    shape: tuple        # true lattice points per axis
    padded: tuple = None

    @classmethod
    def for_space(cls, space: GridSpace, padded: tuple | None = None) -> "LatticeOps":
        assert space.fe.degree == 1 and space.continuous, \
            "lattice fast path is Q1-continuous only"
        return cls(tuple(float(x) for x in space.grid.h),
                   tuple(space.n_points_1d), padded)

    def _mask_pad(self, u):
        if self.padded is None or tuple(self.padded) == tuple(self.shape):
            return u
        m = jnp.ones((), u.dtype)
        for ax, (n, np_) in enumerate(zip(self.shape, self.padded)):
            shape = [1] * u.ndim
            shape[ax] = np_
            m = m * (jnp.arange(np_) < n).astype(u.dtype).reshape(shape)
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

    def mass(self, u):
        for ax in range(len(self.shape)):
            u = self._mass_axis(u, ax)
        return self._mask_pad(u)

    def laplace(self, u):
        dim = len(self.shape)
        out = None
        for d in range(dim):
            term = u
            for ax in range(dim):
                term = (self._stiff_axis(term, ax) if ax == d
                        else self._mass_axis(term, ax))
            out = term if out is None else out + term
        return self._mask_pad(out)


def flat_to_lattice(u_flat, shape):
    dim = len(shape)
    arr = u_flat.reshape(tuple(reversed(shape)))
    return jnp.transpose(arr, tuple(reversed(range(dim))))


def to_lattice(space: GridSpace, u_flat):
    """Flat dof vector (first coord fastest) -> lattice array (npx, npy[, npz])."""
    return flat_to_lattice(u_flat, space.n_points_1d)


def to_flat(u_lat):
    dim = u_lat.ndim
    return jnp.transpose(u_lat, tuple(reversed(range(dim)))).reshape(-1)
