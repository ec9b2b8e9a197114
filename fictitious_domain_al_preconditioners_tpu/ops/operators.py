"""Cell-local sparse operators: the TPU-native finite element matrix.

Instead of deal.II's CSR ``SparseMatrix<double>`` (reference L2), operators are
stored in *element form*: per-cell dof index blocks plus local matrices.  The
matrix-vector product is gather → batched small matmul (MXU-friendly einsum) →
scatter-add, entirely inside jit.  Uniform background grids share one reference
local matrix with an optional per-cell coefficient (constant-coefficient
Laplace/mass need O(nloc^2) storage total); immersed meshes carry per-cell
local matrices.

Materialization helpers (COO / dense / diagonal) cover everything the reference
does with explicit matrices: diagonal preconditioners, small-matrix eigenvalue
export (utilities.h:62-109), and sanity checks.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax.numpy as jnp
import numpy as np

from .linop import LinOp

__all__ = ["CellMatrix", "constrain", "dirichlet_rhs"]


@dataclass
class CellMatrix:
    """Element-form matrix  A = sum_c P_row[c]^T (coef_c * local_c) P_col[c].

    ``local`` is either (nloc_r, nloc_c) shared across cells or per-cell
    (nc, nloc_r, nloc_c).  ``coef`` is an optional per-cell scaling (used for
    piecewise-constant coefficients like the elliptic-interface beta jump).
    """

    row_dofs: jnp.ndarray  # (nc, nloc_r) int32
    col_dofs: jnp.ndarray  # (nc, nloc_c) int32
    local: jnp.ndarray     # (nloc_r, nloc_c) or (nc, nloc_r, nloc_c)
    shape: tuple           # (n_rows, n_cols)
    coef: Optional[jnp.ndarray] = None  # (nc,)

    def __post_init__(self):
        # arrays stay host-side (NumPy) until first use: a CellMatrix whose
        # apply is bypassed by a lattice/stencil fast path must not pay a
        # multi-hundred-MB device transfer at construction (16M+ cells)
        self.row_dofs = np.asarray(self.row_dofs)
        self.col_dofs = np.asarray(self.col_dofs)
        if self.coef is not None:
            self.coef = jnp.asarray(self.coef)

    @property
    def shared_local(self) -> bool:
        return self.local.ndim == 2

    def _cell_apply(self, xe):
        """(nc, nloc_c) -> (nc, nloc_r) local matvecs."""
        if self.shared_local:
            ye = xe @ self.local.T
        else:
            ye = jnp.einsum("cab,cb->ca", self.local, xe)
        if self.coef is not None:
            ye = ye * self.coef[:, None]
        return ye

    def _cell_apply_t(self, ye):
        if self.coef is not None:
            ye = ye * self.coef[:, None]
        if self.shared_local:
            return ye @ self.local
        return jnp.einsum("cab,ca->cb", self.local, ye)

    def mv(self, x):
        """y = A @ x.  Trailing component axes broadcast: x may be (n,) or (n, k)."""
        xe = x[self.col_dofs]  # (nc, nloc_c, ...)
        if xe.ndim == 3:
            ye = jnp.einsum("cb k,ab->ca k".replace(" ", ""),
                            xe, self.local) if self.shared_local else \
                jnp.einsum("cbk,cab->cak", xe, self.local)
            if self.coef is not None:
                ye = ye * self.coef[:, None, None]
        else:
            ye = self._cell_apply(xe)
        out = jnp.zeros((self.shape[0],) + x.shape[1:], dtype=x.dtype)
        return out.at[self.row_dofs].add(ye)

    def rmv(self, y):
        ye = y[self.row_dofs]
        if ye.ndim == 3:
            if self.coef is not None:
                ye = ye * self.coef[:, None, None]
            xe = jnp.einsum("cak,ab->cbk", ye, self.local) if self.shared_local \
                else jnp.einsum("cak,cab->cbk", ye, self.local)
        else:
            xe = self._cell_apply_t(ye)
        out = jnp.zeros((self.shape[1],) + y.shape[1:], dtype=y.dtype)
        return out.at[self.col_dofs].add(xe)

    def as_linop(self) -> LinOp:
        return LinOp(self.mv, self.shape, self.rmv)

    def diag(self):
        """Assembled main diagonal (requires row/col spaces to coincide)."""
        if self.shared_local:
            d_loc = jnp.broadcast_to(jnp.diagonal(self.local),
                                     self.row_dofs.shape)
        else:
            d_loc = jnp.diagonal(self.local, axis1=1, axis2=2)
        if self.coef is not None:
            d_loc = d_loc * self.coef[:, None]
        out = jnp.zeros(self.shape[0], dtype=self.local.dtype)
        return out.at[self.row_dofs].add(d_loc)

    def row_sums(self):
        """Lumped-mass style row sums (pressure mass lumping,
        stokes_immersed_boundary.cc:946-957)."""
        if self.shared_local:
            s_loc = jnp.broadcast_to(self.local.sum(axis=1), self.row_dofs.shape)
        else:
            s_loc = self.local.sum(axis=2)
        if self.coef is not None:
            s_loc = s_loc * self.coef[:, None]
        out = jnp.zeros(self.shape[0], dtype=self.local.dtype)
        return out.at[self.row_dofs].add(s_loc)

    def to_coo(self):
        """(rows, cols, vals) with duplicates NOT summed (numpy, for export)."""
        nc, nr = self.row_dofs.shape
        ncl = self.col_dofs.shape[1]
        rows = np.repeat(np.asarray(self.row_dofs), ncl, axis=1).reshape(-1)
        cols = np.tile(np.asarray(self.col_dofs), (1, nr)).reshape(-1)
        local = np.asarray(self.local)
        if self.shared_local:
            vals = np.broadcast_to(local[None], (nc, nr, ncl))
        else:
            vals = local
        if self.coef is not None:
            vals = vals * np.asarray(self.coef)[:, None, None]
        return rows, cols, vals.reshape(-1)

    def to_dense(self) -> np.ndarray:
        rows, cols, vals = self.to_coo()
        out = np.zeros(self.shape)
        np.add.at(out, (rows, cols), vals)
        return out


def constrain(op: LinOp, free_mask) -> LinOp:
    """Impose Dirichlet constraints on a square operator.

    Returns ``x -> P A P x + (I-P) x`` with ``P = diag(free_mask)`` — the
    iterative-solver equivalent of deal.II ``AffineConstraints``' condensed
    matrix with identity on constrained rows (immersed_laplace.cc:381-386,698).
    """
    m = jnp.asarray(free_mask)

    def mv(x):
        mm = m.reshape(m.shape + (1,) * (x.ndim - 1))
        return jnp.where(mm, op(jnp.where(mm, x, 0.0)), x)

    return LinOp(mv, op.shape, mv)


def dirichlet_rhs(op: LinOp, rhs, free_mask, boundary_values):
    """Lift inhomogeneous Dirichlet data: returns the constrained right-hand
    side ``P (b - A g) + (I-P) g`` so that solving the constrained operator
    reproduces ``u = g`` on the boundary (deal.II ``constraints.distribute``)."""
    m = jnp.asarray(free_mask)
    mm = m.reshape(m.shape + (1,) * (rhs.ndim - 1))
    g = jnp.where(mm, 0.0, boundary_values)
    return jnp.where(mm, rhs - op(g), boundary_values)
