"""FEM assembly: batched element kernels producing CellMatrix operators.

TPU-native replacement for deal.II ``MatrixTools::create_laplace_matrix /
create_mass_matrix``, ``VectorTools::create_right_hand_side / interpolate /
integrate_difference`` (reference: immersed_laplace.cc:456-494,
elliptic_interface.cc:1021-1036).  Background (uniform-grid) operators share a
single reference local matrix — assembly is O(nloc^2) setup; immersed-mesh
operators get per-cell local matrices from vectorized NumPy einsums (the
immersed side is always small).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.fe import FE
from ..core.grid import GridSpace
from ..core.immersed import ImmersedSpace
from ..core.quadrature import gauss
from .operators import CellMatrix

__all__ = [
    "mass_matrix", "laplace_matrix", "rhs_vector", "interpolate",
    "l2_error", "h1_error", "imm_mass_matrix", "imm_stiffness_matrix",
    "imm_rhs", "default_order",
]


def default_order(space) -> int:
    return space.fe.degree + 1


# ---------------------------------------------------------------------------
# Background (uniform grid) assembly
# ---------------------------------------------------------------------------

def _ref_mass_local(fe, h, order) -> np.ndarray:
    rule = gauss(fe.dim, order)
    tab = fe.tabulate(rule.points)  # (nq, nloc)
    vol = float(np.prod(h))
    return np.einsum("qa,qb,q->ab", tab, tab, rule.weights) * vol


def _ref_laplace_local(fe, h, order) -> np.ndarray:
    rule = gauss(fe.dim, order)
    grad = fe.tabulate_grad(rule.points)  # (nq, nloc, dim)
    vol = float(np.prod(h))
    out = np.zeros((fe.n_dofs_per_cell, fe.n_dofs_per_cell))
    for d in range(fe.dim):
        out += (vol / h[d] ** 2) * np.einsum(
            "qa,qb,q->ab", grad[:, :, d], grad[:, :, d], rule.weights)
    return out


def mass_matrix(space: GridSpace, order: int | None = None, coef=None) -> CellMatrix:
    order = order or default_order(space)
    local = _ref_mass_local(space.fe, space.grid.h, order)
    return CellMatrix(space.cell_dofs, space.cell_dofs, local,
                      (space.n_dofs, space.n_dofs), coef)


def laplace_matrix(space: GridSpace, order: int | None = None, coef=None) -> CellMatrix:
    """Stiffness (grad u, grad v); ``coef`` is an optional per-cell constant
    (the elliptic-interface beta field, elliptic_interface.cc:638-675)."""
    order = order or default_order(space)
    local = _ref_laplace_local(space.fe, space.grid.h, order)
    return CellMatrix(space.cell_dofs, space.cell_dofs, local,
                      (space.n_dofs, space.n_dofs), coef)


def _cell_quad_points(space: GridSpace, order: int):
    """(nc, nq, dim) physical quadrature points + (nq,) weights*detJ."""
    rule = gauss(space.grid.dim, order)
    origin = np.asarray(space.grid.origin)
    h = space.grid.h
    origins = origin + space.grid.cell_multi_indices * h  # (nc, dim)
    pts = origins[:, None, :] + rule.points[None, :, :] * h  # (nc, nq, dim)
    jxw = rule.weights * float(np.prod(h))
    return rule, pts, jxw


def rhs_vector(space: GridSpace, fn, order: int | None = None):
    """(f, phi_i) load vector for a traceable ``fn(points) -> values``.

    Scalar fn -> (ndofs,); vector fn -> (ndofs, ncomp).  Runs as one jitted
    computation (single device dispatch)."""
    import jax

    order = order or default_order(space)
    rule, pts, jxw = _cell_quad_points(space, order)
    tab = jnp.asarray(space.fe.tabulate(rule.points))  # (nq, nloc)
    nc, nq, dim = pts.shape

    def build():
        fv = jnp.asarray(fn(jnp.asarray(pts.reshape(-1, dim))))
        w_tab = tab * jnp.asarray(jxw)[:, None]  # (nq, nloc)
        if fv.ndim == 1:
            be = jnp.einsum("cq,qa->ca", fv.reshape(nc, nq), w_tab)
            out = jnp.zeros(space.n_dofs, dtype=be.dtype)
            return out.at[jnp.asarray(space.cell_dofs)].add(be)
        ncomp = fv.shape[1]
        be = jnp.einsum("cqk,qa->cak", fv.reshape(nc, nq, ncomp), w_tab)
        out = jnp.zeros((space.n_dofs, ncomp), dtype=be.dtype)
        return out.at[jnp.asarray(space.cell_dofs)].add(be)

    return jax.jit(build)()


def interpolate(space: GridSpace, fn):
    """Nodal interpolation (VectorTools::interpolate) — host-side NumPy
    evaluation, transferred to device once."""
    return jnp.asarray(np.asarray(fn(space.dof_points)))


def _eval_at_quad(space: GridSpace, u, tab):
    """u_h at quadrature points: (nc, nq[, ncomp])."""
    ue = u[jnp.asarray(space.cell_dofs)]  # (nc, nloc[, k])
    if ue.ndim == 3:
        return jnp.einsum("cak,qa->cqk", ue, tab)
    return jnp.einsum("ca,qa->cq", ue, tab)


def l2_error(space: GridSpace, u, exact_fn, order: int | None = None) -> float:
    """||u_h - u||_L2 by quadrature (VectorTools::integrate_difference +
    compute_global_error, elliptic_interface.cc:1020-1051)."""
    import jax

    order = order or (space.fe.degree + 2)
    rule, pts, jxw = _cell_quad_points(space, order)
    tab = jnp.asarray(space.fe.tabulate(rule.points))
    nc, nq, dim = pts.shape

    def build(u):
        uh = _eval_at_quad(space, u, tab)
        ex = jnp.asarray(exact_fn(jnp.asarray(pts.reshape(-1, dim)))).reshape(uh.shape)
        diff2 = (uh - ex) ** 2
        if diff2.ndim == 3:
            diff2 = diff2.sum(-1)
        return jnp.sqrt(jnp.sum(diff2 * jnp.asarray(jxw)[None, :]))

    return float(jax.jit(build)(u))


def h1_error(space: GridSpace, u, exact_grad_fn, order: int | None = None) -> float:
    """H1-seminorm error; ``exact_grad_fn(points) -> (n, dim)``."""
    import jax

    order = order or (space.fe.degree + 2)
    rule, pts, jxw = _cell_quad_points(space, order)
    grad = space.fe.tabulate_grad(rule.points) / space.grid.h[None, None, :]
    grad = jnp.asarray(grad)  # (nq, nloc, dim) physical gradients
    nc, nq, dim = pts.shape

    def build(u):
        ue = u[jnp.asarray(space.cell_dofs)]  # (nc, nloc)
        gh = jnp.einsum("ca,qad->cqd", ue, grad)
        ge = jnp.asarray(exact_grad_fn(jnp.asarray(pts.reshape(-1, dim)))).reshape(nc, nq, dim)
        diff2 = jnp.sum((gh - ge) ** 2, axis=-1)
        return jnp.sqrt(jnp.sum(diff2 * jnp.asarray(jxw)[None, :]))

    return float(jax.jit(build)(u))


# ---------------------------------------------------------------------------
# Immersed-mesh assembly (general geometry, per-cell local matrices)
# ---------------------------------------------------------------------------

def imm_mass_matrix(ispace: ImmersedSpace, order: int | None = None) -> CellMatrix:
    """Immersed mass matrix M (embedded_mass_matrix, immersed_laplace.cc:471)."""
    order = order or (ispace.fe.degree + 1)
    rule = gauss(ispace.mesh.dim, order)
    tab = ispace.fe.tabulate(rule.points)  # (nq, nloc)
    _, _, jxw = ispace.mesh.quad_geometry(rule)  # (nc, nq)
    local = np.einsum("qa,qb,cq->cab", tab, tab, jxw)
    return CellMatrix(ispace.cell_dofs, ispace.cell_dofs, local,
                      (ispace.n_dofs, ispace.n_dofs))


def imm_stiffness_matrix(ispace: ImmersedSpace, order: int | None = None) -> CellMatrix:
    """Immersed (Laplace-Beltrami) stiffness A_Gamma, codim-aware via the first
    fundamental form (embedded_stiffness_matrix, immersed_laplace.cc:467 — used
    by the rational preconditioner)."""
    order = order or (ispace.fe.degree + 1)
    rule = gauss(ispace.mesh.dim, order)
    grad = ispace.fe.tabulate_grad(rule.points)  # (nq, nloc, d)
    _, J, jxw = ispace.mesh.quad_geometry(rule)
    G = np.einsum("cqsd,cqse->cqde", J, J)
    Ginv = np.linalg.inv(G)
    local = np.einsum("qad,cqde,qbe,cq->cab", grad, Ginv, grad, jxw)
    return CellMatrix(ispace.cell_dofs, ispace.cell_dofs, local,
                      (ispace.n_dofs, ispace.n_dofs))


def imm_rhs(ispace: ImmersedSpace, fn, order: int | None = None):
    """(g, psi_j)_Gamma load vector on the immersed space
    (embedded_rhs, immersed_laplace.cc:479)."""
    order = order or (ispace.fe.degree + 1)
    rule = gauss(ispace.mesh.dim, order)
    tab = ispace.fe.tabulate(rule.points)
    X, _, jxw = ispace.mesh.quad_geometry(rule)  # (nc, nq, sd), (nc, nq)
    nc, nq, sd = X.shape
    fv = np.asarray(fn(X.reshape(-1, sd)))  # host-side NumPy evaluation
    if fv.ndim == 1:
        be = np.einsum("cq,qa,cq->ca", fv.reshape(nc, nq), tab, jxw)
        out = np.zeros(ispace.n_dofs)
        np.add.at(out, ispace.cell_dofs, be)
        return jnp.asarray(out)
    ncomp = fv.shape[1]
    be = np.einsum("cqk,qa,cq->cak", fv.reshape(nc, nq, ncomp), tab, jxw)
    out = np.zeros((ispace.n_dofs, ncomp))
    np.add.at(out, ispace.cell_dofs, be)
    return jnp.asarray(out)
