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

from ..core.adaptive import AdaptiveDGPSpace, AdaptiveSpace
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
    if isinstance(space, (AdaptiveSpace, AdaptiveDGPSpace)):
        return _adaptive_cell_matrix(space, _ref_mass_local, order, coef)
    local = _ref_mass_local(space.fe, space.grid.h, order)
    return CellMatrix(space.cell_dofs, space.cell_dofs, local,
                      (space.n_dofs, space.n_dofs), coef)


def laplace_matrix(space: GridSpace, order: int | None = None, coef=None) -> CellMatrix:
    """Stiffness (grad u, grad v); ``coef`` is an optional per-cell constant
    (the elliptic-interface beta field, elliptic_interface.cc:638-675)."""
    order = order or default_order(space)
    if isinstance(space, AdaptiveSpace):
        return _adaptive_cell_matrix(space, _ref_laplace_local, order, coef)
    local = _ref_laplace_local(space.fe, space.grid.h, order)
    return CellMatrix(space.cell_dofs, space.cell_dofs, local,
                      (space.n_dofs, space.n_dofs), coef)


def _adaptive_cell_matrix(space: AdaptiveSpace, ref_local_fn, order: int,
                          coef=None) -> CellMatrix:
    """Element-form operator on an adaptive grid: per-level reference local
    matrices, hanging-node constraints folded in (W_cᵀ L_level W_c) — the
    assembled operator acts directly on free dofs."""
    g = space.grid
    per_level = {int(l): ref_local_fn(space.fe, g.h_of_level(int(l)), order)
                 for l in np.unique(g.levels)}
    L = np.stack([per_level[int(l)] for l in g.levels])   # (nc, nloc, nloc)
    folded = np.einsum("caK,cab,cbM->cKM", space.fold_w, L, space.fold_w)
    return CellMatrix(space.cell_dofs, space.cell_dofs, folded,
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


def _cell_quad_points_traced(space: GridSpace, rule):
    """Quadrature points computed INSIDE jit from iota — no multi-hundred-MB
    point array baked into the program as a constant (which would have to ship
    to the compiler and live in HBM)."""
    import jax

    grid = space.grid
    nc = grid.n_cells
    idx = jax.lax.broadcasted_iota(jnp.int32, (nc, 1), 0)[:, 0]
    mi = []
    for d in range(grid.dim):
        mi.append((idx % grid.ncells[d]).astype(jnp.float64
                  if jax.config.jax_enable_x64 else jnp.float32))
        idx = idx // grid.ncells[d]
    origins = jnp.stack(
        [jnp.asarray(grid.origin[d]) + mi[d] * grid.h[d]
         for d in range(grid.dim)], axis=-1)  # (nc, dim)
    return origins[:, None, :] + jnp.asarray(rule.points)[None, :, :] * \
        jnp.asarray(grid.h)


def _cell_dofs_traced(space: GridSpace):
    """(nc, nloc) global dof indices computed INSIDE jit from iota — at 16M+
    cells the host-built cell_dofs array is a multi-hundred-MB constant that
    exceeds remote-compile payload limits."""
    import jax

    grid = space.grid
    k = space.fe.degree
    npts = space.n_points_1d
    strides = np.cumprod([1] + list(npts[:-1]))
    mi = space.fe.node_multi_indices            # (nloc, dim) small
    idx = jax.lax.broadcasted_iota(jnp.int32, (grid.n_cells, 1), 0)[:, 0]
    out = jnp.zeros((grid.n_cells, space.fe.n_dofs_per_cell), dtype=jnp.int32)
    rest = idx
    for d in range(grid.dim):
        ci = rest % grid.ncells[d]
        rest = rest // grid.ncells[d]
        out = out + (ci[:, None] * k + jnp.asarray(mi[:, d])[None, :]) * \
            int(strides[d])
    return out


def rhs_vector(space: GridSpace, fn, order: int | None = None):
    """(f, phi_i) load vector for a traceable ``fn(points) -> values``.

    Scalar fn -> (ndofs,); vector fn -> (ndofs, ncomp).  Runs as one jitted
    computation (single device dispatch); quadrature points AND cell dof
    indices are generated in-jit (iota), not baked as constants."""
    import jax

    order = order or default_order(space)
    if isinstance(space, AdaptiveSpace):
        return _adaptive_rhs(space, fn, order)
    if space.fe.degree == 1 and space.continuous:
        return _lattice_rhs(space, fn, order)
    rule = gauss(space.grid.dim, order)
    jxw = rule.weights * float(np.prod(space.grid.h))
    tab = jnp.asarray(space.fe.tabulate(rule.points))  # (nq, nloc)
    nc = space.grid.n_cells
    nq, dim = rule.points.shape

    def build():
        pts = _cell_quad_points_traced(space, rule)
        cell_dofs = _cell_dofs_traced(space)
        fv = jnp.asarray(fn(pts.reshape(-1, dim)))
        w_tab = tab * jnp.asarray(jxw)[:, None]  # (nq, nloc)
        if fv.ndim == 1:
            be = jnp.einsum("cq,qa->ca", fv.reshape(nc, nq), w_tab)
            out = jnp.zeros(space.n_dofs, dtype=be.dtype)
            return out.at[cell_dofs].add(be)
        ncomp = fv.shape[1]
        be = jnp.einsum("cqk,qa->cak", fv.reshape(nc, nq, ncomp), w_tab)
        out = jnp.zeros((space.n_dofs, ncomp), dtype=be.dtype)
        return out.at[cell_dofs].add(be)

    return jax.jit(build)()


def _lattice_rhs(space: GridSpace, fn, order: int):
    """Q1 load vector as shifted slice-adds on the node lattice: per quad
    point, f is evaluated on the cell lattice (in-jit iota points) and
    distributed to the 2^dim corners by static update-slices — no per-cell
    dof table, no scatter, one cell-lattice temporary at a time (the generic
    path's all-cells quadrature arrays exceed HBM at 16M+ cells)."""
    import jax

    grid = space.grid
    dim = grid.dim
    rule = gauss(dim, order)
    jxw = rule.weights * float(np.prod(grid.h))
    tab = space.fe.tabulate(rule.points)        # (nq, 2^dim)
    mi = space.fe.node_multi_indices            # (2^dim, dim) 0/1 offsets
    # lattice axis order: REVERSED coordinates (axis 0 = slowest = last dim)
    nodes_shape = tuple(reversed(space.n_points_1d))
    cells_shape = tuple(reversed(grid.ncells))

    def build():
        dt = jnp.zeros(0).dtype  # default float dtype
        coords = []
        for d in range(dim):     # coordinate d varies along lattice axis dim-1-d
            ax = dim - 1 - d
            c = jax.lax.broadcasted_iota(jnp.int32, cells_shape, ax).astype(dt)
            coords.append(c)
        out = None
        for q in range(len(jxw)):
            pts = jnp.stack(
                [jnp.asarray(grid.origin[d]) +
                 (coords[d] + float(rule.points[q, d])) * float(grid.h[d])
                 for d in range(dim)], axis=-1)
            fv = jnp.asarray(fn(pts.reshape(-1, dim)))
            ncomp = 0 if fv.ndim == 1 else fv.shape[1]
            fv = fv.T.reshape(((ncomp,) if ncomp else ()) + cells_shape)
            if out is None:
                out = jnp.zeros(((ncomp,) if ncomp else ()) + nodes_shape,
                                dtype=dt)
            lead = (slice(None),) if ncomp else ()
            for a in range(mi.shape[0]):
                off = tuple(int(mi[a, d]) for d in reversed(range(dim)))
                idx = lead + tuple(slice(o, o + n)
                                   for o, n in zip(off, cells_shape))
                out = out.at[idx].add(float(tab[q, a] * jxw[q]) * fv)
        if out.ndim > dim:      # vector fn -> (ndofs, ncomp)
            return out.reshape(out.shape[0], -1).T
        return out.reshape(-1)

    return jax.jit(build)()


def _adaptive_quad(space: AdaptiveSpace, order: int):
    """(rule, physical points (nc, nq, dim), jxw (nc, nq)) on an adaptive grid
    — host-side NumPy (adaptive meshes are the moderate-size near-Γ bands)."""
    g = space.grid
    rule = gauss(g.dim, order)
    h = g.cell_h                                            # (nc, dim)
    pts = g.cell_origins()[:, None, :] + rule.points[None, :, :] * h[:, None, :]
    jxw = rule.weights[None, :] * np.prod(h, axis=1)[:, None]
    return rule, pts, jxw


def _adaptive_rhs(space: AdaptiveSpace, fn, order: int):
    rule, pts, jxw = _adaptive_quad(space, order)
    tab = space.fe.tabulate(rule.points)                    # (nq, nloc)
    nc, nq, dim = pts.shape
    fv = np.asarray(fn(pts.reshape(-1, dim)))
    if fv.ndim == 2:                                        # vector fn
        ncomp = fv.shape[1]
        fv = fv.reshape(nc, nq, ncomp)
        be = np.einsum("cqk,qa,cq->cak", fv, tab, jxw)
        bf = np.einsum("cak,caK->cKk", be, space.fold_w)
        out = np.zeros((space.n_dofs, ncomp))
        np.add.at(out, space.cell_dofs, bf)
        return jnp.asarray(out)
    fv = fv.reshape(nc, nq)
    be = np.einsum("cq,qa,cq->ca", fv, tab, jxw)
    bf = np.einsum("ca,caK->cK", be, space.fold_w)          # fold constraints
    out = np.zeros(space.n_dofs)
    np.add.at(out, space.cell_dofs, bf)
    return jnp.asarray(out)


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
    if isinstance(space, AdaptiveSpace):
        rule, pts, jxw = _adaptive_quad(space, order)
        tab = space.fe.tabulate(rule.points)
        nc, nq, dim = pts.shape
        un = np.einsum("caK,cK->ca", space.fold_w,
                       np.asarray(u)[space.cell_dofs])
        uh = un @ tab.T
        ex = np.asarray(exact_fn(pts.reshape(-1, dim))).reshape(nc, nq)
        return float(np.sqrt(np.sum((uh - ex) ** 2 * jxw)))
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
    if isinstance(space, AdaptiveSpace):
        rule, pts, jxw = _adaptive_quad(space, order)
        rgrad = space.fe.tabulate_grad(rule.points)        # (nq, nloc, dim)
        nc, nq, dim = pts.shape
        un = np.einsum("caK,cK->ca", space.fold_w,
                       np.asarray(u)[space.cell_dofs])
        gh = np.einsum("ca,qad->cqd", un, rgrad) / \
            space.grid.cell_h[:, None, :]
        ge = np.asarray(exact_grad_fn(pts.reshape(-1, dim))).reshape(nc, nq, dim)
        return float(np.sqrt(np.sum(np.sum((gh - ge) ** 2, axis=-1) * jxw)))
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


# ---------------------------------------------------------------------------
# Vector-valued (Stokes / elasticity) reference local matrices
# ---------------------------------------------------------------------------

def _grad_products(fe, h, order):
    """I[c, d, a, b] = ∫_cell ∂_c φ_a ∂_d φ_b dx on the uniform cell."""
    rule = gauss(fe.dim, order)
    grad = fe.tabulate_grad(rule.points)  # (nq, nloc, dim) reference grads
    vol = float(np.prod(h))
    phys = grad / np.asarray(h)[None, None, :]
    return np.einsum("qac,qbd,q->cdab", phys, phys, rule.weights) * vol


def _value_products(fe, h, order):
    rule = gauss(fe.dim, order)
    tab = fe.tabulate(rule.points)
    vol = float(np.prod(h))
    return np.einsum("qa,qb,q->ab", tab, tab, rule.weights) * vol


def vector_cell_dofs(space: GridSpace, n_comp: int) -> np.ndarray:
    """(nc, nloc*n_comp) dofs of the component-major flattened vector space
    (component c of scalar dof i lives at c*n_scalar + i)."""
    n = space.n_dofs
    cd = space.cell_dofs
    return np.concatenate([cd + c * n for c in range(n_comp)], axis=1)


def adaptive_vector_cell_matrix(space, local_fn, n_comp: int) -> CellMatrix:
    """Vector-valued operator on an :class:`AdaptiveSpace`: per-level shared
    local matrices ``local_fn(h) -> (nloc*n_comp, nloc*n_comp)`` folded
    through the component-blocked hanging-node constraint fold — extends the
    scalar ``_adaptive_cell_matrix`` pattern to the Stokes/elasticity blocks
    (near-Γ local refinement, stokes_immersed_boundary.cc:472-483)."""
    g = space.grid
    per_level = {int(l): local_fn(g.h_of_level(int(l)))
                 for l in np.unique(g.levels)}
    L = np.stack([per_level[int(l)] for l in g.levels])
    W = space.fold_w                     # (nc, nloc, K)
    nc, nloc, K = W.shape
    Wv = np.zeros((nc, n_comp * nloc, n_comp * K))
    for c in range(n_comp):
        Wv[:, c * nloc:(c + 1) * nloc, c * K:(c + 1) * K] = W
    folded = np.einsum("caM,cab,cbN->cMN", Wv, L, Wv, optimize=True)
    vd = vector_cell_dofs(space, n_comp)
    n = space.n_dofs
    return CellMatrix(vd, vd, folded, (n * n_comp, n * n_comp))


def adaptive_mixed_cell_matrix(row_space, col_space, local_fn,
                               n_comp_col: int) -> CellMatrix:
    """Mixed block (scalar adaptive rows x vector adaptive cols, e.g. the
    Stokes divergence B) with both constraint folds applied:
    ``local_fn(h) -> (nloc_row, nloc_col*n_comp_col)``."""
    g = row_space.grid
    per_level = {int(l): local_fn(g.h_of_level(int(l)))
                 for l in np.unique(g.levels)}
    L = np.stack([per_level[int(l)] for l in g.levels])
    Wp = row_space.fold_w                # (nc, nloc_p, Kp)
    Wu = col_space.fold_w                # (nc, nloc_u, Ku)
    nc, nloc_u, Ku = Wu.shape
    Wv = np.zeros((nc, n_comp_col * nloc_u, n_comp_col * Ku))
    for c in range(n_comp_col):
        Wv[:, c * nloc_u:(c + 1) * nloc_u, c * Ku:(c + 1) * Ku] = Wu
    folded = np.einsum("caP,cab,cbN->cPN", Wp, L, Wv, optimize=True)
    cols = vector_cell_dofs(col_space, n_comp_col)
    return CellMatrix(row_space.cell_dofs, cols, folded,
                      (row_space.n_dofs, col_space.n_dofs * n_comp_col))


def velocity_block_local(fe, h, order, grad_div_coef: float | None) -> np.ndarray:
    """Local (nloc*dim, nloc*dim) matrix of the Stokes velocity block on the
    uniform cell (stokes_immersed_boundary.cc:722-744):

      grad_div_coef is not None:  (∇u : ∇v) + γ_gd (div u)(div v)
      grad_div_coef is None:      2 (ε(u) : ε(v))
    """
    dim = fe.dim
    nloc = fe.n_dofs_per_cell
    I = _grad_products(fe, h, order)  # (dim, dim, nloc, nloc)
    lap = np.einsum("ccab->ab", I)
    out = np.zeros((nloc * dim, nloc * dim))
    for c in range(dim):
        for d in range(dim):
            blk = np.zeros((nloc, nloc))
            if c == d:
                blk += lap
            if grad_div_coef is not None:
                # gamma_gd * ∫ ∂_c φ_a ∂_d φ_b  (div-div term)
                blk = blk + grad_div_coef * I[c, d]
            else:
                # symgrad: + ∫ ∂_d φ_a ∂_c φ_b
                blk = blk + I[d, c]
            out[c * nloc:(c + 1) * nloc, d * nloc:(d + 1) * nloc] = blk
    return out


def elasticity_block_local(fe, h, order, lam: float, mu: float) -> np.ndarray:
    """Local vector matrix λ(div u, div v) + 2μ(ε(u):ε(v)) — the elasticity
    cell kernel (ElasticityUtilities::assemble_elasticity, utilities.h:377-427)."""
    dim = fe.dim
    nloc = fe.n_dofs_per_cell
    I = _grad_products(fe, h, order)
    lap = np.einsum("ccab->ab", I)
    out = np.zeros((nloc * dim, nloc * dim))
    for c in range(dim):
        for d in range(dim):
            blk = lam * I[c, d] + mu * I[d, c]
            if c == d:
                blk = blk + mu * lap
            out[c * nloc:(c + 1) * nloc, d * nloc:(d + 1) * nloc] = blk
    return out


def divergence_block_local(p_fe, u_fe, h, order) -> np.ndarray:
    """Local (nloc_p, nloc_u*dim) matrix of B = -(div u, q)
    (stokes_immersed_boundary.cc:727-739)."""
    dim = u_fe.dim
    rule = gauss(dim, order)
    p_tab = p_fe.tabulate(rule.points)        # (nq, nloc_p)
    u_grad = u_fe.tabulate_grad(rule.points)  # (nq, nloc_u, dim)
    vol = float(np.prod(h))
    phys = u_grad / np.asarray(h)[None, None, :]
    blocks = [-vol * np.einsum("qa,qb,q->ab", p_tab, phys[:, :, c],
                               rule.weights) for c in range(dim)]
    return np.concatenate(blocks, axis=1)
