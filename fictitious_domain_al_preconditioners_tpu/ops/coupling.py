"""The non-matching coupling operator C  (the heart of the fictitious-domain
method).

TPU-native replacement for ``NonMatching::create_coupling_sparsity_pattern /
create_coupling_mass_matrix`` + ``Particles::ParticleHandler`` (reference:
immersed_laplace.cc:443,488; elliptic_interface.cc:577,583;
stokes_immersed_boundary.cc:660,782; utilities.h:755-837).

    C[j, i] = ∫_Γ  φ_i^bg  ψ_j^imm  dΓ

Setup builds a *quad-point table*: every immersed quadrature point is located
in its background cell by O(1) index arithmetic (uniform grid — no rtree), and
both bases are tabulated there.  The runtime actions ``C u`` and ``Cᵀ λ`` are
pure gather → einsum → scatter-add, so the augmented-Lagrangian term
``γ CᵀW⁻¹C`` applies matrix-free inside jit (the reference's "operator
version", immersed_laplace.cc:653-705) — this is the default path; explicit
materialization (COO) exists for diagnostics and coarse-level operators.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..core.grid import GridSpace
from ..core.immersed import ImmersedSpace
from ..core.quadrature import gauss
from .linop import LinOp

__all__ = ["Coupling", "build_coupling"]


@dataclass
class Coupling:
    """Quad-point form of C : V_bg -> V_imm  (shape (n_imm, n_bg))."""

    bg_dofs: jnp.ndarray   # (nq, nloc_bg) int32
    bg_phi: jnp.ndarray    # (nq, nloc_bg)
    imm_dofs: jnp.ndarray  # (nq, nloc_imm) int32
    imm_psi: jnp.ndarray   # (nq, nloc_imm)
    jxw: jnp.ndarray       # (nq,)
    shape: tuple           # (n_imm, n_bg)
    points: np.ndarray = None  # (nq, spacedim) physical quad points (setup data)

    def __post_init__(self):
        self.bg_dofs = jnp.asarray(self.bg_dofs)
        self.bg_phi = jnp.asarray(self.bg_phi)
        self.imm_dofs = jnp.asarray(self.imm_dofs)
        self.imm_psi = jnp.asarray(self.imm_psi)
        self.jxw = jnp.asarray(self.jxw)

    @property
    def n_quad(self) -> int:
        return self.bg_phi.shape[0]

    def interp_bg(self, u):
        """u_h^bg evaluated at the quad points: (nq,) or (nq, k)."""
        ue = u[self.bg_dofs]
        if ue.ndim == 3:
            return jnp.einsum("qak,qa->qk", ue, self.bg_phi)
        return jnp.einsum("qa,qa->q", ue, self.bg_phi)

    def interp_imm(self, lam):
        le = lam[self.imm_dofs]
        if le.ndim == 3:
            return jnp.einsum("qak,qa->qk", le, self.imm_psi)
        return jnp.einsum("qa,qa->q", le, self.imm_psi)

    def mv(self, u):
        """C @ u : background -> immersed."""
        vals = self.interp_bg(u) * (self.jxw if u.ndim == 1 else self.jxw[:, None])
        out = jnp.zeros((self.shape[0],) + u.shape[1:], dtype=u.dtype)
        if u.ndim == 2:
            return out.at[self.imm_dofs].add(self.imm_psi[:, :, None] * vals[:, None, :])
        return out.at[self.imm_dofs].add(self.imm_psi * vals[:, None])

    def rmv(self, lam):
        """Cᵀ @ λ : immersed -> background."""
        vals = self.interp_imm(lam) * (self.jxw if lam.ndim == 1 else self.jxw[:, None])
        out = jnp.zeros((self.shape[1],) + lam.shape[1:], dtype=lam.dtype)
        if lam.ndim == 2:
            return out.at[self.bg_dofs].add(self.bg_phi[:, :, None] * vals[:, None, :])
        return out.at[self.bg_dofs].add(self.bg_phi * vals[:, None])

    def as_linop(self) -> LinOp:
        return LinOp(self.mv, self.shape, self.rmv, name="C")

    def al_term(self, inv_w, gamma: float) -> LinOp:
        """γ CᵀW⁻¹C as a matrix-free LinOp (the AL augmentation, reference
        'Use operator version': immersed_laplace.cc:653-705)."""
        n = self.shape[1]

        def mv(u):
            return gamma * self.rmv(inv_w(self.mv(u)))

        return LinOp(mv, (n, n), mv, name="AL")

    def particle_mass_term(self, gamma: float) -> LinOp:
        """γ·∫_Γ φ_i φ_j — the background mass matrix on Γ assembled from the
        quad-point table, i.e. the reference's particle AL loop
        (immersed_laplace.cc:653-705, nitsche_bcs.cc:515-572) as a matrix-free
        operator."""
        n = self.shape[1]

        def mv(u):
            vals = self.interp_bg(u) * self.jxw
            out = jnp.zeros_like(u)
            return gamma * out.at[self.bg_dofs].add(self.bg_phi * vals[:, None])

        return LinOp(mv, (n, n), mv, name="particleAL")

    def particle_mass_diag(self, gamma: float):
        """Diagonal of :meth:`particle_mass_term` (for smoothers)."""
        out = jnp.zeros(self.shape[1], dtype=self.jxw.dtype)
        return gamma * out.at[self.bg_dofs].add(self.bg_phi ** 2 *
                                                self.jxw[:, None])

    def compact_al(self, gamma: float, w_diag=None):
        """Compact dense form of the AL matrix: the AL term only touches the
        O(n_Γ) background dofs near the immersed domain, so it is materialized
        once as a dense (m, m) block over the touched-dof set.  The apply is
        gather → dense matvec (MXU) → unique sorted scatter — far faster on
        TPU than a general scatter-add.

        ``w_diag=None`` gives the particle form γ·Σ_q φφᵀ JxW
        (immersed_laplace.cc:653-705); otherwise γ·Cᵀdiag(w)C (explicit form).
        Returns (LinOp, diag_vector)."""
        dofs = np.asarray(self.bg_dofs)
        phi = np.asarray(self.bg_phi)
        jxw = np.asarray(self.jxw)
        uniq, inv = np.unique(dofs.reshape(-1), return_inverse=True)
        inv = inv.reshape(dofs.shape)  # (nq, nloc) compact indices
        m = len(uniq)
        if w_diag is None:
            # sum_q jxw_q * phi_q phi_q^T (native accumulation when available)
            from .. import native as _native

            A = _native.accumulate_al(inv, phi, jxw, m)
        else:
            A = np.zeros((m, m))
            # C^T diag(w) C over the compact dof set
            imm_dofs = np.asarray(self.imm_dofs)
            imm_psi = np.asarray(self.imm_psi)
            w = np.asarray(w_diag)
            # C entries: row j (immersed), col i (bg compact): psi_j phi_i jxw
            n_imm = self.shape[0]
            C = np.zeros((n_imm, m))
            np.add.at(C, (imm_dofs[:, :, None],
                          np.broadcast_to(inv[:, None, :], imm_dofs.shape[:2] + (phi.shape[1],))),
                      imm_psi[:, :, None] * phi[:, None, :] * jxw[:, None, None])
            A = C.T @ (w[:, None] * C)
        Aj = jnp.asarray(gamma * A)
        uniqj = jnp.asarray(uniq)
        n = self.shape[1]

        def mv(u):
            y = Aj.astype(u.dtype) @ u[uniqj]
            out = jnp.zeros_like(u)
            return out.at[uniqj].add(y, indices_are_sorted=True,
                                     unique_indices=True)

        diag = jnp.zeros(n).at[uniqj].set(jnp.diagonal(Aj))
        return LinOp(mv, (n, n), mv, name="AL_compact"), diag

    def patch_w9(self, space, gamma: float, free=None):
        """Raw Γ-band 9-point patch weights: ``((r0, c0, pr, pc), w9)`` with
        ``w9[a, b, i, j]`` multiplying ``x[r0+i+a-1, c0+j+b-1]`` at output
        lattice point ``(r0+i, c0+j)`` — the shared core of
        :meth:`patch_stencil_al` / :meth:`patch_stencil_region` and the fused
        Chebyshev smoother's plane builder.  None when not applicable."""
        if not (hasattr(space, "n_points_1d") and space.fe.degree == 1
                and space.continuous):
            return None
        npts = space.n_points_1d
        nx, ny = npts[0], npts[1]
        dofs = np.asarray(self.bg_dofs)
        rows = dofs // nx
        cols = dofs % nx
        r0, r1 = int(rows.min()), int(rows.max())
        c0, c1 = int(cols.min()), int(cols.max())
        if r0 < 1 or c0 < 1 or r1 > ny - 2 or c1 > nx - 2:
            return None
        pr, pc = r1 - r0 + 1, c1 - c0 + 1
        phi = np.asarray(self.bg_phi)
        if free is not None:
            phi = phi * np.asarray(free, dtype=phi.dtype)[dofs]
        jxw = np.asarray(self.jxw)
        locmat = jxw[:, None, None] * phi[:, :, None] * phi[:, None, :]
        w9 = np.zeros((3, 3, pr, pc))
        for i in range(dofs.shape[1]):
            for j in range(dofs.shape[1]):
                dr = rows[:, j] - rows[:, i] + 1
                dc = cols[:, j] - cols[:, i] + 1
                np.add.at(w9, (dr, dc, rows[:, i] - r0, cols[:, i] - c0),
                          locmat[:, i, j])
        return (r0, c0, pr, pc), gamma * w9

    def patch_stencil_region(self, space, gamma: float, free=None):
        """Region form of :meth:`patch_stencil_al` for fused composition:
        returns ``(origin (r0, c0), region_mv(x2d) -> (pr, pc), diag)`` or
        None.  ``region_mv`` reads only the patch+halo slice of the lattice
        array and returns the AL contribution on the patch — the caller adds
        it in place (``out2.at[r0:r1, c0:c1].add(...)``), avoiding the
        full-lattice zeros/update/mask passes of the LinOp form.  ``free``
        (bool mask over dofs) bakes Dirichlet input-masking into the weights:
        region_mv(x) == m*AL(m*x) on the patch."""
        import jax

        if not (hasattr(space, "n_points_1d") and space.fe.degree == 1
                and space.continuous):
            return None
        npts = space.n_points_1d
        nx, ny = npts[0], npts[1]
        dofs = np.asarray(self.bg_dofs)
        rows = dofs // nx
        cols = dofs % nx
        r0, r1 = int(rows.min()), int(rows.max())
        c0, c1 = int(cols.min()), int(cols.max())
        if r0 < 1 or c0 < 1 or r1 > ny - 2 or c1 > nx - 2:
            return None
        pr, pc = r1 - r0 + 1, c1 - c0 + 1
        phi = np.asarray(self.bg_phi)
        if free is not None:
            phi = phi * np.asarray(free, dtype=phi.dtype)[dofs]
        jxw = np.asarray(self.jxw)
        locmat = jxw[:, None, None] * phi[:, :, None] * phi[:, None, :]
        w9 = np.zeros((3, 3, pr, pc))
        for i in range(dofs.shape[1]):
            for j in range(dofs.shape[1]):
                dr = rows[:, j] - rows[:, i] + 1
                dc = cols[:, j] - cols[:, i] + 1
                np.add.at(w9, (dr, dc, rows[:, i] - r0, cols[:, i] - c0),
                          locmat[:, i, j])
        w9 = jnp.asarray(gamma * w9)

        def region_mv(x2d):
            up = jax.lax.dynamic_slice(x2d, (r0 - 1, c0 - 1),
                                       (pr + 2, pc + 2))
            acc = None
            for a in range(3):
                for b in range(3):
                    term = w9[a, b].astype(x2d.dtype) * \
                        jax.lax.dynamic_slice(up, (a, b), (pr, pc))
                    acc = term if acc is None else acc + term
            return acc

        dg = np.zeros((ny, nx))
        dg[r0:r1 + 1, c0:c1 + 1] = np.asarray(w9[1, 1])
        return (r0, c0, pr, pc), region_mv, jnp.asarray(dg.reshape(-1))

    def patch_stencil_al(self, space, gamma: float):
        """Particle-form AL term as a *variable-coefficient 9-point lattice
        stencil on the Γ-band bounding patch*.

        The particle matrix Σ_q JxW_q φφᵀ only couples background dofs
        sharing a cell — lattice distance ≤ 1 — so on a Q1 uniform grid it is
        a 9-point stencil whose weights live on the O(|Γ|/h) band.  The apply
        is a static patch slice + 9 fused FMAs + one update-slice: no gather,
        no scatter, no dense matvec — replacing :meth:`compact_al`'s
        latency-bound gather→MXU→scatter (~200µs at 1M dofs) with ~µs-scale
        patch arithmetic.  Returns (LinOp, assembled diagonal) like
        :meth:`compact_al`; requires the patch to be interior to the lattice
        (Γ away from ∂Ω) — returns None when not applicable."""
        import jax

        if not (hasattr(space, "n_points_1d") and space.fe.degree == 1
                and space.continuous):
            return None
        npts = space.n_points_1d          # (nx, ny) dof order, x fastest
        nx, ny = npts[0], npts[1]
        dofs = np.asarray(self.bg_dofs)   # (nq, 4)
        rows = dofs // nx                 # lattice row (slow coord)
        cols = dofs % nx
        r0, r1 = int(rows.min()), int(rows.max())
        c0, c1 = int(cols.min()), int(cols.max())
        if r0 < 1 or c0 < 1 or r1 > ny - 2 or c1 > nx - 2:
            return None                   # band touches ∂Ω: fall back
        pr, pc = r1 - r0 + 1, c1 - c0 + 1
        phi = np.asarray(self.bg_phi)     # (nq, 4)
        jxw = np.asarray(self.jxw)
        # local matrices at each quad point: jxw * phi phi^T
        locmat = jxw[:, None, None] * phi[:, :, None] * phi[:, None, :]
        w9 = np.zeros((3, 3, pr, pc))
        for i in range(dofs.shape[1]):
            for j in range(dofs.shape[1]):
                dr = rows[:, j] - rows[:, i] + 1   # in {0,1,2}
                dc = cols[:, j] - cols[:, i] + 1
                np.add.at(w9, (dr, dc, rows[:, i] - r0, cols[:, i] - c0),
                          locmat[:, i, j])
        w9 = jnp.asarray(gamma * w9)
        n = self.shape[1]

        def mv(u):
            u2 = u.reshape(ny, nx)
            up = jax.lax.dynamic_slice(u2, (r0 - 1, c0 - 1), (pr + 2, pc + 2))
            acc = None
            for a in range(3):
                for b in range(3):
                    term = w9[a, b].astype(u.dtype) * \
                        jax.lax.dynamic_slice(up, (a, b), (pr, pc))
                    acc = term if acc is None else acc + term
            out = jnp.zeros((ny, nx), dtype=u.dtype)
            out = jax.lax.dynamic_update_slice(out, acc, (r0, c0))
            return out.reshape(-1)

        dg = np.zeros((ny, nx))
        dg[r0:r1 + 1, c0:c1 + 1] = np.asarray(w9[1, 1])
        diag = jnp.asarray(dg.reshape(-1))
        from .linop import LinOp as _LinOp

        return _LinOp(mv, (n, n), mv, name="AL_stencil"), diag

    def patch_al_lattice(self, space, gamma: float, free=None, phys=None):
        """LATTICE-RESIDENT particle-form AL apply: ``mv2(x2d) -> (ny, nx)``
        consuming and producing lattice (reversed-axis) arrays — the
        relayout-free core of :meth:`patch_stencil_al` for the lattice-mode
        inner solve (flat<->lattice reshapes on TPU are full HBM round trips
        when nx is not lane-aligned).  ``free`` (flat bool dof mask) bakes
        Dirichlet input masking into the weights, so
        ``mv2(x2) == (m * AL(m * x)).reshape(lat)`` exactly even when the
        patch halo touches a boundary row/column.  Returns ``(mv2, diag)``
        with ``diag`` the flat assembled diagonal, or None when the Γ-band
        is not interior to the lattice.  ``phys = (py, px)`` (optional):
        consume/produce lane-aligned zero-padded (py, px) arrays with the
        logical lattice top-left (padded-lattice mode; patch indices are
        absolute from the top-left corner, so they are unaffected)."""
        import jax

        pw = self.patch_w9(space, gamma, free=free)
        if pw is None:
            return None
        (r0, c0, pr, pc), w9 = pw
        npts = space.n_points_1d
        nx, ny = npts[0], npts[1]
        py, px = ((int(phys[0]), int(phys[1])) if phys is not None
                  else (ny, nx))
        w9j = jnp.asarray(w9)

        def mv2(x2d):
            up = jax.lax.dynamic_slice(x2d, (r0 - 1, c0 - 1),
                                       (pr + 2, pc + 2))
            acc = None
            for a in range(3):
                for b in range(3):
                    term = w9j[a, b].astype(x2d.dtype) * \
                        jax.lax.dynamic_slice(up, (a, b), (pr, pc))
                    acc = term if acc is None else acc + term
            out = jnp.zeros((py, px), dtype=x2d.dtype)
            return jax.lax.dynamic_update_slice(out, acc, (r0, c0))

        # the assembled diagonal stays LOGICAL (flat n_dofs) in either mode;
        # padded-mode callers pad it alongside the stencil diagonal
        dg = np.zeros((ny, nx))
        dg[r0:r0 + pr, c0:c0 + pc] = np.asarray(w9[1, 1])
        return mv2, jnp.asarray(dg.reshape(-1))

    def al_term_diag(self, w_diag, gamma: float):
        """Diagonal of γ·Cᵀdiag(w)C via deduplicated COO (host-side setup,
        feeds the GMG/Chebyshev smoother of the augmented block)."""
        rows, cols, vals = self.to_coo()
        ncols = self.shape[1]
        key = rows.astype(np.int64) * ncols + cols.astype(np.int64)
        order = np.argsort(key, kind="stable")
        key_s, vals_s = key[order], vals[order]
        starts = np.concatenate([[0], np.flatnonzero(np.diff(key_s)) + 1])
        v = np.add.reduceat(vals_s, starts)
        r = (key_s[starts] // ncols).astype(np.int64)
        c = (key_s[starts] % ncols).astype(np.int64)
        w = np.asarray(w_diag)
        d = np.zeros(ncols)
        np.add.at(d, c, w[r] * v ** 2)
        return jnp.asarray(gamma * d)

    def sum(self) -> float:
        """sum of all entries of C == |Γ| when both spaces contain constants
        (DEBUG check, nitsche_bcs.cc:467-490)."""
        phi_sum = self.bg_phi.sum(axis=1)
        psi_sum = self.imm_psi.sum(axis=1)
        return float(jnp.sum(phi_sum * psi_sum * self.jxw))

    def to_coo(self):
        """Explicit COO of C (duplicates not summed): rows (imm), cols (bg), vals."""
        nq, nb = self.bg_phi.shape
        ni = self.imm_psi.shape[1]
        rows = np.repeat(np.asarray(self.imm_dofs), nb, axis=1).reshape(-1)
        cols = np.tile(np.asarray(self.bg_dofs), (1, ni)).reshape(-1)
        vals = (np.asarray(self.imm_psi)[:, :, None] *
                np.asarray(self.bg_phi)[:, None, :] *
                np.asarray(self.jxw)[:, None, None]).reshape(-1)
        return rows, cols, vals

    def to_dense(self) -> np.ndarray:
        rows, cols, vals = self.to_coo()
        out = np.zeros(self.shape)
        np.add.at(out, (rows, cols), vals)
        return out


def build_coupling(bg_space: GridSpace, imm_space: ImmersedSpace,
                   order: int = 3) -> Coupling:
    """Assemble the quad-point coupling table ('Coupling quadrature order'
    in every reference prm)."""
    mesh = imm_space.mesh
    rule = gauss(mesh.dim, order)
    X, _, jxw = mesh.quad_geometry(rule)  # (nc, nq_pc, sd), (nc, nq_pc)
    nc, nq_pc, sd = X.shape
    flat_pts = X.reshape(-1, sd)

    # point location + background tabulation: native C++ setup kernels when
    # the shared library is available (fictitious_domain_al_preconditioners_tpu.native),
    # NumPy otherwise — identical results either way.  Adaptive (locally
    # refined) backgrounds go through their folded tabulation, which already
    # eliminates hanging-node constraints.
    from .. import native as _native

    if hasattr(bg_space, "tabulate_at"):
        bg_dofs, bg_phi = bg_space.tabulate_at(flat_pts)
    else:
        if _native.available() and hasattr(bg_space.fe, "nodes_1d"):
            grid = bg_space.grid
            cells, refs = _native.locate_points(
                flat_pts, np.asarray(grid.origin), grid.h,
                np.asarray(grid.ncells))
            bg_phi = _native.tabulate(refs, bg_space.fe.nodes_1d, grid.dim)
        else:
            cells, refs = bg_space.grid.locate(flat_pts)
            bg_phi = bg_space.fe.tabulate(refs)       # (nq, nloc_bg)
        bg_dofs = bg_space.cell_dofs[cells]           # (nq, nloc_bg)

    psi = imm_space.fe.tabulate(rule.points)          # (nq_pc, nloc_imm)
    imm_psi = np.broadcast_to(psi[None], (nc, nq_pc, psi.shape[1])).reshape(
        -1, psi.shape[1])
    imm_dofs = np.repeat(imm_space.cell_dofs[:, None, :], nq_pc, axis=1).reshape(
        -1, imm_space.cell_dofs.shape[1])

    return Coupling(bg_dofs, bg_phi, imm_dofs, imm_psi, jxw.reshape(-1),
                    (imm_space.n_dofs, bg_space.n_dofs), points=flat_pts)
