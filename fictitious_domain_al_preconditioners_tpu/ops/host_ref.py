"""Host-side float64 reference applies of the augmented DLM system.

TPUs (v5e) have no native f64, but the reference's solve-quality targets are
1e-10..1e-12 absolute residuals in f64 (parameters/*/: 'Schur solver control
Tolerance').  These NumPy applies reproduce the EXACT operator the jitted f32
solver iterates on — constrained lattice stiffness + particle AL term +
coupling blocks — in f64 on the host, so a mixed-precision iterative
refinement wrapper (models.immersed_laplace.solve_refined) can drive the TRUE
f64 residual to reference tolerances with the TPU doing all the heavy
lifting in f32.  Traffic per refinement step is two host<->device vector
transfers; the host work is a handful of O(n) passes.

Reference: immersed_laplace.cc:891-944 (the augmented outer system whose
residual SolverFGMRES controls), SURVEY §6 solve-quality targets.
"""

from __future__ import annotations

import numpy as np

__all__ = ["HostAugmentedSystem", "HostEllipticSystem", "HostStokesSystem",
           "HostElasticitySystem"]


class _HostVectorCoupling:
    """f64 componentwise vector coupling from a scalar quad-point table
    (models.stokes.VectorCoupling semantics: component-major flat vectors)."""

    def __init__(self, scalar, sd: int):
        self.sd = sd
        self.bg_dofs = np.asarray(scalar.bg_dofs)
        self.bg_phi = np.asarray(scalar.bg_phi, dtype=np.float64)
        self.imm_dofs = np.asarray(scalar.imm_dofs)
        self.imm_psi = np.asarray(scalar.imm_psi, dtype=np.float64)
        self.jxw = np.asarray(scalar.jxw, dtype=np.float64)
        self.nu = scalar.shape[1]
        self.m = scalar.shape[0]

    def _s_mv(self, us):              # (nu, k)
        vals = np.einsum("qak,qa->qk", us[self.bg_dofs],
                         self.bg_phi) * self.jxw[:, None]
        out = np.zeros((self.m, us.shape[1]))
        np.add.at(out, self.imm_dofs,
                  self.imm_psi[:, :, None] * vals[:, None, :])
        return out

    def _st_mv(self, lam_s):          # (m, k)
        vals = np.einsum("qak,qa->qk", lam_s[self.imm_dofs],
                         self.imm_psi) * self.jxw[:, None]
        out = np.zeros((self.nu, lam_s.shape[1]))
        np.add.at(out, self.bg_dofs,
                  self.bg_phi[:, :, None] * vals[:, None, :])
        return out

    def mv(self, u):
        return self._s_mv(u.reshape(self.sd, self.nu).T).T.reshape(-1)

    def rmv(self, lam):
        return self._st_mv(lam.reshape(self.sd, self.m).T).T.reshape(-1)


def _host_cg(mv, b, dinv, tol=1e-14, max_steps=2000):
    """Plain f64 CG with diagonal preconditioning (host mass solves: the
    immersed/pressure mass matrices are well-conditioned, ~30 iterations).
    ``b`` may be (n,) or (n, k)."""
    x = np.zeros_like(b)
    r = b - mv(x)
    z = dinv * r if np.ndim(dinv) == 0 or r.ndim == 1 else dinv[:, None] * r
    p = z.copy()
    rz = np.sum(r * z, axis=0)
    nb = max(float(np.sqrt(np.sum(b * b))), 1e-300)
    def _safe_div(a, b):
        return np.divide(a, b, out=np.zeros_like(a), where=b != 0)

    for _ in range(max_steps):
        Ap = mv(p)
        alpha = _safe_div(rz, np.sum(p * Ap, axis=0))
        x = x + alpha * p
        r = r - alpha * Ap
        if float(np.sqrt(np.sum(r * r))) <= tol * nb:
            break
        z = dinv * r if np.ndim(dinv) == 0 or r.ndim == 1 else \
            dinv[:, None] * r
        rz_new = np.sum(r * z, axis=0)
        p = z + _safe_div(rz_new, rz) * p
        rz = rz_new
    return x


class _HostCellMat:
    """f64 host apply of an ops.operators.CellMatrix (element form):
    gather -> local matvec -> bincount scatter.  Exactly the assembled
    matrix, in double precision, without materializing COO."""

    def __init__(self, cm, scale: float = 1.0):
        self.row = np.asarray(cm.row_dofs)
        self.col = np.asarray(cm.col_dofs)
        self.local = np.asarray(cm.local, dtype=np.float64) * scale
        self.coef = (None if cm.coef is None
                     else np.asarray(cm.coef, dtype=np.float64))
        self.shape = cm.shape
        self.shared = self.local.ndim == 2

    def mv(self, x):
        """y = A x; ``x`` may be (n,) or (n, k) (small k, host mass CG)."""
        xe = x[self.col]                 # (c, b) or (c, b, k)
        eq = "ab,cb...->ca..." if self.shared else "cab,cb...->ca..."
        ye = np.einsum(eq, self.local, xe)
        if self.coef is not None:
            ye = ye * (self.coef[:, None] if ye.ndim == 2
                       else self.coef[:, None, None])
        if x.ndim == 1:
            return np.bincount(self.row.reshape(-1), weights=ye.reshape(-1),
                               minlength=self.shape[0])
        out = np.zeros((self.shape[0], x.shape[1]))
        np.add.at(out, self.row, ye)
        return out

    def rmv(self, y):
        ye = y[self.row]
        if self.coef is not None:
            ye = ye * self.coef[:, None]
        if self.shared:
            xe = ye @ self.local
        else:
            xe = np.einsum("cab,ca->cb", self.local, ye)
        return np.bincount(self.col.reshape(-1), weights=xe.reshape(-1),
                           minlength=self.shape[1])


def _axis_apply(v, off, diag, bdiag, axis):
    """3-point symmetric Toeplitz with boundary diagonal, along ``axis``."""
    v = np.moveaxis(v, axis, 0)
    out = diag * v
    out[:-1] += off * v[1:]
    out[1:] += off * v[:-1]
    out[0] += (bdiag - diag) * v[0]
    out[-1] += (bdiag - diag) * v[-1]
    return np.moveaxis(out, 0, axis)


class HostAugmentedSystem:
    """f64 apply + rhs of the augmented 2x2 system

        [ Aug  Cᵀ ] [u]   [P(b₀ + γ CᵀW⁻¹ g) + (I-P) g_D]
        [ C    0  ] [λ] = [g]

    with Aug = P(K + γ·Σ_q φφᵀ JxW)P + (I-P) (operator form, diagonal W),
    built from an :class:`~..models.immersed_laplace.ImmersedLaplaceProblem`
    after ``setup()`` (uniform Q1 lattice only)."""

    def __init__(self, prob):
        cfg = prob.cfg
        assert cfg.use_operator_form and cfg.use_diagonal_inverse, \
            "host reference apply: operator form + diagonal W only"
        sp = prob.space
        assert hasattr(sp, "n_points_1d"), "uniform lattice only"
        self.shape = tuple(reversed(sp.n_points_1d))   # lattice axis order
        self.h = tuple(float(x) for x in reversed(sp.grid.h))
        self.gamma = cfg.gamma / prob.curve.h_max
        self.free = np.asarray(prob.free, dtype=bool)
        C = prob.C
        self.bg_dofs = np.asarray(C.bg_dofs)
        self.bg_phi = np.asarray(C.bg_phi, dtype=np.float64)
        self.imm_dofs = np.asarray(C.imm_dofs)
        self.imm_psi = np.asarray(C.imm_psi, dtype=np.float64)
        self.jxw = np.asarray(C.jxw, dtype=np.float64)
        self.n = sp.n_dofs
        self.m = prob.imm_space.n_dofs
        self.inv_w = 1.0 / np.asarray(prob.M.diag(), dtype=np.float64)
        self.rhs_f = np.asarray(prob.rhs_f, dtype=np.float64)
        self.rhs_g = np.asarray(prob.rhs_g, dtype=np.float64)
        self.bc = np.asarray(prob.bc_values, dtype=np.float64)

    # -- block actions -----------------------------------------------------

    def k_mv(self, u):
        ul = u.reshape(self.shape)
        out = np.zeros_like(ul)
        dim = len(self.shape)
        for d in range(dim):
            term = ul
            for ax in range(dim):
                h = self.h[ax]
                if ax == d:
                    term = _axis_apply(term, -1.0 / h, 2.0 / h, 1.0 / h, ax)
                else:
                    term = _axis_apply(term, h / 6.0, 2.0 * h / 3.0,
                                       h / 3.0, ax)
            out = out + term
        return out.reshape(-1)

    def al_mv(self, u):
        vals = np.einsum("qa,qa->q", u[self.bg_dofs], self.bg_phi) * self.jxw
        out = np.zeros(self.n)
        np.add.at(out, self.bg_dofs, self.bg_phi * vals[:, None])
        return self.gamma * out

    def c_mv(self, u):
        vals = np.einsum("qa,qa->q", u[self.bg_dofs], self.bg_phi) * self.jxw
        out = np.zeros(self.m)
        np.add.at(out, self.imm_dofs, self.imm_psi * vals[:, None])
        return out

    def ct_mv(self, lam):
        vals = np.einsum("qa,qa->q", lam[self.imm_dofs], self.imm_psi) * \
            self.jxw
        out = np.zeros(self.n)
        np.add.at(out, self.bg_dofs, self.bg_phi * vals[:, None])
        return out

    def aug_mv(self, u):
        m = self.free
        um = np.where(m, u, 0.0)
        return np.where(m, self.k_mv(um) + self.al_mv(um), u)

    def apply(self, u, lam):
        """Full block apply -> (row0, row1).  Cᵀ is NOT masked in row 0,
        matching the jitted outer operator (AA in _augmented_run)."""
        return (self.aug_mv(u) + self.ct_mv(lam), self.c_mv(u))

    def rhs(self):
        """The augmented right-hand side (matches _augmented_run)."""
        m = self.free
        g = np.where(m, 0.0, self.bc)
        b0 = np.where(m, self.rhs_f - self.k_mv(g), self.bc)
        b0 = b0 + np.where(m, self.gamma * self.ct_mv(self.inv_w * self.rhs_g),
                           0.0)
        return b0, self.rhs_g

    def residual(self, u, lam):
        b0, b1 = self.rhs()
        r0, r1 = self.apply(u, lam)
        return b0 - r0, b1 - r1


class HostEllipticSystem:
    """f64 host apply + rhs of the EllipticInterfaceDLM 3x3 block system

        [A11_aug  A12   Cᵀ ] [u ]   [P(f1 - β1 A1 g_D) + (I-P) g_D]
        [A21      A22   -M ] [u2] = [f2]
        [C        -M    0  ] [λ ]   [0]

    with A11_aug = P(β1 A1 + AL11)P + (I-P), A12 = -γ1 Cᵀ W⁻¹ M,
    A21 = -γ2 M W⁻¹ C, A22 = (β2-β1) A2 + γ2 M W⁻¹ M — mirroring
    models.elliptic_interface._build_solver exactly, for all four W
    variants (elliptic_interface.cc:700-739): W = diag(M·M) / M² in the
    default form, W = diag(M) / M in the h-scaled and operator forms; the
    exact (non-diagonal) inverses run as nested f64 host CG.
    Built from an :class:`~..models.elliptic_interface
    .EllipticInterfaceProblem` after ``setup()``.

    Reference: elliptic_interface.cc:798-858 (system blocks), :700-739
    (W⁻¹ options); drives models.elliptic_interface.solve_refined to the
    reference's 1e-10..1e-12 outer tolerances
    (parameters_elliptic_interface/*.prm) with the TPU iterating in f32."""

    def __init__(self, prob):
        cfg = prob.cfg
        self.n = prob.space.n_dofs
        self.m = prob.fg_space.n_dofs
        self.beta_1 = float(prob.beta_1)
        gamma_1, gamma_2 = prob.gamma_bg, prob.gamma_imm
        if cfg.use_h_scaled_mass or cfg.use_operator_form:
            h_imm = prob.fg_mesh.h_max
            gamma_1, gamma_2 = gamma_1 / h_imm ** 2, gamma_2 / h_imm ** 2
        self.gamma_1, self.gamma_2 = float(gamma_1), float(gamma_2)

        self.A1 = _HostCellMat(prob.A1)
        self.A2 = _HostCellMat(prob.A2, scale=float(prob.A2_scale))
        self.M = _HostCellMat(prob.M)

        C = prob.C
        self.bg_dofs = np.asarray(C.bg_dofs)
        self.bg_phi = np.asarray(C.bg_phi, dtype=np.float64)
        self.imm_dofs = np.asarray(C.imm_dofs)
        self.imm_psi = np.asarray(C.imm_psi, dtype=np.float64)
        self.jxw = np.asarray(C.jxw, dtype=np.float64)

        # W variants: mass_w -> W = (diag(M) | M); else W = (diag(M·M) | M²)
        self.diag_w = bool(cfg.use_diagonal_inverse)
        self.mass_w = bool(cfg.use_h_scaled_mass or cfg.use_operator_form)
        self.mdiag_inv = 1.0 / np.asarray(prob.M.diag(), dtype=np.float64)
        if self.diag_w:
            if self.mass_w:
                self.w_diag = self.mdiag_inv
            else:
                from ..precond.weights import inv_diag_of_m_squared
                import jax.numpy as jnp

                self.w_diag = np.asarray(
                    inv_diag_of_m_squared(prob.M)(jnp.ones(self.m)),
                    dtype=np.float64)

        self.operator_form = bool(cfg.use_operator_form)
        if self.operator_form:
            # particle AL quad table at the builder's quadrature order
            from .coupling import build_coupling

            Cp = build_coupling(prob.space, prob.fg_space,
                                order=2 * cfg.background_space_degree + 1)
            self.al_dofs = np.asarray(Cp.bg_dofs)
            self.al_phi = np.asarray(Cp.bg_phi, dtype=np.float64)
            self.al_jxw = np.asarray(Cp.jxw, dtype=np.float64)

        self.free = np.asarray(prob.free, dtype=bool)
        self.bc = np.asarray(prob.bc_values, dtype=np.float64)
        self.rhs_f1 = np.asarray(prob.rhs_f1, dtype=np.float64)
        self.rhs_f2 = np.asarray(prob.rhs_f2, dtype=np.float64)

    # -- block actions -----------------------------------------------------

    def c_mv(self, u):
        vals = np.einsum("qa,qa->q", u[self.bg_dofs], self.bg_phi) * self.jxw
        out = np.zeros(self.m)
        np.add.at(out, self.imm_dofs, self.imm_psi * vals[:, None])
        return out

    def ct_mv(self, lam):
        vals = np.einsum("qa,qa->q", lam[self.imm_dofs],
                         self.imm_psi) * self.jxw
        out = np.zeros(self.n)
        np.add.at(out, self.bg_dofs, self.bg_phi * vals[:, None])
        return out

    def inv_w(self, x):
        """W⁻¹x for the active variant; exact inverses via Jacobi-CG in f64
        (one solve for W = M, nested for W = M²)."""
        if self.diag_w:
            return self.w_diag * x
        y = _host_cg(self.M.mv, x, self.mdiag_inv)
        return y if self.mass_w else _host_cg(self.M.mv, y, self.mdiag_inv)

    def al11_mv(self, u):
        if self.operator_form:
            vals = np.einsum("qa,qa->q", u[self.al_dofs],
                             self.al_phi) * self.al_jxw
            out = np.zeros(self.n)
            np.add.at(out, self.al_dofs, self.al_phi * vals[:, None])
            return self.gamma_1 * out
        return self.gamma_1 * self.ct_mv(self.inv_w(self.c_mv(u)))

    def a11_aug_mv(self, u):
        m = self.free
        um = np.where(m, u, 0.0)
        a = self.beta_1 * self.A1.mv(um) + self.al11_mv(um)
        return np.where(m, a, u)

    def a22_mv(self, u2):
        return self.A2.mv(u2) + self.gamma_2 * self.M.mv(
            self.inv_w(self.M.mv(u2)))

    def apply(self, u, u2, lam):
        """Full 3x3 block apply -> (row0, row1, row2).  A12/Cᵀ are NOT
        masked in row 0, matching the jitted system_operator."""
        r0 = (self.a11_aug_mv(u)
              - self.gamma_1 * self.ct_mv(self.inv_w(self.M.mv(u2)))
              + self.ct_mv(lam))
        r1 = (-self.gamma_2 * self.M.mv(self.inv_w(self.c_mv(u)))
              + self.a22_mv(u2) - self.M.mv(lam))
        r2 = self.c_mv(u) - self.M.mv(u2)
        return r0, r1, r2

    def rhs(self):
        m = self.free
        g = np.where(m, 0.0, self.bc)
        b0 = np.where(m, self.rhs_f1 - self.beta_1 * self.A1.mv(g), self.bc)
        return b0, self.rhs_f2, np.zeros(self.m)

    def residual(self, u, u2, lam):
        b0, b1, b2 = self.rhs()
        r0, r1, r2 = self.apply(u, u2, lam)
        return b0 - r0, b1 - r1, b2 - r2


class HostStokesSystem:
    """f64 host apply + rhs of the IBStokesAL 3x3 block system

        [Aug  Bᵀ  Cᵀ] [u]   [P(f - A g_D) + (I-P)g_D + γ P CᵀW⁻¹ g]
        [B    0   0 ] [p] = [-B g_D]
        [C    0   0 ] [λ]   [g - C g_D]

    with Aug = constrain(A) + γ CᵀW⁻¹C (+ γ_gd Bᵀ Mp⁻¹ B when grad-div is
    not assembled into A) and B/C condensed on velocity — mirroring
    models.stokes._build_ibstokes_al exactly.  W⁻¹ = diag(M_Γ)⁻² or
    (M_Γ⁻¹)² via f64 host CG (stokes_immersed_boundary.cc:965-985).
    Built from a :class:`~..models.stokes.StokesProblem` after ``setup()``.
    """

    def __init__(self, prob):
        cfg = prob.cfg
        self.sd = sd = cfg.spacedim
        self.gamma = float(cfg.al.gamma)
        self.gamma_gd = float(cfg.al.gamma_grad_div)
        self.grad_div_in_a = bool(cfg.al.grad_div_stabilization)
        self.A = _HostCellMat(prob.A)
        self.B = _HostCellMat(prob.B)
        self.Mp = _HostCellMat(prob.Mp)
        self.Mimm = _HostCellMat(prob.M_imm_s)
        self.mp_lump_inv = 1.0 / np.asarray(prob.Mp.row_sums(),
                                            dtype=np.float64)
        self.m = prob.M_imm_s.shape[0]
        self.nu = prob.vel_space.n_dofs
        self.Cv = _HostVectorCoupling(prob.Cs, sd)
        self.diag_w = bool(cfg.al.inverse_diag_square)
        self.mdiag_inv = 1.0 / np.asarray(prob.M_imm_s.diag(),
                                          dtype=np.float64)
        self.free = np.asarray(prob.free, dtype=bool)
        self.bc = np.asarray(prob.bc_values, dtype=np.float64)
        self.rhs_u = np.asarray(prob.rhs_u, dtype=np.float64)
        self.rhs_g = np.asarray(prob.rhs_g, dtype=np.float64)

    def c_mv(self, u):
        return self.Cv.mv(u)

    def ct_mv(self, lam):
        return self.Cv.rmv(lam)

    def inv_w(self, lam):
        ls = lam.reshape(self.sd, self.m).T
        if self.diag_w:
            out = (self.mdiag_inv ** 2)[:, None] * ls
        else:
            out = _host_cg(self.Mimm.mv, _host_cg(self.Mimm.mv, ls,
                                                  self.mdiag_inv),
                           self.mdiag_inv)
        return out.T.reshape(-1)

    def mp_inv(self, p):
        return _host_cg(self.Mp.mv, p, self.mp_lump_inv)

    # -- block actions ------------------------------------------------------

    def _a_c(self, u):
        m = self.free
        return np.where(m, self.A.mv(np.where(m, u, 0.0)), u)

    def _b_c(self, u):
        return self.B.mv(np.where(self.free, u, 0.0))

    def _bt_c(self, p):
        return np.where(self.free, self.B.rmv(p), 0.0)

    def _c_c(self, u):
        return self.c_mv(np.where(self.free, u, 0.0))

    def _ct_c(self, lam):
        return np.where(self.free, self.ct_mv(lam), 0.0)

    def aug_mv(self, u):
        out = self._a_c(u) + self.gamma * self._ct_c(
            self.inv_w(self._c_c(u)))
        if not self.grad_div_in_a:
            out = out + self.gamma_gd * self._bt_c(
                self.mp_inv(self._b_c(u)))
        return out

    def apply(self, u, p, lam):
        r0 = self.aug_mv(u) + self._bt_c(p) + self._ct_c(lam)
        r1 = self._b_c(u)
        r2 = self._c_c(u)
        return r0, r1, r2

    def rhs(self):
        m = self.free
        g = np.where(m, 0.0, self.bc)
        b0 = np.where(m, self.rhs_u - self.A.mv(g), self.bc)
        b0 = b0 + np.where(m, self.gamma * self.ct_mv(self.inv_w(self.rhs_g)),
                           0.0)
        b1 = -self.B.mv(g)
        b2 = self.rhs_g - self.c_mv(g)
        return b0, b1, b2

    def residual(self, u, p, lam):
        b0, b1, b2 = self.rhs()
        r0, r1, r2 = self.apply(u, p, lam)
        return b0 - r0, b1 - r1, b2 - r2


class HostNitscheSystem:
    """f64 host apply + rhs of the Nitsche boundary-multiplier 2x2 system

        [K + M + γ(1/h)Σφφᵀ   Cᵀ] [u]   [f + γ(1/h)(g,φ)_∂Ω]
        [C                    0 ] [λ] = [(g, μ)]

    (models.nitsche_bcs._build_solver; nitsche_bcs.cc:515-632).  No strong
    Dirichlet rows — the boundary condition IS the multiplier equation."""

    def __init__(self, prob):
        cfg = prob.cfg
        self.K = _HostCellMat(prob.K)
        self.Mbulk = _HostCellMat(prob.Mbulk)
        C = prob.C
        self.n = prob.space.n_dofs
        self.m = prob.mult_space.n_dofs
        self.bg_dofs = np.asarray(C.bg_dofs)
        self.bg_phi = np.asarray(C.bg_phi, dtype=np.float64)
        self.imm_dofs = np.asarray(C.imm_dofs)
        self.imm_psi = np.asarray(C.imm_psi, dtype=np.float64)
        self.jxw = np.asarray(C.jxw, dtype=np.float64)
        self.gal = float(cfg.gamma) / float(prob.bmesh.h_max)
        self.rhs_f = np.asarray(prob.rhs_f, dtype=np.float64)
        self.rhs_g = np.asarray(prob.rhs_g, dtype=np.float64)
        # consistent rhs augmentation γ(1/h)(g, φ)_∂Ω from the quad table
        g_q = np.asarray(prob.g_fn(np.asarray(C.points)), dtype=np.float64)
        aug = np.zeros(self.n)
        np.add.at(aug, self.bg_dofs,
                  self.bg_phi * (g_q * self.jxw)[:, None])
        self.aug_rhs = self.gal * aug

    def c_mv(self, u):
        vals = np.einsum("qa,qa->q", u[self.bg_dofs], self.bg_phi) * self.jxw
        out = np.zeros(self.m)
        np.add.at(out, self.imm_dofs, self.imm_psi * vals[:, None])
        return out

    def ct_mv(self, lam):
        vals = np.einsum("qa,qa->q", lam[self.imm_dofs],
                         self.imm_psi) * self.jxw
        out = np.zeros(self.n)
        np.add.at(out, self.bg_dofs, self.bg_phi * vals[:, None])
        return out

    def al_mv(self, u):
        vals = np.einsum("qa,qa->q", u[self.bg_dofs], self.bg_phi) * self.jxw
        out = np.zeros(self.n)
        np.add.at(out, self.bg_dofs, self.bg_phi * vals[:, None])
        return self.gal * out

    def apply(self, u, lam):
        r0 = (self.K.mv(u) + self.Mbulk.mv(u) + self.al_mv(u)
              + self.ct_mv(lam))
        return r0, self.c_mv(u)

    def rhs(self):
        return self.rhs_f + self.aug_rhs, self.rhs_g

    def residual(self, u, lam):
        b0, b1 = self.rhs()
        r0, r1 = self.apply(u, lam)
        return b0 - r0, b1 - r1


class HostElasticitySystem:
    """f64 host apply + rhs of the 3D elasticity-interface 3x3 system
    (models.elasticity._build_solver; reconstructed executable — see that
    module's header).  Same block structure as the elliptic system with
    vector fields, W = M² componentwise, homogeneous Dirichlet data:

        [A11(=P A1 P + (I-P) + γ1 CᵀW⁻¹C)  A12   Cᵀ  ] [u ]   [P f1]
        [A21                               A22   -M  ] [u2] = [f2]
        [C                                 -M    0   ] [λ ]   [0]
    """

    def __init__(self, prob):
        cfg = prob.cfg
        self.dim = dim = cfg.dim
        self.gamma_1 = float(prob.gamma_bg)
        self.gamma_2 = float(prob.gamma_imm)
        self.A1 = _HostCellMat(prob.A1)
        self.A2 = _HostCellMat(prob.A2)
        self.Mimm = _HostCellMat(prob.M)
        self.Cv = _HostVectorCoupling(prob.Cs, dim)
        self.n_fg_s = prob.fg_gridspace.n_dofs
        self.diag_w = bool(cfg.use_diagonal_inverse)
        self.mdiag_inv = 1.0 / np.asarray(prob.M.diag(), dtype=np.float64)
        self.free = np.asarray(prob.free, dtype=bool)
        self.rhs_f1 = np.asarray(prob.rhs_f1, dtype=np.float64)
        self.rhs_f2 = np.asarray(prob.rhs_f2, dtype=np.float64)

    def m_vec(self, x):
        v = x.reshape(self.dim, self.n_fg_s).T
        return self.Mimm.mv(v).T.reshape(-1)

    def inv_w(self, lam):
        ls = lam.reshape(self.dim, self.n_fg_s).T
        if self.diag_w:
            out = (self.mdiag_inv ** 2)[:, None] * ls
        else:
            out = _host_cg(self.Mimm.mv, _host_cg(self.Mimm.mv, ls,
                                                  self.mdiag_inv),
                           self.mdiag_inv)
        return out.T.reshape(-1)

    def a11_mv(self, u):
        m = self.free
        a = np.where(m, self.A1.mv(np.where(m, u, 0.0)), u)
        # AL term is NOT masked (models.elasticity.AL11)
        return a + self.gamma_1 * self.Cv.rmv(self.inv_w(self.Cv.mv(u)))

    def a22_mv(self, u2):
        return self.A2.mv(u2) + self.gamma_2 * self.m_vec(
            self.inv_w(self.m_vec(u2)))

    def apply(self, u, u2, lam):
        r0 = (self.a11_mv(u)
              - self.gamma_1 * self.Cv.rmv(self.inv_w(self.m_vec(u2)))
              + self.Cv.rmv(lam))
        r1 = (-self.gamma_2 * self.m_vec(self.inv_w(self.Cv.mv(u)))
              + self.a22_mv(u2) - self.m_vec(lam))
        r2 = self.Cv.mv(u) - self.m_vec(u2)
        return r0, r1, r2

    def rhs(self):
        b0 = np.where(self.free, self.rhs_f1, 0.0)
        return b0, self.rhs_f2, np.zeros(self.rhs_f2.shape[0])

    def residual(self, u, u2, lam):
        b0, b1, b2 = self.rhs()
        r0, r1, r2 = self.apply(u, u2, lam)
        return b0 - r0, b1 - r1, b2 - r2
