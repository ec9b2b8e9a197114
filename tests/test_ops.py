"""Tests for assembly, operators, coupling, and Krylov solvers."""

import jax.numpy as jnp
import numpy as np
import pytest

from fictitious_domain_al_preconditioners_tpu.core import (
    GridSpace, UniformGrid, boundary_mesh, immersed_uniform_grid,
    parametrized_curve,
)
from fictitious_domain_al_preconditioners_tpu.ops import (
    build_coupling, cg, cg_condition_number, constrain, dirichlet_rhs, fgmres,
    gmres, h1_error, imm_mass_matrix, imm_rhs, imm_stiffness_matrix,
    interpolate, l2_error, lanczos_max_eig, laplace_matrix, mass_matrix,
    minres, rhs_vector,
)


def circle_conf(pts):
    s = pts[:, 0]
    return np.stack([0.2 * np.cos(2 * np.pi * s) + 0.4,
                     0.2 * np.sin(2 * np.pi * s) + 0.4], axis=1)


class TestAssembly:
    def test_mass_total_is_volume(self):
        g = UniformGrid.hyper_cube(2, -1.0, 1.0, refinement=3)
        for deg in (1, 2):
            sp = GridSpace.q(g, deg)
            M = mass_matrix(sp)
            ones = jnp.ones(sp.n_dofs)
            # 1^T M 1 = |Omega|
            assert float(ones @ M.mv(ones)) == pytest.approx(4.0, rel=1e-12)

    def test_laplace_kernel_contains_constants(self):
        g = UniformGrid.hyper_cube(2, 0.0, 1.0, refinement=2)
        sp = GridSpace.q(g, 2)
        K = laplace_matrix(sp)
        ones = jnp.ones(sp.n_dofs)
        np.testing.assert_allclose(np.asarray(K.mv(ones)), 0.0, atol=1e-12)

    def test_laplace_energy_linear_fn(self):
        # u = x  ->  (grad u, grad u) = |Omega|
        g = UniformGrid.hyper_cube(2, 0.0, 2.0, refinement=2)
        sp = GridSpace.q(g, 1)
        K = laplace_matrix(sp)
        u = jnp.asarray(sp.dof_points[:, 0])
        assert float(u @ K.mv(u)) == pytest.approx(4.0, rel=1e-12)

    def test_mass_matches_dense_reference(self):
        # tiny mesh: compare against direct dense assembly via quadrature
        g = UniformGrid.hyper_cube(1, 0.0, 1.0, refinement=1)  # 2 cells
        sp = GridSpace.q(g, 1)
        M = mass_matrix(sp).to_dense()
        h = 0.5
        exact = np.array([
            [h / 3, h / 6, 0],
            [h / 6, 2 * h / 3, h / 6],
            [0, h / 6, h / 3],
        ])
        np.testing.assert_allclose(M, exact, atol=1e-14)

    def test_rhs_and_l2_error(self):
        g = UniformGrid.hyper_cube(2, 0.0, 1.0, refinement=4)
        sp = GridSpace.q(g, 1)

        def f(p):
            return jnp.sin(jnp.pi * p[:, 0]) * jnp.sin(jnp.pi * p[:, 1])

        b = rhs_vector(sp, f)
        # sum of rhs = integral of f = (2/pi)^2
        assert float(b.sum()) == pytest.approx((2 / np.pi) ** 2, rel=1e-3)
        u = interpolate(sp, f)
        err = l2_error(sp, u, f)
        assert err < 5e-3
        # H1 error of the interpolant decays like h

        def gradf(p):
            gx = jnp.pi * jnp.cos(jnp.pi * p[:, 0]) * jnp.sin(jnp.pi * p[:, 1])
            gy = jnp.pi * jnp.sin(jnp.pi * p[:, 0]) * jnp.cos(jnp.pi * p[:, 1])
            return jnp.stack([gx, gy], axis=1)

        assert h1_error(sp, u, gradf) < 0.2

    def test_interpolation_error_convergence(self):
        def f(p):
            return jnp.sin(2 * jnp.pi * p[:, 0]) * jnp.sin(2 * jnp.pi * p[:, 1])

        errs = []
        for ref in (3, 4, 5):
            sp = GridSpace.q(UniformGrid.hyper_cube(2, 0.0, 1.0, ref), 1)
            errs.append(l2_error(sp, interpolate(sp, f), f))
        rate1 = np.log2(errs[0] / errs[1])
        rate2 = np.log2(errs[1] / errs[2])
        assert rate1 == pytest.approx(2.0, abs=0.3)
        assert rate2 == pytest.approx(2.0, abs=0.15)

    def test_immersed_mass_curve(self):
        mesh = parametrized_curve(circle_conf, refinement=6)
        sp = mesh.space(1)
        M = imm_mass_matrix(sp)
        ones = jnp.ones(sp.n_dofs)
        assert float(ones @ M.mv(ones)) == pytest.approx(mesh.measure, rel=1e-12)
        # mass matrix is SPD
        dense = M.to_dense()
        ev = np.linalg.eigvalsh(dense)
        assert ev.min() > 0

    def test_immersed_stiffness_curve(self):
        mesh = parametrized_curve(circle_conf, refinement=6)
        sp = mesh.space(1)
        A = imm_stiffness_matrix(sp)
        ones = jnp.ones(sp.n_dofs)
        np.testing.assert_allclose(np.asarray(A.mv(ones)), 0.0, atol=1e-10)
        # energy of u = s (parameter): curve param length
        # instead check SPD on the constant-complement
        dense = A.to_dense()
        ev = np.linalg.eigvalsh(dense)
        assert ev[0] == pytest.approx(0.0, abs=1e-10)  # constants
        assert ev[1] > 0

    def test_imm_rhs_total(self):
        mesh = parametrized_curve(circle_conf, refinement=5)
        sp = mesh.space(1)
        b = imm_rhs(sp, lambda p: jnp.ones(p.shape[0]))
        assert float(b.sum()) == pytest.approx(mesh.measure, rel=1e-12)


class TestConstraints:
    def test_dirichlet_poisson_1d(self):
        # -u'' = 1 on (0,1), u(0)=u(1)=0 -> u = x(1-x)/2
        g = UniformGrid.hyper_cube(1, 0.0, 1.0, refinement=5)
        sp = GridSpace.q(g, 1)
        K = laplace_matrix(sp).as_linop()
        free = ~sp.boundary_dof_mask()
        b = rhs_vector(sp, lambda p: jnp.ones(p.shape[0]))
        A = constrain(K, free)
        rhs = dirichlet_rhs(K, b, free, jnp.zeros(sp.n_dofs))
        x, info = cg(A, rhs, tol=1e-14, max_steps=200)
        exact = sp.dof_points[:, 0] * (1 - sp.dof_points[:, 0]) / 2
        np.testing.assert_allclose(np.asarray(x), exact, atol=1e-10)

    def test_inhomogeneous_dirichlet(self):
        # Laplace equation with u = x on boundary -> u = x everywhere
        g = UniformGrid.hyper_cube(2, 0.0, 1.0, refinement=3)
        sp = GridSpace.q(g, 1)
        K = laplace_matrix(sp).as_linop()
        free = ~sp.boundary_dof_mask()
        gvals = jnp.asarray(sp.dof_points[:, 0])
        rhs = dirichlet_rhs(K, jnp.zeros(sp.n_dofs), free, gvals)
        A = constrain(K, free)
        x, info = cg(A, rhs, tol=1e-14, max_steps=500)
        np.testing.assert_allclose(np.asarray(x), np.asarray(gvals), atol=1e-9)


class TestCoupling:
    def test_sum_equals_measure(self):
        g = UniformGrid.hyper_cube(2, 0.0, 1.0, refinement=5)
        bg = GridSpace.q(g, 1)
        mesh = parametrized_curve(circle_conf, refinement=6)
        sp = mesh.space(1)
        C = build_coupling(bg, sp, order=3)
        assert C.sum() == pytest.approx(mesh.measure, rel=1e-12)

    def test_patch_stencil_al_matches_compact(self):
        """The 9-point Γ-band patch stencil form of the particle AL term is
        entry-exact vs the compact dense block (both = γ Σ_q JxW φφᵀ)."""
        g = UniformGrid.hyper_cube(2, 0.0, 1.0, refinement=5)
        bg = GridSpace.q(g, 1)
        mesh = parametrized_curve(circle_conf, refinement=6)
        C = build_coupling(bg, mesh.space(1), order=3)
        gamma = 7.3
        AL_c, diag_c = C.compact_al(gamma)
        st = C.patch_stencil_al(bg, gamma)
        assert st is not None
        AL_s, diag_s = st
        x = jnp.asarray(np.random.default_rng(0).standard_normal(bg.n_dofs))
        np.testing.assert_allclose(np.asarray(AL_s(x)), np.asarray(AL_c(x)),
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(diag_s), np.asarray(diag_c),
                                   atol=1e-12)

    def test_patch_stencil_al_declines_boundary_band(self):
        """Bands touching ∂Ω (the nitsche boundary-multiplier case) fall back
        to the compact dense form."""
        from fictitious_domain_al_preconditioners_tpu.core.immersed import (
            boundary_mesh)

        g = UniformGrid.hyper_cube(2, 0.0, 1.0, refinement=4)
        bg = GridSpace.q(g, 1)
        bm = boundary_mesh(g)
        C = build_coupling(bg, bm.space(1), order=3)
        assert C.patch_stencil_al(bg, 1.0) is None

    def test_constant_interpolation(self):
        # C applied to the constant background field == M_imm applied to ones
        g = UniformGrid.hyper_cube(2, 0.0, 1.0, refinement=4)
        bg = GridSpace.q(g, 2)
        mesh = parametrized_curve(circle_conf, refinement=5)
        sp = mesh.space(1)
        C = build_coupling(bg, sp, order=4)
        M = imm_mass_matrix(sp, order=4)
        ones_bg = jnp.ones(bg.n_dofs)
        ones_imm = jnp.ones(sp.n_dofs)
        np.testing.assert_allclose(np.asarray(C.mv(ones_bg)),
                                   np.asarray(M.mv(ones_imm)), atol=1e-12)

    def test_linear_field_exact(self):
        # interpolation of a linear background field at quad points is exact
        g = UniformGrid.hyper_cube(2, 0.0, 1.0, refinement=4)
        bg = GridSpace.q(g, 1)
        mesh = parametrized_curve(circle_conf, refinement=5)
        sp = mesh.space(1)
        C = build_coupling(bg, sp, order=3)
        u = jnp.asarray(bg.dof_points[:, 0] + 2 * bg.dof_points[:, 1])
        vals = np.asarray(C.interp_bg(u))
        exact = C.points[:, 0] + 2 * C.points[:, 1]
        np.testing.assert_allclose(vals, exact, atol=1e-12)

    def test_transpose_consistency(self):
        g = UniformGrid.hyper_cube(2, 0.0, 1.0, refinement=3)
        bg = GridSpace.q(g, 1)
        mesh = parametrized_curve(circle_conf, refinement=4)
        sp = mesh.space(1)
        C = build_coupling(bg, sp)
        rng = np.random.default_rng(0)
        u = jnp.asarray(rng.standard_normal(bg.n_dofs))
        lam = jnp.asarray(rng.standard_normal(sp.n_dofs))
        # <C u, lam> == <u, C^T lam>
        a = float(C.mv(u) @ lam)
        b = float(u @ C.rmv(lam))
        assert a == pytest.approx(b, rel=1e-12)

    def test_codim0_coupling(self):
        g = UniformGrid.hyper_cube(2, -1.0, 1.0, refinement=4)
        bg = GridSpace.q(g, 1)
        region = immersed_uniform_grid(
            UniformGrid.hyper_rectangle([-0.14, -0.14], [0.44, 0.44], 3))
        sp = region.space(1)
        C = build_coupling(bg, sp, order=3)
        assert C.sum() == pytest.approx(0.58 ** 2, rel=1e-12)

    def test_boundary_coupling_sum(self):
        # nitsche-style: boundary mesh of the same grid -> sum C = |dOmega|
        g = UniformGrid.hyper_cube(2, 0.0, 1.0, refinement=4)
        bg = GridSpace.q(g, 1)
        bmesh = boundary_mesh(g)
        sp = bmesh.space(1)
        C = build_coupling(bg, sp, order=3)
        assert C.sum() == pytest.approx(4.0, rel=1e-10)


def _spd_problem(n=50, seed=0):
    rng = np.random.default_rng(seed)
    Q = np.linalg.qr(rng.standard_normal((n, n)))[0]
    ev = np.linspace(1.0, 100.0, n)
    A = Q @ np.diag(ev) @ Q.T
    b = rng.standard_normal(n)
    return jnp.asarray(A), jnp.asarray(b), ev


class TestKrylov:
    def test_cg_exact(self):
        A, b, ev = _spd_problem()
        x, info = cg(lambda v: A @ v, b, tol=1e-12, max_steps=200)
        np.testing.assert_allclose(np.asarray(A @ x), np.asarray(b), atol=1e-9)
        assert bool(info.converged)

    def test_cg_jacobi_preconditioner(self):
        A, b, _ = _spd_problem()
        d = jnp.diagonal(A)
        x, info_pc = cg(lambda v: A @ v, b, M=lambda v: v / d, tol=1e-12,
                        max_steps=200)
        np.testing.assert_allclose(np.asarray(A @ x), np.asarray(b), atol=1e-9)

    def test_cg_condition_estimate(self):
        A, b, ev = _spd_problem(n=30)
        x, info, (al, be) = cg(lambda v: A @ v, b, tol=1e-14, max_steps=100,
                               track_tridiag=True)
        est = cg_condition_number(al, be, info.iterations)
        true = ev.max() / ev.min()
        assert est == pytest.approx(true, rel=0.05)

    def test_cg_reduction_control(self):
        A, b, _ = _spd_problem()
        x, info = cg(lambda v: A @ v, b, tol=1e-30, reduction=1e-6,
                     max_steps=200)
        assert float(info.residual) <= 1e-6 * float(info.res0)

    def test_cg_fixed_iterations(self):
        A, b, _ = _spd_problem()
        x, info = cg(lambda v: A @ v, b, tol=1e-30, max_steps=5,
                     fixed_iters=True)
        assert int(info.iterations) == 5
        assert bool(info.converged)

    def test_minres_spd(self):
        A, b, _ = _spd_problem()
        x, info = minres(lambda v: A @ v, b, tol=1e-10, max_steps=300)
        np.testing.assert_allclose(np.asarray(A @ x), np.asarray(b), atol=1e-7)

    def test_minres_indefinite(self):
        # saddle-point-like symmetric indefinite system
        rng = np.random.default_rng(3)
        n, m = 40, 10
        K = rng.standard_normal((n, n))
        K = K @ K.T + n * np.eye(n)
        B = rng.standard_normal((m, n))
        A = np.block([[K, B.T], [B, np.zeros((m, m))]])
        b = rng.standard_normal(n + m)
        Aj = jnp.asarray(A)
        x, info = minres(lambda v: Aj @ v, jnp.asarray(b), tol=1e-10,
                         max_steps=500)
        np.testing.assert_allclose(np.asarray(Aj @ x), b, atol=1e-7)

    def test_gmres_nonsymmetric(self):
        rng = np.random.default_rng(1)
        n = 60
        A = np.eye(n) + 0.3 * rng.standard_normal((n, n)) / np.sqrt(n)
        b = rng.standard_normal(n)
        Aj = jnp.asarray(A)
        x, info = gmres(lambda v: Aj @ v, jnp.asarray(b), tol=1e-12,
                        max_steps=200, restart=30)
        np.testing.assert_allclose(np.asarray(Aj @ x), b, atol=1e-9)

    def test_gmres_restart_path(self):
        rng = np.random.default_rng(2)
        n = 60
        A = np.eye(n) + 0.4 * rng.standard_normal((n, n)) / np.sqrt(n)
        b = rng.standard_normal(n)
        Aj = jnp.asarray(A)
        x, info = gmres(lambda v: Aj @ v, jnp.asarray(b), tol=1e-10,
                        max_steps=500, restart=10)
        np.testing.assert_allclose(np.asarray(Aj @ x), b, atol=1e-7)
        assert int(info.iterations) > 10  # exercised a restart

    def test_fgmres_with_inner_cg_preconditioner(self):
        A, b, _ = _spd_problem(n=80)

        def M(v):
            z, _ = cg(lambda w: A @ w, v, tol=1e-2, reduction=1e-2,
                      max_steps=20)
            return z

        x, info = fgmres(lambda v: A @ v, b, M, tol=1e-11, max_steps=100,
                         restart=30)
        np.testing.assert_allclose(np.asarray(A @ x), np.asarray(b), atol=1e-8)
        assert int(info.iterations) < 15  # strong inner solve -> few outer its

    def test_fgmres_jits(self):
        import jax

        A, b, _ = _spd_problem(n=40)

        @jax.jit
        def solve(bb):
            def M(v):
                z, _ = cg(lambda w: A @ w, v, tol=1e-2, max_steps=10)
                return z

            x, info = fgmres(lambda v: A @ v, bb, M, tol=1e-10, max_steps=100,
                             restart=20)
            return x, info.iterations

        x, its = solve(b)
        np.testing.assert_allclose(np.asarray(A @ x), np.asarray(b), atol=1e-7)

    def test_lanczos_max_eig(self):
        A, _, ev = _spd_problem(n=50)
        est = lanczos_max_eig(lambda v: A @ v, 50, steps=12)
        assert est == pytest.approx(ev.max(), rel=0.02)


def test_patch_stencil_region_matches_linop():
    """Region form of the particle AL term == the LinOp form on the patch,
    and its masked weights reproduce m*AL(m*x)."""
    import numpy as np
    from fictitious_domain_al_preconditioners_tpu.core import (
        GridSpace, UniformGrid, parametrized_curve,
    )
    from fictitious_domain_al_preconditioners_tpu.ops import build_coupling

    def conf(pts):
        s = pts[:, 0]
        return np.stack([0.2 * np.cos(2 * np.pi * s) + 0.45,
                         0.2 * np.sin(2 * np.pi * s) + 0.45], axis=1)

    sp = GridSpace.q(UniformGrid.hyper_cube(2, 0.0, 1.0, 5), 1)
    curve = parametrized_curve(conf, 5)
    C = build_coupling(sp, curve.space(1), 3)
    gamma = 123.0
    AL, diag = C.patch_stencil_al(sp, gamma)
    free = ~sp.boundary_dof_mask(None)
    reg = C.patch_stencil_region(sp, gamma, free=free)
    assert reg is not None
    (r0, c0, pr, pc), region_mv, rdiag = reg
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(sp.n_dofs))
    m = jnp.asarray(free)
    want = jnp.where(m, AL(jnp.where(m, x, 0.0)), 0.0)
    nx, ny = sp.n_points_1d
    got2 = jnp.zeros((ny, nx), x.dtype).at[r0:r0 + pr, c0:c0 + pc].set(
        region_mv(x.reshape(ny, nx)))
    np.testing.assert_allclose(np.asarray(got2.reshape(-1)),
                               np.asarray(want), atol=1e-12)
    np.testing.assert_allclose(np.asarray(rdiag)[np.asarray(free)],
                               np.asarray(diag)[np.asarray(free)], atol=1e-12)
