"""Unit tests for quadrature, FE tabulation, grids, and immersed meshes."""

import numpy as np
import pytest

from fictitious_domain_al_preconditioners_tpu.core import (
    FE, GridSpace, UniformGrid, boundary_mesh, gauss, hyper_sphere,
    immersed_uniform_grid, parametrized_curve,
)


class TestQuadrature:
    def test_polynomial_exactness_1d(self):
        rule = gauss(1, 3)  # exact to degree 5
        for p in range(6):
            val = np.sum(rule.weights * rule.points[:, 0] ** p)
            assert val == pytest.approx(1.0 / (p + 1), rel=1e-13)

    def test_weights_sum_2d_3d(self):
        for dim in (2, 3):
            rule = gauss(dim, 4)
            assert rule.weights.sum() == pytest.approx(1.0, rel=1e-13)
            assert rule.points.shape == (4 ** dim, dim)

    def test_mixed_monomial_2d(self):
        rule = gauss(2, 3)
        x, y = rule.points[:, 0], rule.points[:, 1]
        val = np.sum(rule.weights * x ** 2 * y ** 3)
        assert val == pytest.approx((1 / 3) * (1 / 4), rel=1e-13)


class TestFE:
    @pytest.mark.parametrize("dim,deg", [(1, 1), (1, 2), (1, 3), (2, 1), (2, 2), (3, 1), (3, 2)])
    def test_partition_of_unity(self, dim, deg):
        fe = FE(dim, deg)
        pts = np.random.default_rng(0).random((7, dim))
        vals = fe.tabulate(pts)
        assert vals.shape == (7, (deg + 1) ** dim)
        np.testing.assert_allclose(vals.sum(axis=1), 1.0, atol=1e-12)
        grads = fe.tabulate_grad(pts)
        np.testing.assert_allclose(grads.sum(axis=1), 0.0, atol=1e-11)

    @pytest.mark.parametrize("dim,deg", [(1, 2), (2, 1), (2, 3), (3, 2)])
    def test_kronecker_at_nodes(self, dim, deg):
        fe = FE(dim, deg)
        vals = fe.tabulate(fe.node_points)
        np.testing.assert_allclose(vals, np.eye(fe.n_dofs_per_cell), atol=1e-11)

    def test_gradient_finite_difference(self):
        fe = FE(2, 2)
        rng = np.random.default_rng(1)
        pts = 0.1 + 0.8 * rng.random((5, 2))
        eps = 1e-6
        g = fe.tabulate_grad(pts)
        for d in range(2):
            dp = pts.copy()
            dp[:, d] += eps
            dm = pts.copy()
            dm[:, d] -= eps
            fd = (fe.tabulate(dp) - fe.tabulate(dm)) / (2 * eps)
            np.testing.assert_allclose(g[:, :, d], fd, atol=1e-8)


class TestGrid:
    def test_hyper_cube_refine(self):
        g = UniformGrid.hyper_cube(2, 0.0, 1.0, refinement=3)
        assert g.ncells == (8, 8)
        assert g.n_cells == 64
        np.testing.assert_allclose(g.h, 0.125)
        assert g.refine().ncells == (16, 16)
        assert g.refine().coarsen().ncells == (8, 8)

    def test_locate(self):
        g = UniformGrid.hyper_cube(2, 0.0, 1.0, refinement=2)  # 4x4 cells
        pts = np.array([[0.1, 0.1], [0.9, 0.6], [1.0, 1.0], [0.0, 0.0]])
        cells, refs = g.locate(pts)
        assert cells[0] == 0
        assert cells[3] == 0
        assert cells[2] == 15  # clipped into last cell with ref (1,1)
        np.testing.assert_allclose(refs[2], [1.0, 1.0])
        np.testing.assert_allclose(refs[0], [0.4, 0.4])

    @pytest.mark.parametrize("dim,deg", [(2, 1), (2, 2), (3, 1)])
    def test_space_counts(self, dim, deg):
        g = UniformGrid.hyper_cube(dim, 0.0, 1.0, refinement=2)
        sp = GridSpace.q(g, deg)
        assert sp.n_dofs == (deg * 4 + 1) ** dim
        cd = sp.cell_dofs
        assert cd.shape == (4 ** dim, (deg + 1) ** dim)
        assert cd.max() == sp.n_dofs - 1
        # every interior lattice dof appears in 2^dim cells for deg=1
        if deg == 1:
            counts = np.bincount(cd.reshape(-1), minlength=sp.n_dofs)
            assert counts.max() == 2 ** dim

    def test_dof_points_and_boundary(self):
        g = UniformGrid.hyper_cube(2, -1.0, 1.0, refinement=1)
        sp = GridSpace.q(g, 2)  # 5x5 lattice
        pts = sp.dof_points
        assert pts.shape == (25, 2)
        np.testing.assert_allclose(pts.min(axis=0), [-1, -1])
        np.testing.assert_allclose(pts.max(axis=0), [1, 1])
        mask = sp.boundary_dof_mask()
        assert mask.sum() == 16  # 5x5 lattice boundary
        left = sp.boundary_dof_mask([0])
        assert left.sum() == 5
        np.testing.assert_allclose(pts[left][:, 0], -1.0)


class TestImmersed:
    def test_circle_measure(self):
        R = 0.2

        def conf(pts):
            s = pts[:, 0]
            return np.stack([R * np.cos(2 * np.pi * s) + 0.4,
                             R * np.sin(2 * np.pi * s) + 0.4], axis=1)

        mesh = parametrized_curve(conf, refinement=6)
        assert mesh.n_cells == 64
        # perimeter of the polygonal approximation tends to 2 pi R
        assert mesh.measure == pytest.approx(2 * np.pi * R, rel=1e-3)
        # refined mesh is closer
        finer = parametrized_curve(conf, refinement=9)
        assert abs(finer.measure - 2 * np.pi * R) < abs(mesh.measure - 2 * np.pi * R)

    def test_curve_space_dofs(self):
        def conf(pts):
            s = pts[:, 0]
            return np.stack([np.cos(2 * np.pi * s), np.sin(2 * np.pi * s)], axis=1)

        mesh = parametrized_curve(conf, refinement=4)  # 16 cells
        sp1 = mesh.space(1)
        # open [0,1] interval mesh: n+1 dofs (endpoints distinct, as in the
        # reference's non-periodic embedded hyper_cube)
        assert sp1.n_dofs == 17
        sp2 = mesh.space(2)
        assert sp2.n_dofs == 33
        dg = mesh.space(0, continuous=False)
        assert dg.n_dofs == 16

    def test_sphere_measure_and_dofs(self):
        mesh = hyper_sphere([0.0, 0.0, 0.0], 1.0, refinement=3)
        assert mesh.n_cells == 6 * 4 ** 3
        # bilinear panels underestimate the sphere area; ~1% at this level
        assert mesh.measure == pytest.approx(4 * np.pi, rel=2e-2)
        finer = hyper_sphere([0.0, 0.0, 0.0], 1.0, refinement=4)
        assert abs(finer.measure - 4 * np.pi) < 0.3 * abs(mesh.measure - 4 * np.pi)
        sp = mesh.space(1)
        # closed surface: V = F + 2 - E ... for a cube-sphere with n^2 quads
        # per face: V = 6 n^2 + 2
        n = 2 ** 3
        assert sp.n_dofs == 6 * n * n + 2

    def test_immersed_uniform_region(self):
        g = UniformGrid.hyper_rectangle([-0.14, -0.14], [0.44, 0.44], 3)
        mesh = immersed_uniform_grid(g)
        assert mesh.measure == pytest.approx(0.58 ** 2, rel=1e-12)
        sp = mesh.space(1)
        assert sp.n_dofs == 9 ** 2

    def test_boundary_mesh_2d(self):
        g = UniformGrid.hyper_cube(2, 0.0, 1.0, refinement=3)
        mesh = boundary_mesh(g)
        assert mesh.n_cells == 4 * 8
        assert mesh.measure == pytest.approx(4.0, rel=1e-12)
        sp = mesh.space(1)
        assert sp.n_dofs == 4 * 8  # closed loop: shared corners

    def test_boundary_mesh_3d(self):
        g = UniformGrid.hyper_cube(3, 0.0, 1.0, refinement=2)
        mesh = boundary_mesh(g)
        assert mesh.n_cells == 6 * 16
        assert mesh.measure == pytest.approx(6.0, rel=1e-12)
        sp = mesh.space(1)
        assert sp.n_dofs == 6 * 16 + 2  # closed surface Euler count

    def test_quad_geometry_jacobian(self):
        def conf(pts):
            s = pts[:, 0]
            return np.stack([np.cos(2 * np.pi * s), np.sin(2 * np.pi * s)], axis=1)

        mesh = parametrized_curve(conf, refinement=5)
        X, J, jxw = mesh.quad_geometry(gauss(1, 3))
        assert X.shape == (32, 3, 2)
        assert J.shape == (32, 3, 2, 1)
        # points lie near the unit circle
        np.testing.assert_allclose(np.linalg.norm(X, axis=-1), 1.0, atol=5e-3)
        # 32-gon perimeter: 64*sin(pi/32) -> 0.16% below 2*pi
        assert jxw.sum() == pytest.approx(2 * np.pi, rel=2e-3)
