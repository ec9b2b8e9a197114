"""lattice_band_linop: exact shift-FMA applies of banded lattice operators.

The band stencil replaces the gather->scatter coupling closures inside GMG
level smoothers (the reference feeds its AMG the explicit diag-weighted
augmented matrix, elliptic_interface.cc:821-851; we apply the same matrix
as patch-FMA planes instead of a sparse matvec).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from fictitious_domain_al_preconditioners_tpu.ops.sparse import COO, spgemm_ctwc
from fictitious_domain_al_preconditioners_tpu.ops.sparse_band import (
    lattice_band_linop)


class FakeFE:
    degree = 1


class FakeSpace:
    continuous = True
    fe = FakeFE()

    def __init__(self, nx, ny):
        self.n_points_1d = (nx, ny)


def _random_band_coo(nx, ny, band, lo, hi, rng):
    rows, cols, vals = [], [], []
    for r in range(lo, hi):
        for c in range(lo, hi):
            i = r * nx + c
            for dr in range(-band, band + 1):
                for dc in range(-band, band + 1):
                    rows.append(i)
                    cols.append((r + dr) * nx + (c + dc))
                    vals.append(rng.standard_normal())
    return COO.from_triplets(rows, cols, vals, (nx * ny, nx * ny))


class TestBandLinop:
    def test_exact_vs_dense(self):
        rng = np.random.default_rng(0)
        nx = ny = 11
        coo = _random_band_coo(nx, ny, 2, 3, 8, rng)
        lin, mv2, diag = lattice_band_linop(FakeSpace(nx, ny), coo, scale=1.7)
        dense = coo.to_dense()
        x = rng.standard_normal(nx * ny)
        np.testing.assert_allclose(np.asarray(lin(jnp.asarray(x))),
                                   1.7 * dense @ x, rtol=1e-6, atol=1e-8)
        np.testing.assert_allclose(diag, 1.7 * np.diag(dense), rtol=1e-12)

    def test_lattice_shaped_apply(self):
        rng = np.random.default_rng(1)
        nx, ny = 13, 9
        coo = _random_band_coo(nx, ny, 1, 2, 7, rng)
        lin, mv2, _ = lattice_band_linop(FakeSpace(nx, ny), coo)
        x = rng.standard_normal(nx * ny)
        flat = np.asarray(lin(jnp.asarray(x)))
        shaped = np.asarray(mv2(jnp.asarray(x).reshape(ny, nx))).reshape(-1)
        np.testing.assert_allclose(shaped, flat, rtol=1e-6)

    def test_bails_on_wide_band(self):
        rng = np.random.default_rng(2)
        nx = ny = 17
        coo = _random_band_coo(nx, ny, 6, 7, 10, rng)
        assert lattice_band_linop(FakeSpace(nx, ny), coo, max_band=4) is None

    def test_pad_path_when_halo_leaves_lattice(self):
        # rows touch r=1 with B=1: the halo leaves the lattice, so the apply
        # goes through the zero-padded slice path — still exact
        rng = np.random.default_rng(3)
        nx = ny = 9
        coo = _random_band_coo(nx, ny, 1, 1, 8, rng)
        lin, _, _ = lattice_band_linop(FakeSpace(nx, ny), coo)
        x = rng.standard_normal(nx * ny)
        np.testing.assert_allclose(np.asarray(lin(jnp.asarray(x))),
                                   coo.to_dense() @ x, rtol=1e-6, atol=1e-8)

    def test_vector_3d_exact(self):
        # 3-component 3D operator with cross-component coupling (the
        # elasticity GMG level shape, utilities.h:376-589)
        rng = np.random.default_rng(7)
        nx = ny = nz = 5

        class FakeSpace3D:
            continuous = True
            fe = FakeFE()
            n_points_1d = (nx, ny, nz)

        n = nx * ny * nz
        rows, cols, vals = [], [], []
        for ca in range(3):
            for cb in range(3):
                for r in range(1, 4):
                    for c in range(1, 4):
                        for z in range(1, 4):
                            i = (z * ny + r) * nx + c
                            for dz in (-1, 0, 1):
                                for dr in (-1, 0, 1):
                                    for dc in (-1, 0, 1):
                                        j = ((z + dz) * ny + r + dr) * nx + c + dc
                                        rows.append(ca * n + i)
                                        cols.append(cb * n + j)
                                        vals.append(rng.standard_normal())
        coo = COO.from_triplets(rows, cols, vals, (3 * n, 3 * n))
        res = lattice_band_linop(FakeSpace3D(), coo, n_comp=3)
        assert res is not None
        lin, mv_lat, diag = res
        assert mv_lat is None   # lattice-shaped boundary is scalar-2D only
        dense = coo.to_dense()
        x = rng.standard_normal(3 * n)
        np.testing.assert_allclose(np.asarray(lin(jnp.asarray(x))),
                                   dense @ x, rtol=1e-6, atol=1e-8)
        np.testing.assert_allclose(diag, np.diag(dense), rtol=1e-12)

    def test_non_lattice_space(self):
        coo = COO.from_triplets([0], [0], [1.0], (4, 4))
        assert lattice_band_linop(None, coo) is None


class TestEllipticLevelParity:
    """The band form of the GMG level surrogate gamma*C^T diag(w) C equals
    the gather/scatter closure it replaces, on the real elliptic problem."""

    @pytest.fixture(scope="class")
    def prob(self):
        from fictitious_domain_al_preconditioners_tpu.models import (
            EllipticInterfaceConfig, EllipticInterfaceProblem)

        cfg = EllipticInterfaceConfig(
            initial_background_refinement=4, initial_immersed_refinement=2,
            beta_2=1e3, use_modified_AL_preconditioner=True,
            gamma_AL_background=10.0, gamma_AL_immersed=1e-2)
        p = EllipticInterfaceProblem(cfg)
        p.setup(0)
        return p

    def test_band_matches_coupling_closure(self, prob):
        from fictitious_domain_al_preconditioners_tpu.precond.weights import (
            inv_diag_of_m_squared)

        rng = np.random.default_rng(4)
        sp = prob.space
        n_fg = prob.fg_space.n_dofs
        w_diag = np.asarray(inv_diag_of_m_squared(prob.M)(jnp.ones(n_fg)))
        gamma_1 = prob.gamma_bg
        band = lattice_band_linop(
            sp, spgemm_ctwc(COO.from_coupling(prob.C), w_diag),
            scale=gamma_1)
        assert band is not None, "table config must take the band path"
        lin, _, diag = band
        wd = jnp.asarray(w_diag)
        x = jnp.asarray(rng.standard_normal(sp.n_dofs))
        ref = gamma_1 * prob.C.rmv(wd * prob.C.mv(x))
        np.testing.assert_allclose(np.asarray(lin(x)), np.asarray(ref),
                                   rtol=1e-8, atol=1e-10)
        ref_diag = np.asarray(prob.C.al_term_diag(w_diag, gamma_1))
        np.testing.assert_allclose(diag, ref_diag, rtol=1e-8, atol=1e-12)
