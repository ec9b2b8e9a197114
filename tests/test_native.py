"""Tests for the native C++ setup kernels (ctypes) vs NumPy fallbacks."""

import numpy as np
import pytest

from fictitious_domain_al_preconditioners_tpu import native
from fictitious_domain_al_preconditioners_tpu.core import (
    FE, GridSpace, UniformGrid, parametrized_curve,
)
from fictitious_domain_al_preconditioners_tpu.ops import build_coupling


def circle_conf(pts):
    s = pts[:, 0]
    return np.stack([0.2 * np.cos(2 * np.pi * s) + 0.4,
                     0.2 * np.sin(2 * np.pi * s) + 0.4], axis=1)


class TestNative:
    def test_library_builds(self):
        assert native.available(), \
            "native library failed to build (g++ is baked into the image)"

    def test_locate_matches_python(self):
        g = UniformGrid.hyper_cube(2, -1.0, 1.0, 4)
        rng = np.random.default_rng(0)
        pts = rng.uniform(-1, 1, size=(500, 2))
        c_native, r_native = native.locate_points(
            pts, np.asarray(g.origin), g.h, np.asarray(g.ncells))
        c_py, r_py = g.locate(pts)
        np.testing.assert_array_equal(c_native, c_py)
        np.testing.assert_allclose(r_native, r_py, atol=1e-14)

    @pytest.mark.parametrize("dim,deg", [(2, 1), (2, 2), (3, 1)])
    def test_tabulate_matches_python(self, dim, deg):
        fe = FE(dim, deg)
        rng = np.random.default_rng(1)
        pts = rng.random((100, dim))
        np.testing.assert_allclose(native.tabulate(pts, fe.nodes_1d, dim),
                                   fe.tabulate(pts), atol=1e-13)

    def test_coo_dedup_matches(self):
        rng = np.random.default_rng(2)
        rows = rng.integers(0, 10, 200)
        cols = rng.integers(0, 12, 200)
        vals = rng.standard_normal(200)
        from fictitious_domain_al_preconditioners_tpu.ops.sparse import (
            coo_dedup as np_dedup,
        )

        rn, cn, vn = native.coo_dedup(rows, cols, vals, 12)
        rp, cp, vp = np_dedup(rows, cols, vals, 12)
        np.testing.assert_array_equal(rn, rp)
        np.testing.assert_array_equal(cn, cp)
        np.testing.assert_allclose(vn, vp, atol=1e-13)

    def test_accumulate_al_matches(self):
        rng = np.random.default_rng(3)
        nq, nloc, m = 300, 4, 25
        idx = rng.integers(0, m, size=(nq, nloc))
        phi = rng.standard_normal((nq, nloc))
        w = rng.random(nq)
        A = native.accumulate_al(idx, phi, w, m)
        expect = np.zeros((m, m))
        np.add.at(expect, (idx[:, :, None], idx[:, None, :]),
                  np.einsum("qa,qb,q->qab", phi, phi, w))
        np.testing.assert_allclose(A, expect, atol=1e-12)

    def test_coupling_build_uses_native(self):
        # end-to-end: coupling built with native kernels passes the measure check
        g = UniformGrid.hyper_cube(2, 0.0, 1.0, 5)
        sp = GridSpace.q(g, 1)
        mesh = parametrized_curve(circle_conf, 6)
        C = build_coupling(sp, mesh.space(1), 3)
        assert C.sum() == pytest.approx(mesh.measure, rel=1e-12)
