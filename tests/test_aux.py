"""Tests for auxiliary subsystems: sparse COO/SpGEMM, VTU writer, CLI,
reporting."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from fictitious_domain_al_preconditioners_tpu.core import (
    GridSpace, UniformGrid, parametrized_curve,
)
from fictitious_domain_al_preconditioners_tpu.ops import (
    build_coupling, laplace_matrix, mass_matrix, imm_mass_matrix,
)
from fictitious_domain_al_preconditioners_tpu.ops.sparse import (
    COO, augmented_block_coo, coo_transpose, spgemm_ctwc,
)
from fictitious_domain_al_preconditioners_tpu.utils.report import (
    ConvergenceTable, append_results_csv,
)
from fictitious_domain_al_preconditioners_tpu.utils.vtu import (
    export_matrix_csv, write_vtu_background, write_vtu_immersed,
)


def circle_conf(pts):
    s = pts[:, 0]
    return np.stack([0.2 * np.cos(2 * np.pi * s) + 0.4,
                     0.2 * np.sin(2 * np.pi * s) + 0.4], axis=1)


class TestSparse:
    def test_coo_matches_dense(self):
        g = UniformGrid.hyper_cube(2, 0.0, 1.0, 2)
        sp = GridSpace.q(g, 1)
        K = laplace_matrix(sp)
        coo = COO.from_cell_matrix(K)
        np.testing.assert_allclose(coo.to_dense(), K.to_dense(), atol=1e-13)
        np.testing.assert_allclose(coo.diag(), np.asarray(K.diag()),
                                   atol=1e-13)

    def test_transpose(self):
        g = UniformGrid.hyper_cube(2, 0.0, 1.0, 3)
        sp = GridSpace.q(g, 1)
        mesh = parametrized_curve(circle_conf, 4)
        C = build_coupling(sp, mesh.space(1), 3)
        coo = COO.from_coupling(C)
        ct = coo_transpose(coo)
        np.testing.assert_allclose(ct.to_dense(), coo.to_dense().T, atol=1e-14)

    def test_spgemm_matches_dense(self):
        g = UniformGrid.hyper_cube(2, 0.0, 1.0, 3)
        sp = GridSpace.q(g, 1)
        mesh = parametrized_curve(circle_conf, 4)
        isp = mesh.space(1)
        C = build_coupling(sp, isp, 3)
        coo = COO.from_coupling(C)
        w = 1.0 / np.asarray(imm_mass_matrix(isp).diag()) ** 2
        got = spgemm_ctwc(coo, w).to_dense()
        Cd = coo.to_dense()
        expect = Cd.T @ np.diag(w) @ Cd
        np.testing.assert_allclose(got, expect, atol=1e-12)

    def test_augmented_block_operator_equivalence(self):
        """Explicit SpGEMM Aug matches the matrix-free operator apply —
        validates the explicit path against the operator path."""
        g = UniformGrid.hyper_cube(2, 0.0, 1.0, 3)
        sp = GridSpace.q(g, 1)
        mesh = parametrized_curve(circle_conf, 4)
        isp = mesh.space(1)
        C = build_coupling(sp, isp, 3)
        K = laplace_matrix(sp)
        M = imm_mass_matrix(isp)
        w = 1.0 / np.asarray(M.diag()) ** 2
        gamma = 10.0
        aug = augmented_block_coo(K, C, w, gamma)
        rng = np.random.default_rng(0)
        x = rng.standard_normal(sp.n_dofs)
        xj = jnp.asarray(x)
        op = np.asarray(K.mv(xj)) + gamma * np.asarray(
            C.rmv(jnp.asarray(w) * C.mv(xj)))
        np.testing.assert_allclose(aug.mv(x), op, atol=1e-11)


class TestVtu:
    def test_background_roundtrip(self, tmp_path):
        g = UniformGrid.hyper_cube(2, 0.0, 1.0, 2)
        sp = GridSpace.q(g, 1)
        u = np.arange(sp.n_dofs, dtype=float)
        path = str(tmp_path / "bg.vtu")
        write_vtu_background(path, sp, {"u": u})
        txt = open(path).read()
        assert "UnstructuredGrid" in txt
        assert 'Name="u"' in txt
        assert f'NumberOfPoints="{sp.n_dofs}"' in txt

    def test_immersed_vtu(self, tmp_path):
        mesh = parametrized_curve(circle_conf, 4)
        isp = mesh.space(1)
        path = str(tmp_path / "imm.vtu")
        write_vtu_immersed(path, isp, {"lambda": np.ones(isp.n_dofs)})
        assert 'NumberOfCells="16"' in open(path).read()

    def test_matrix_export_limit(self, tmp_path):
        small = np.eye(3)
        p = str(tmp_path / "m.csv")
        assert export_matrix_csv(p, small)
        assert len(open(p).readlines()) == 3
        big = np.zeros((2000, 2000))
        assert not export_matrix_csv(str(tmp_path / "big.csv"), big)


class TestReporting:
    def test_csv_append(self, tmp_path):
        p = str(tmp_path / "r.csv")
        append_results_csv(p, {"a": 1, "b": 2})
        append_results_csv(p, {"a": 3, "b": 4})
        lines = open(p).read().strip().splitlines()
        assert lines == ["a,b", "1,2", "3,4"]

    def test_convergence_table_rates(self):
        t = ConvergenceTable()
        t.add_row(dofs=100, L2=0.1)
        t.add_row(dofs=400, L2=0.025)
        t.evaluate_rates(["L2"])
        assert t.rows[1]["L2.rate"] == "2.00"
        assert "| dofs" in t.render()


class TestCli:
    def test_immersed_laplace_cli(self, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        prm = tmp_path / "test.prm"
        prm.write_text("""
subsection Distributed Lagrange<1,2>
  set Initial embedded space refinement = 4
  set Initial embedding space refinement = 4
  set Solver = augmented
  subsection AL preconditioner
    set Use operator version = true
    set Use diagonal inverse = true
  end
  subsection Embedded configuration
    set Function constants  = R=.2, Cx=.4, Cy=.4
    set Function expression = R*cos(2*pi*x)+Cx; R*sin(2*pi*x)+Cy
  end
  subsection Schur solver control
    set Max steps = 200
    set Tolerance = 1.e-9
  end
end
""")
        from fictitious_domain_al_preconditioners_tpu import cli

        rc = cli.main(["immersed_laplace", str(prm)])
        assert rc == 0
        assert os.path.exists(tmp_path / "used_parameters.prm")
        assert os.path.exists(tmp_path / "test.csv")
        assert os.path.exists(tmp_path / "solution_background.vtu")
