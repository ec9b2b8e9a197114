"""Tests for the muparser-compatible expression evaluator and .prm reader."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from fictitious_domain_al_preconditioners_tpu.utils.expressions import (
    ParsedFunction, compile_expression, parse_constants,
)
from fictitious_domain_al_preconditioners_tpu.utils.prm import (
    Params, dump_prm, parse_prm,
)


class TestExpressions:
    def test_arithmetic_and_power(self):
        f = compile_expression("2*x^2 + 3*x - 1", ["x"])
        x = jnp.array([0.0, 1.0, 2.0])
        np.testing.assert_allclose(f(x), [-1.0, 4.0, 13.0])

    def test_power_right_associative(self):
        f = compile_expression("2^3^2", ["x"])
        assert float(f(jnp.array([0.0]))[()] if hasattr(f(jnp.array([0.0])), "shape") else f(0.0)) == 512.0 or float(np.asarray(f(jnp.zeros(1)))) == 512.0

    def test_reference_circle_config(self):
        # Circle_parameters_smooth.prm embedded configuration
        consts = parse_constants("R=.2, Cx=.4, Cy=.4")
        assert consts == {"R": 0.2, "Cx": 0.4, "Cy": 0.4}
        fn = ParsedFunction("R*cos(2*pi*x)+Cx; R*sin(2*pi*x)+Cy",
                            constants="R=.2, Cx=.4, Cy=.4")
        pts = jnp.array([[0.0, 0.0], [0.25, 0.0], [0.5, 0.0]])
        out = np.asarray(fn(pts))
        np.testing.assert_allclose(out, [[0.6, 0.4], [0.4, 0.6], [0.2, 0.4]],
                                   atol=1e-12)

    def test_reference_rhs(self):
        fn = ParsedFunction("8*pi^2*sin(2*pi*x)*sin(2*pi*y)")
        pts = jnp.array([[0.25, 0.25]])
        np.testing.assert_allclose(np.asarray(fn(pts)),
                                   [8 * math.pi ** 2], rtol=1e-12)

    def test_if_expression_square_curve(self):
        # the square-curve parametrization uses nested if()
        expr = ("if (x < 0.25, Cx - R/2 + 4*R*x,"
                "if (x < 0.5, Cx + R/2,"
                "if (x < 0.75, Cx + R/2 - 4*R*(x - 0.5), Cx - R/2)))")
        f = compile_expression(expr, ["x"], {"Cx": 0.4, "R": 0.4})
        x = jnp.array([0.0, 0.125, 0.3, 0.6, 0.9])
        expect = [0.2, 0.4, 0.6, 0.6 - 1.6 * 0.1, 0.2]
        np.testing.assert_allclose(np.asarray(f(x)), expect, atol=1e-12)

    def test_flower(self):
        fn = ParsedFunction(
            "(R+r*cos(w*pi*x))*cos(2*pi*x)+Cx; (R+r*cos(w*pi*x))*sin(2*pi*x)+Cy",
            constants="R=.2, Cx=.4, Cy=.4, r=.015, w=10")
        out = np.asarray(fn(jnp.array([[0.0, 0.0]])))
        np.testing.assert_allclose(out, [[0.4 + 0.215, 0.4]], atol=1e-12)

    def test_comparisons_logical(self):
        f = compile_expression("if(x >= 0 && x < 1, 1, 0)", ["x"])
        np.testing.assert_allclose(np.asarray(f(jnp.array([-0.5, 0.0, 0.5, 1.5]))),
                                   [0, 1, 1, 0])

    def test_vector_function_components(self):
        fn = ParsedFunction("1;0;0")
        out = np.asarray(fn(jnp.array([[0.1, 0.2, 0.3]])))
        np.testing.assert_allclose(out, [[1, 0, 0]])
        assert fn.n_components == 3

    def test_traceable_under_jit(self):
        import jax

        fn = ParsedFunction("sin(2*pi*x)*sin(2*pi*y)")
        jitted = jax.jit(lambda p: fn(p))
        pts = jnp.array([[0.25, 0.25]])
        np.testing.assert_allclose(np.asarray(jitted(pts)), [1.0], rtol=1e-12)


PRM_SAMPLE = """
subsection Distributed Lagrange<1,2>
  set Coupling quadrature order                    = 3
  set Initial embedded space refinement            = 9
  set Solver                                       = augmented
  subsection Embedded configuration
    set Function constants  = R=.2, Cx=.4, Cy=.4
    set Function expression = R*cos(2*pi*x)+Cx; R*sin(2*pi*x)+Cy
    set Variable names      = x,y,t
  end
  subsection Schur solver control
    set Max steps     = 1000   # default: 100
    set Tolerance     = 1.e-8 # first
    set Tolerance     = 1.e-10 # duplicate set overrides
  end
end
"""


class TestPrm:
    def test_parse_nested(self):
        tree = parse_prm(PRM_SAMPLE)
        dl = tree["Distributed Lagrange<1,2>"]
        assert dl["Coupling quadrature order"] == "3"
        assert dl["Solver"] == "augmented"
        assert dl["Embedded configuration"]["Function constants"] == "R=.2, Cx=.4, Cy=.4"
        assert dl["Schur solver control"]["Tolerance"] == "1.e-10"

    def test_params_typed_access(self):
        p = Params(parse_prm(PRM_SAMPLE)).enter("Distributed Lagrange<1,2>")
        assert p.get_int("Coupling quadrature order") == 3
        assert p.get_int("Missing", 7) == 7
        ctrl = p.enter("Schur solver control")
        assert ctrl.get_float("Tolerance") == 1e-10
        assert ctrl.get_int("Max steps") == 1000

    def test_roundtrip(self):
        tree = parse_prm(PRM_SAMPLE)
        text = dump_prm(tree)
        tree2 = parse_prm(text)
        assert tree == tree2

    def test_reference_prm_files_parse(self):
        import glob
        import os

        ref = "/root/reference"
        if not os.path.isdir(ref):
            pytest.skip("reference not mounted")
        files = glob.glob(os.path.join(ref, "**/*.prm"), recursive=True)
        assert files
        for f in files:
            with open(f) as fh:
                txt = fh.read()
            if not txt.strip():
                continue
            tree = parse_prm(txt)
            assert isinstance(tree, dict)

    def test_int_list(self):
        p = Params({"ids": "0, 1, 2, 3"})
        assert p.get_int_list("ids") == [0, 1, 2, 3]
