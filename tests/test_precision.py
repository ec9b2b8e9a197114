"""The element-form families must trace with full-f32 matmul precision.

On TPU, f32 ``dot_general`` defaults to bf16-class MXU passes; the round-4
table regen showed that corrupts the matmul-applied operators enough to
stagnate mixed-precision refinement (claimed residual 1.8e-4 vs TRUE f64
reduction 2.1e-2 on the Stokes ref-4/5 correction solve) and trip the v5e
worker watchdog via stalled 1000-iteration inner loops.  The fix bakes
``precision=HIGHEST`` into the traced solver programs
(``utils.precision.full_matmul_precision``); this pins it structurally so
a refactor can't silently drop the wrapper.
"""

import jax
import jax.extend.core as jex_core
import jax.numpy as jnp
from jax import lax


def _dot_precisions(closed_jaxpr):
    """All distinct `precision` params on dot_general eqns, recursively."""
    out = set()

    def visit(jaxpr):
        for eqn in jaxpr.eqns:
            if eqn.primitive.name == "dot_general":
                out.add(eqn.params.get("precision"))
            for v in eqn.params.values():
                if isinstance(v, jex_core.ClosedJaxpr):
                    visit(v.jaxpr)
                elif isinstance(v, jex_core.Jaxpr):
                    visit(v)
                elif isinstance(v, (tuple, list)):
                    for w in v:
                        if isinstance(w, jex_core.ClosedJaxpr):
                            visit(w.jaxpr)
                        elif isinstance(w, jex_core.Jaxpr):
                            visit(w)
        for sub in getattr(jaxpr, "jaxprs", ()):  # pragma: no cover
            visit(sub)

    visit(closed_jaxpr.jaxpr)
    return out


def test_wrapper_bakes_highest_into_trace():
    from fictitious_domain_al_preconditioners_tpu.utils.precision import (
        full_matmul_precision,
    )

    def f(a, b):
        return jnp.dot(a, b)

    a = jnp.ones((4, 4), jnp.float32)
    jx = jax.make_jaxpr(full_matmul_precision(f))(a, a)
    precs = _dot_precisions(jx)
    assert precs == {(lax.Precision.HIGHEST, lax.Precision.HIGHEST)}, precs
    # and without the wrapper the default is None (backend default)
    jx0 = jax.make_jaxpr(f)(a, a)
    assert _dot_precisions(jx0) == {None}


def test_stokes_correction_solver_traces_highest():
    from fictitious_domain_al_preconditioners_tpu.models import (
        StokesConfig, StokesProblem,
    )

    cfg = StokesConfig(initial_refinement=3, initial_embedded_refinement=3)
    prob = StokesProblem(cfg)
    prob.setup()
    layout = prob.layout
    dt = prob.rhs_u.dtype

    ex = tuple(jnp.zeros((n,), dt) for n in layout.sizes)
    corr = prob.build_correction_solver()
    jx = jax.make_jaxpr(lambda a, b, c: corr(a, b, c))(*ex)
    precs = _dot_precisions(jx)
    # every dot in the program must carry HIGHEST; None anywhere means the
    # wrapper was dropped from the build path
    assert None not in precs, precs
    assert (lax.Precision.HIGHEST, lax.Precision.HIGHEST) in precs, precs
