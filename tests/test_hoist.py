"""utils.hoist: large closed-over constants become runtime arguments, with
identical numerics and a compile payload independent of constant size."""

import jax
import jax.numpy as jnp
import numpy as np

from fictitious_domain_al_preconditioners_tpu.utils.hoist import jit_hoisted


def test_hoisted_matches_jit_and_shrinks_payload():
    rng = np.random.default_rng(0)
    big = jnp.asarray(rng.standard_normal(50000))
    mask = jnp.asarray(np.arange(50000) % 3 == 0)

    def fn(x, s):
        def body(i, acc):
            return acc + jnp.sum(jnp.where(mask, big * x, 0.0)) * s
        tot = jax.lax.fori_loop(0, 3, body, 0.0)
        return tot, jnp.where(mask, x, 0.0)

    x = jnp.asarray(rng.standard_normal(50000))
    s = jnp.asarray(2.0)
    ex = (jax.ShapeDtypeStruct(x.shape, x.dtype),
          jax.ShapeDtypeStruct(s.shape, s.dtype))
    hoisted = jit_hoisted(fn, ex)
    a0, a1 = hoisted(x, s)
    b0, b1 = jax.jit(fn)(x, s)
    np.testing.assert_allclose(np.asarray(a0), np.asarray(b0), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(b1))
    assert hoisted.n_hoisted >= 2
    assert hoisted.hoisted_bytes >= 50000 * 8


def test_structure_mismatch_raises():
    def fn(x):
        return x * 2.0

    h = jit_hoisted(fn, (jax.ShapeDtypeStruct((4,), jnp.float64),))
    with np.testing.assert_raises(TypeError):
        h(jnp.ones(4), jnp.ones(4))
