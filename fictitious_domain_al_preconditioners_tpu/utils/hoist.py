"""Hoist closed-over array constants out of jitted programs.

The solver builders close over large arrays at scale — the Γ-band AL stencil
weights, per-level GMG diagonals and Dirichlet masks, the background load
vector tables (O(100 MB) each at the reference's largest 16.8M-dof row,
tables/results.md:19).  Baked as jaxpr constants these ship WITH the program
to the compiler (and through the remote-compile tunnel on the tunneled-TPU
setup), capping the feasible problem size.  ``jit_hoisted`` traces the
function once, extracts EVERY constant from the closed jaxpr, parks them on
device, and re-jits the jaxpr with the constants as ordinary runtime
arguments: the compiled program is then a few KB regardless of problem size,
and the constants live in HBM like any other buffer.

(jax.closure_convert is not usable here: it only hoists constants perturbed
by an outer differentiation, and all of ours are concrete.)
"""

from __future__ import annotations

import jax
from jax import tree_util

__all__ = ["jit_hoisted"]


def jit_hoisted(fn, example_args):
    """jit ``fn`` with all closed-over array constants passed as runtime
    arguments.  ``example_args`` are arrays or ShapeDtypeStructs matching the
    call signature.  Returns ``call(*args)`` with the same semantics as
    ``jax.jit(fn)`` (same pytree outputs, jit-cached)."""
    closed, out_shape = jax.make_jaxpr(fn, return_shape=True)(*example_args)
    out_tree = tree_util.tree_structure(out_shape)
    jaxpr = closed.jaxpr
    consts = [jax.device_put(c) for c in closed.consts]

    def run_flat(consts, *flat_args):
        out_flat = jax.core.eval_jaxpr(jaxpr, consts, *flat_args)
        return tree_util.tree_unflatten(out_tree, out_flat)

    jitted = jax.jit(run_flat)
    in_tree = tree_util.tree_structure(tuple(example_args))

    def call(*args):
        flat, tree = tree_util.tree_flatten(tuple(args))
        if tree != in_tree:
            raise TypeError(
                f"jit_hoisted: argument structure {tree} does not match "
                f"the example structure {in_tree}")
        return jitted(consts, *flat)

    call.n_hoisted = len(consts)
    call.hoisted_bytes = sum(
        c.size * c.dtype.itemsize for c in consts if hasattr(c, "size"))
    return call
