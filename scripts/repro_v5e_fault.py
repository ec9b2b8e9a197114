"""Full-stack synthetic repro of the v5e runtime fault at 4097 lattices.

Committed form of the round-4 bisection harness behind PARITY.md's
"4097 fault ROOT-FIXED" entry.  Run on the tunneled v5e:

    python scripts/repro_v5e_fault.py                    # full stack: FAULTS
    PLANES=0 PRE=0 DUS=0 python scripts/repro_v5e_fault.py   # passes
    PLANES=1 PRE=0 DUS=0 python scripts/repro_v5e_fault.py   # passes (the fix composition)
    PLANES=1 PRE=1 DUS=0 DEPTH=3 COARSE=0 HOIST=0 ...        # trigger T2
    PLANES=0 PRE=0 DUS=1 DEPTH=3 COARSE=0 HOIST=0 PR=1024    # trigger T1


exp2 (CG-while + 3-level Pallas GMG, planes=None) PASSES; the real program
(which adds AL band planes, pre-mode fused kernels, 7 levels, patch DUS,
coarse dense inverse, hoisted jit) CRASHES even without the outer FGMRES
while_loop (exp4 MODE=noouter).  This repro adds ALL of those; flags peel
them off one at a time:

  PLANES=0  planes=None in fused_chebyshev (like exp2)
  PRE=0     no pre-mode kernels (V-cycle composes smooth + residual)
  DUS=0     no patch DUS AL term in the level operators
  DEPTH=3   3 levels instead of the full 7
  COARSE=0  no dense coarse inverse (plain smoother at the coarsest level)
  HOIST=0   plain jax.jit instead of jit_hoisted
"""
import os
import sys
import time

sys.path.insert(0, __import__("os").path.join(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from fictitious_domain_al_preconditioners_tpu.ops.krylov import cg
from fictitious_domain_al_preconditioners_tpu.ops.pallas_kernels import (
    _masked_conv9_pallas, fused_chebyshev_2d, stencil_factors_2d)
from fictitious_domain_al_preconditioners_tpu.parallel.lattice import (
    lattice_prolong, lattice_restrict)
from fictitious_domain_al_preconditioners_tpu.utils.hoist import jit_hoisted

F = lambda k, d: os.environ.get(k, d)
PLANES = F("PLANES", "1") == "1"
PRE = F("PRE", "1") == "1"
DUS = int(F("DUS", "1"))  # 0 off, 1 dyn-slice+DUS, 2 static+pad, 3 at.set
DEPTH = int(F("DEPTH", "7"))
COARSE = F("COARSE", "1") == "1"
HOIST = F("HOIST", "1") == "1"
NY = int(F("NY", "4097"))
PR = int(F("PR", "0"))  # patch size override (0 = geometric ~0.42*ny)
print("flags", dict(PLANES=PLANES, PRE=PRE, DUS=DUS, DEPTH=DEPTH,
                    COARSE=COARSE, HOIST=HOIST, NY=NY), flush=True)

rng = np.random.default_rng(0)
levels = []
ny = NY
for li in range(DEPTH):
    h = (1.0 / (ny - 1), 1.0 / (ny - 1))
    factors = stencil_factors_2d(h)
    st = _masked_conv9_pallas(factors, ny, ny, jnp.float32)

    # Γ-band box (the immersed disk's bounding ring, like ref-12 geometry)
    r0 = max(1, int(0.09 * (ny - 1)))
    pr = min(ny - 2 - r0, max(2, int(0.42 * (ny - 1))))
    if PR:
        pr = min(pr, PR)
    box = (r0, r0, pr, pr)

    # AL patch term via dynamic_update_slice (patch_al_lattice shape)
    w9 = (0.1 * rng.standard_normal((3, 3, pr, pr))).astype(np.float32)
    w9[1, 1] = np.abs(w9[1, 1]) + 1.0
    w9j = jnp.asarray(w9)

    def al_dus(x2, w9j=w9j, box=box, ny=ny):
        r0, c0, pr, pc = box
        if DUS == 1:     # production form: dynamic_slice reads + DUS write
            xp = jax.lax.dynamic_slice(x2, (r0 - 1, c0 - 1),
                                       (pr + 2, pc + 2))
            acc = None
            for a in range(3):
                for b in range(3):
                    t = w9j[a, b] * jax.lax.dynamic_slice(
                        xp, (a, b), (pr, pc))
                    acc = t if acc is None else acc + t
            return jax.lax.dynamic_update_slice(
                jnp.zeros((ny, ny), x2.dtype), acc, (r0, c0))
        # static-slice reads
        xp = x2[r0 - 1:r0 + 1 + pr, c0 - 1:c0 + 1 + pc]
        acc = None
        for a in range(3):
            for b in range(3):
                t = w9j[a, b] * xp[a:a + pr, b:b + pc]
                acc = t if acc is None else acc + t
        if DUS == 2:     # explicit pad-embed write (no scatter anywhere)
            return jnp.pad(acc, ((r0, ny - r0 - pr), (c0, ny - c0 - pc)))
        # DUS == 3: static at[].set write
        return jnp.zeros((ny, ny), x2.dtype).at[r0:r0 + pr,
                                                c0:c0 + pc].set(acc)

    def op(x2, st=st, al=al_dus):
        return st(x2) + (al(x2) if DUS > 0 else 0.0)

    sm_pre = sm = None
    if ny >= 512:
        planes = None
        if PLANES:
            pl = np.zeros((5, ny, ny), np.float32)
            pl[:, r0:r0 + pr, r0:r0 + pr] = 0.05 * rng.standard_normal(
                (5, pr, pr))
            pl[0, r0:r0 + pr, r0:r0 + pr] += 1.0
            planes = pl
        sm = fused_chebyshev_2d(factors, (ny, ny), planes, box, 4.0,
                                degree=4, mode="smooth")
        assert sm is not None
        if PRE:
            sm_pre = fused_chebyshev_2d(factors, (ny, ny), planes, box, 4.0,
                                        degree=4, mode="pre")
            assert sm_pre is not None
    if sm is None:
        dinv = 0.1  # rough scalar diag inverse; structure is what matters

        def sm(b, op=op, dinv=dinv):
            x = dinv * b
            for _ in range(3):
                x = x + dinv * (b - op(x))
            return x

    levels.append((ny, op, sm, sm_pre))
    ny = (ny - 1) // 2 + 1

coarse_inv = None
if COARSE:
    nc = (ny - 1) // 2 + 1 if False else ny  # coarse at last level's next
    # dense inverse on the NEXT-coarser lattice (like the real GMG): build
    # a simple SPD matrix inverse of size (ny*ny)
    nlast = levels[-1][0]
    ncoarse = (nlast - 1) // 2 + 1
    A = np.eye(ncoarse * ncoarse, dtype=np.float64) * 4.0
    coarse_inv = jnp.asarray(np.linalg.inv(A).astype(np.float32))
    print("coarse dense inverse", coarse_inv.shape, flush=True)


def vcycle(li, b):
    ny_l, op, sm, sm_pre = levels[li]
    if sm_pre is not None:
        x, r = sm_pre(b)
    else:
        x = sm(b)
        r = b - op(x)
    if li + 1 < len(levels):
        rc = lattice_restrict(r)
        xc = vcycle(li + 1, rc)
        x = x + lattice_prolong(xc)
        x = x + sm(b - op(x))
    elif coarse_inv is not None:
        rc = lattice_restrict(r)
        xc = (coarse_inv @ rc.reshape(-1)).reshape(rc.shape)
        x = x + lattice_prolong(xc)
        x = x + sm(b - op(x))
    return x


A0 = levels[0][1]
b = jnp.ones((NY, NY), jnp.float32)


def solve(b):
    x, info = cg(A0, b, M=lambda v: vcycle(0, v), tol=0.0,
                 reduction=1e-5, max_steps=40)
    return x, info


run = (jit_hoisted(solve, (jax.ShapeDtypeStruct((NY, NY), jnp.float32),))
       if HOIST else jax.jit(solve))
print("hoisted consts:", getattr(run, "n_hoisted", "n/a"), flush=True)

t0 = time.perf_counter()
x, info = run(b)
print("first run ok", float(jnp.sum(x)), "iters", int(info.iterations),
      "t", time.perf_counter() - t0, flush=True)
t0 = time.perf_counter()
x, info = run(b)
print("second run ok", float(jnp.sum(x)), "t", time.perf_counter() - t0,
      flush=True)
print("PASS")
