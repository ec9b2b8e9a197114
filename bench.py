"""Benchmark: flagship AL-preconditioned immersed_laplace solve on TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: outer-iteration throughput of the full AL solve — (background dofs x
outer FGMRES iterations) / wall-clock, in MDoF-iter/s.  The reference publishes
no wall-clock numbers (BASELINE.md: its metric is h-independent iteration
counts, which tests/test_immersed_laplace.py regression-checks); vs_baseline
compares against the value recorded in bench_baseline.json if present, else 1.0.
"""

import json
import os
import sys
import time

import numpy as np

# default: 16.8M background dofs — the reference tables' LARGEST size
# (tables/results.md:19, 16,836,469 DoF row).  Feasible since the solver
# programs hoist their large closed-over constants to runtime arguments
# (utils.hoist), so the compile payload stays KB-sized at any refinement.
REFINEMENT = int(os.environ.get("BENCH_REFINEMENT", "12"))
BASELINE_FILE = os.path.join(os.path.dirname(__file__), "bench_baseline.json")


def main():
    import jax

    from fictitious_domain_al_preconditioners_tpu.models import (
        ImmersedLaplaceConfig, ImmersedLaplaceProblem,
    )

    cfg = ImmersedLaplaceConfig(
        initial_refinement=REFINEMENT,
        initial_embedded_refinement=REFINEMENT,
        embedded_configuration=("R*cos(2*pi*x)+Cx; R*sin(2*pi*x)+Cy",
                                "R=.2, Cx=.4, Cy=.4"),
        embedding_rhs=("8*pi^2*sin(2*pi*x)*sin(2*pi*y)", ""),
        embedded_value=("sin(2*pi*x)*sin(2*pi*y)", ""),
        solver="augmented",
        use_operator_form=True,
        use_diagonal_inverse=True,
        use_bf16_multigrid=False,  # measured neutral-to-slower on v5e at 1M
    )
    # f32 on TPU: outer tolerance at single-precision-reachable level
    cfg.schur.tolerance = 3e-5
    cfg.schur.reduction = 1e-6

    prob = ImmersedLaplaceProblem(cfg)
    prob.setup()

    # warmup (compile)
    u, lam, info = prob.solve()
    jax.block_until_ready(u)
    # timed run: the jitted solver itself — host-side telemetry pulls
    # (info scalars -> Python) pay ~35ms tunnel RTT each and are NOT part
    # of the solve
    run = prob._solvers[cfg.solver]
    t0 = time.perf_counter()
    u, lam, info = run(prob.rhs_f, prob.rhs_g, prob.bc_values)
    jax.block_until_ready(u)
    dt = time.perf_counter() - t0

    iters = int(info.iterations)
    dofs = prob.space.n_dofs
    value = dofs * max(iters, 1) / dt / 1e6

    # secondary kernel metric: the production constrained stiffness apply
    # (fused Dirichlet-masked Pallas stencil — the solver's actual hot op;
    # SpMV GB/s north-star, BASELINE.md)
    import jax.numpy as jnp

    k_mv = jax.jit(prob._fused_masked_k(prob.space) or
                   prob._k_apply(prob.space, prob.K))
    xx = jnp.ones(dofs, jnp.float32)
    jax.block_until_ready(k_mv(xx))
    t0 = time.perf_counter()
    reps = 50
    for _ in range(reps):
        xx = k_mv(xx)
    jax.block_until_ready(xx)
    spmv_s = (time.perf_counter() - t0) / reps
    # stencil traffic model: read + write the lattice once (f32)
    spmv_gbs = 2 * dofs * 4 / spmv_s / 1e9

    vs = 1.0
    if os.path.exists(BASELINE_FILE):
        try:
            with open(BASELINE_FILE) as fh:
                base = json.load(fh).get("value", None)
            if base:
                vs = value / base
        except Exception:
            pass

    print(json.dumps({
        "metric": "al_solve_throughput",
        "value": round(value, 3),
        "unit": "MDoF-iter/s",
        "vs_baseline": round(vs, 3),
        "detail": {
            "dofs_background": dofs,
            "dofs_immersed": prob.imm_space.n_dofs,
            "outer_iterations": iters,
            "solve_seconds": round(dt, 3),
            "converged": bool(info.converged),
            "constraint_residual": float(prob.constraint_residual()),
            "stiffness_apply_gbs": round(spmv_gbs, 2),
            "refinement": REFINEMENT,
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    sys.exit(main())
