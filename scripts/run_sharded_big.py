#!/usr/bin/env python
"""Large sharded-flagship validation (VERDICT r3 #6): execute the REAL
sharded solve (build_sharded_solver — outer FGMRES + AL preconditioner +
inner CG + full GMG) at multi-million-dof scale on a virtual 8-device CPU
mesh, record the hoisted compile-payload evidence and serial parity, and
write MULTICHIP_BIG.json at the repo root.

Usage:  python scripts/run_sharded_big.py [refinement]   (default 11, 4.2M)

The point: tests/test_parallel.py pins sharded-vs-serial parity at ref 5;
the hoisting claim ("the sharded program stays KB-sized at 16M+ dofs",
models/immersed_laplace.py) needs an executed data point at headline scale.
Slow (CPU f64, ~10-30 min) — run on demand, not in CI.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.abspath(os.path.join(HERE, ".."))


def _impl(ref: int) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, ROOT)
    from fictitious_domain_al_preconditioners_tpu.models import (
        ImmersedLaplaceConfig, ImmersedLaplaceProblem,
    )
    from fictitious_domain_al_preconditioners_tpu.parallel import make_mesh

    cfg = ImmersedLaplaceConfig(
        initial_refinement=ref, initial_embedded_refinement=ref,
        embedded_configuration=("R*cos(2*pi*x)+Cx; R*sin(2*pi*x)+Cy",
                                "R=.2, Cx=.4, Cy=.4"),
        embedding_rhs=("8*pi^2*sin(2*pi*x)*sin(2*pi*y)", ""),
        embedded_value=("sin(2*pi*x)*sin(2*pi*y)", ""),
        solver="augmented", use_operator_form=True,
        use_diagonal_inverse=True)
    prob = ImmersedLaplaceProblem(cfg)
    prob.setup()
    n = prob.space.n_dofs
    print(f"ref {ref}: {n:,} background dofs", flush=True)

    mesh = make_mesh(8)
    t0 = time.perf_counter()
    sharded = prob.build_sharded_solver(mesh)
    t_build = time.perf_counter() - t0
    print(f"sharded build: {t_build:.1f}s, n_hoisted={sharded.n_hoisted}, "
          f"hoisted_bytes={sharded.hoisted_bytes:,}", flush=True)

    t0 = time.perf_counter()
    u_s, lam_s, info_s = sharded(prob.rhs_f, prob.rhs_g, prob.bc_values)
    u_s = jax.block_until_ready(u_s)
    t_sharded = time.perf_counter() - t0
    print(f"sharded solve (incl. compile): {t_sharded:.1f}s, "
          f"iters={int(info_s.iterations)}, "
          f"converged={bool(info_s.converged)}", flush=True)

    t0 = time.perf_counter()
    u, lam, info = prob.solve()
    t_serial = time.perf_counter() - t0
    du = float(jnp.max(jnp.abs(u_s - u)))
    scale = float(jnp.max(jnp.abs(u))) or 1.0
    out = {
        "refinement": ref,
        "dofs_background": int(n),
        "dofs_immersed": int(prob.imm_space.n_dofs),
        "n_devices": 8,
        "platform": jax.default_backend(),
        "x64": bool(jax.config.jax_enable_x64),
        "n_hoisted": int(sharded.n_hoisted),
        "hoisted_bytes": int(sharded.hoisted_bytes),
        "sharded_iterations": int(info_s.iterations),
        "serial_iterations": int(info.iterations),
        "iteration_parity": int(info_s.iterations) == int(info.iterations),
        "max_abs_solution_drift": du,
        "relative_drift": du / scale,
        "sharded_wall_s_incl_compile": t_sharded,
        "serial_wall_s_incl_compile": t_serial,
        "build_s": t_build,
        "git": subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                              capture_output=True, text=True,
                              cwd=ROOT).stdout.strip(),
    }
    with open(os.path.join(ROOT, "MULTICHIP_BIG.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out), flush=True)
    assert out["iteration_parity"], out
    tol = 1e-9 if str(u.dtype) == "float64" else 1e-5
    assert du <= tol * scale, out
    print("PASS", flush=True)


def main():
    ref = int(sys.argv[1]) if len(sys.argv) > 1 else 11
    # NO in-process jax probe here: this environment's sitecustomize
    # registers the tunneled-TPU backend at import and a wedged tunnel makes
    # `import jax` + backend queries HANG (not raise).  Always re-exec with
    # the CPU platform forced before the interpreter starts AND via
    # jax.config (belt and braces, like tests/conftest.py).
    env = dict(os.environ)
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_ENABLE_X64"] = "1"
    env.setdefault("JAX_COMPILATION_CACHE_DIR",
                   os.path.join(ROOT, ".jax_cache"))
    code = (f"import sys; sys.path.insert(0, {ROOT!r}); "
            "import jax; jax.config.update('jax_platforms', 'cpu'); "
            "jax.config.update('jax_enable_x64', True); "
            f"sys.path.insert(0, {HERE!r}); "
            f"import run_sharded_big as m; m._impl({ref})")
    r = subprocess.run([sys.executable, "-c", code], env=env, cwd=ROOT)
    sys.exit(r.returncode)


if __name__ == "__main__":
    main()
