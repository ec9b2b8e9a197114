"""Single-precision robustness regressions (the TPU solve precision).

The CPU suite runs in f64 (conftest enables x64), so these tests spawn
subprocesses WITHOUT x64 to pin the f32-only behavior that was broken and
fixed in round 3 on hardware:

- the rational preconditioner's outer stagnated under MinRes in f32
  (tolerance-stopped inner solves make the preconditioner vary between
  iterations); the f32 outer is FGMRES and must converge;
- the IBStokesAL inner CG diverged outright on the ill-scaled augmented
  block; the diag-scaled iteration with an f32 reduction floor must keep
  the outer convergent.
"""

import json
import os
import subprocess
import sys

import pytest

_REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def _run_f32(code: str, timeout: int = 900) -> dict:
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_ENABLE_X64",)}
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = _REPO
    env.setdefault("JAX_COMPILATION_CACHE_DIR",
                   os.path.join(_REPO, ".jax_cache"))
    r = subprocess.run([sys.executable, "-c", code], env=env, cwd=_REPO,
                       capture_output=True, text=True, timeout=timeout)
    assert r.returncode == 0, r.stderr[-2000:]
    line = [l for l in r.stdout.splitlines() if l.startswith("RESULT ")]
    assert line, r.stdout[-500:]
    return json.loads(line[-1][7:])


_PRELUDE = """
import json
import jax, jax.numpy as jnp
assert jnp.zeros(0).dtype == jnp.float32, "subprocess must run f32"
"""


def test_rational_f32_converges():
    out = _run_f32(_PRELUDE + """
from fictitious_domain_al_preconditioners_tpu.models import (
    ImmersedLaplaceConfig, ImmersedLaplaceProblem,
)
cfg = ImmersedLaplaceConfig(
    initial_refinement=4, initial_embedded_refinement=4,
    embedded_configuration=("R*cos(2*pi*x)+Cx; R*sin(2*pi*x)+Cy",
                            "R=.2, Cx=.4, Cy=.4"),
    embedding_rhs=("0", ""), embedded_value=("1", ""),
    solver="rational")
cfg.schur.tolerance = 3e-5
cfg.schur.reduction = 1e-6
prob = ImmersedLaplaceProblem(cfg)
prob.setup()
u, lam, info = prob.solve()
print("RESULT " + json.dumps({
    "iters": int(info.iterations), "converged": bool(info.converged),
    "constraint": float(prob.constraint_residual())}))
""")
    # pre-fix behavior: 1000 iterations (max_steps), not converged,
    # constraint ~3e-4; fixed: ~17-25 iterations
    assert out["converged"], out
    assert out["iters"] < 60, out
    assert out["constraint"] < 1e-4, out


def test_stokes_al_f32_converges():
    out = _run_f32(_PRELUDE + """
from fictitious_domain_al_preconditioners_tpu.models import (
    StokesConfig, StokesProblem,
)
from fictitious_domain_al_preconditioners_tpu.models.stokes import ALControl
cfg = StokesConfig(spacedim=2, initial_refinement=4,
                   initial_embedded_refinement=5,
                   al=ALControl(grad_div_stabilization=True,
                                inverse_diag_square=True))
cfg.outer.tolerance = 3e-4
cfg.outer.reduction = 1e-5
prob = StokesProblem(cfg)
prob.setup()
u, p, lam, info = prob.solve()
print("RESULT " + json.dumps({
    "iters": int(info.iterations), "converged": bool(info.converged),
    "constraint": float(prob.constraint_residual())}))
""")
    assert out["converged"], out
    assert out["iters"] < 60, out
    assert out["constraint"] < 1e-3, out
