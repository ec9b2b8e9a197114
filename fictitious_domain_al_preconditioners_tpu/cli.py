"""Command-line drivers — the reference's four executables, one subcommand
each (reference L7: ``./<exe> <file>.prm``, immersed_laplace.cc:1046-1088):

    python -m fictitious_domain_al_preconditioners_tpu.cli immersed_laplace <file>.prm
    python -m fictitious_domain_al_preconditioners_tpu.cli elliptic_interface <file>.prm
    python -m fictitious_domain_al_preconditioners_tpu.cli elasticity <file>.prm
    python -m fictitious_domain_al_preconditioners_tpu.cli stokes <file>.prm [--3d]
    python -m fictitious_domain_al_preconditioners_tpu.cli nitsche_bcs <file>.prm

Each run echoes the resolved configuration to ``used_parameters.prm``
(immersed_laplace.cc:1063), appends ``<prm-stem>.csv`` results rows
(dofs_background, dofs_immersed, outer_iterations — C22) and writes VTU output.
"""

from __future__ import annotations

import dataclasses
import os
import sys


def _echo_used_parameters(prm_path: str, cfg):
    """Write used_parameters.prm with the resolved config (flat echo)."""
    from .utils.prm import dump_prm

    def to_tree(obj):
        out = {}
        for f in dataclasses.fields(obj):
            v = getattr(obj, f.name)
            if dataclasses.is_dataclass(v):
                out[f.name] = to_tree(v)
            else:
                out[f.name] = str(v)
        return out

    with open("used_parameters.prm", "w") as fh:
        fh.write(dump_prm({type(cfg).__name__: to_tree(cfg)}) + "\n")


def run_immersed_laplace(prm_path: str):
    from .models import ImmersedLaplaceConfig, ImmersedLaplaceProblem
    from .utils.report import append_results_csv
    from .utils.vtu import write_vtu_background, write_vtu_immersed

    cfg = ImmersedLaplaceConfig.from_prm(prm_path)
    _echo_used_parameters(prm_path, cfg)
    prob = ImmersedLaplaceProblem(cfg)
    prob.setup()
    prob.solve()
    print(f"Background dofs: {prob.results['dofs_background']}, "
          f"immersed dofs: {prob.results['dofs_immersed']}")
    print(f"Outer iterations: {prob.results['outer_iterations']} "
          f"(converged={prob.results['converged']})")
    print(f"Constraint residual: {prob.constraint_residual():.3e}")
    stem = os.path.splitext(os.path.basename(prm_path))[0]
    append_results_csv(f"{stem}.csv", {
        "dofs_background": prob.results["dofs_background"],
        "dofs_immersed": prob.results["dofs_immersed"],
        "outer_iterations": prob.results["outer_iterations"]})
    if prob.space.n_dofs < 2e6:
        write_vtu_background("solution_background.vtu", prob.space,
                             {"u": prob.u})
        write_vtu_immersed("multiplier.vtu", prob.imm_space,
                           {"lambda": prob.lam})
    print(prob.timer.summary())
    return prob


def run_elliptic_interface(prm_path: str):
    from .models import EllipticInterfaceConfig, EllipticInterfaceProblem
    from .utils.vtu import write_vtu_background, write_vtu_immersed

    cfg = EllipticInterfaceConfig.from_prm(prm_path)
    _echo_used_parameters(prm_path, cfg)
    prob = EllipticInterfaceProblem(cfg)
    table = prob.run()
    print(table.render())
    if prob.space.n_dofs < 1e6:
        write_vtu_background(
            os.path.join(cfg.output_directory, "solution-background.vtu"),
            prob.space, {"u": prob.u})
        write_vtu_immersed(
            os.path.join(cfg.output_directory, "solution-immersed.vtu"),
            prob.fg_space, {"u2": prob.u2, "lambda": prob.lam})
    print(prob.timer.summary())
    return prob


def run_elasticity(prm_path: str):
    from .models import ElasticityInterfaceConfig, ElasticityInterfaceProblem

    cfg = ElasticityInterfaceConfig.from_prm(prm_path)
    _echo_used_parameters(prm_path, cfg)
    prob = ElasticityInterfaceProblem(cfg)
    prob.setup()
    its = prob.solve()
    print(f"Outer iterations: {its} (converged={prob.results['converged']})")
    print(f"Constraint residual: {prob.constraint_residual():.3e}")
    print(prob.timer.summary())
    return prob


def run_stokes(prm_path: str, spacedim: int = 2):
    from .models import StokesConfig, StokesProblem
    from .utils.report import append_results_csv

    cfg = StokesConfig.from_prm(prm_path, spacedim=spacedim)
    _echo_used_parameters(prm_path, cfg)
    prob = StokesProblem(cfg)
    prob.setup()
    prob.solve()
    print(f"Outer iterations: {prob.results['outer_iterations']} "
          f"(converged={prob.results['converged']})")
    stem = os.path.splitext(os.path.basename(prm_path))[0]
    append_results_csv(f"{stem}.csv", {
        "dofs_background": prob.results["dofs_background"],
        "dofs_immersed": prob.results["dofs_immersed"],
        "outer_iterations": prob.results["outer_iterations"]})
    print(prob.timer.summary())
    return prob


def run_nitsche(prm_path: str):
    from .models import NitscheConfig, NitscheProblem

    cfg = NitscheConfig.from_prm(prm_path)
    _echo_used_parameters(prm_path, cfg)
    prob = NitscheProblem(cfg)
    table = prob.run()
    print("\nRefinement study summary:")
    print(table.render())
    print(prob.timer.summary())
    return prob


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) < 2:
        print(__doc__)
        return 1
    cmd, prm = argv[0], argv[1]
    # f64 on CPU matches the reference's double-precision solves; on TPU the
    # run stays f32 (tolerances below ~1e-7 then act as "iterate to fp32
    # stagnation or max steps")
    import jax

    try:
        backend = jax.default_backend()
    except RuntimeError as e:
        # the configured accelerator plugin failed to initialize (e.g. the
        # TPU tunnel is held by another process) — fall back to CPU rather
        # than crash: the CLI is also the reference-parity (f64) surface
        print(f"[fdal] accelerator backend unavailable ({e}); "
              "falling back to CPU", file=sys.stderr)
        jax.config.update("jax_platforms", "cpu")
        backend = jax.default_backend()
    if backend == "cpu":
        jax.config.update("jax_enable_x64", True)
    else:
        print(f"[fdal] running on {jax.default_backend()} in float32; "
              "tolerances below ~1e-7 are unreachable in single precision")
    try:
        if cmd == "immersed_laplace":
            run_immersed_laplace(prm)
        elif cmd == "elliptic_interface":
            run_elliptic_interface(prm)
        elif cmd == "elasticity":
            run_elasticity(prm)
        elif cmd == "stokes":
            run_stokes(prm, spacedim=3 if "--3d" in argv else 2)
        elif cmd == "nitsche_bcs":
            run_nitsche(prm)
        else:
            print(f"unknown problem {cmd!r}")
            return 1
    except Exception as exc:  # mirror the reference's top-level try/catch
        print("----------------------------------------------------")
        print(f"Exception on processing:\n{exc}\nAborting!")
        print("----------------------------------------------------")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
