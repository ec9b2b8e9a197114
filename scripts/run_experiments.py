#!/usr/bin/env python
"""Batch experiment driver — loops all .prm files under parameters/ and tees
logs (reference: scripts/run_experiments.sh:1-35, which loops parameters/*/
and writes output_<name>.log).

Usage: python scripts/run_experiments.py [parameters_dir] [--problem NAME]
"""

from __future__ import annotations

import glob
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def guess_problem(prm_text: str) -> str | None:
    if "Distributed Lagrange<1,2>" in prm_text:
        if "IBStokes" in prm_text or "Velocity space" in prm_text:
            return "stokes"
        return "immersed_laplace"
    if "Distributed Lagrange<2,3>" in prm_text:
        return "stokes3d"
    if "Elliptic Interface Problem" in prm_text:
        if "lambda background" in prm_text:
            return "elasticity"
        return "elliptic_interface"
    if "Nitsche Lagrange" in prm_text:
        return "nitsche_bcs"
    return None


def main():
    from fictitious_domain_al_preconditioners_tpu import cli

    root = sys.argv[1] if len(sys.argv) > 1 else "parameters"
    files = sorted(glob.glob(os.path.join(root, "**", "*.prm"),
                             recursive=True))
    if not files:
        print(f"no .prm files under {root}")
        return 1
    for f in files:
        with open(f) as fh:
            text = fh.read()
        if not text.strip():
            continue
        problem = guess_problem(text)
        if problem is None:
            print(f"-- skipping {f} (unknown problem type)")
            continue
        name = os.path.splitext(os.path.basename(f))[0]
        log = f"output_{name}.log"
        print(f"== {problem}: {f} -> {log}")
        t0 = time.perf_counter()
        import contextlib
        import io

        buf = io.StringIO()
        try:
            with contextlib.redirect_stdout(buf):
                if problem == "stokes3d":
                    cli.run_stokes(f, spacedim=3)
                elif problem == "stokes":
                    cli.run_stokes(f, spacedim=2)
                elif problem == "immersed_laplace":
                    cli.run_immersed_laplace(f)
                elif problem == "elliptic_interface":
                    cli.run_elliptic_interface(f)
                elif problem == "elasticity":
                    cli.run_elasticity(f)
                elif problem == "nitsche_bcs":
                    cli.run_nitsche(f)
        except Exception as exc:
            buf.write(f"\nFAILED: {exc}\n")
        with open(log, "w") as fh:
            fh.write(buf.getvalue())
        print(f"   done in {time.perf_counter() - t0:.1f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
