#!/usr/bin/env python
"""Generate tables/results_tpu.md — the headline study: outer iteration counts
vs DoF (h-independence, the reference's published metric in tables/results.md)
plus TPU wall-clock, run on the real chip.

Runs in float32 on TPU (outer reduction 1e-6 — single-precision regime; the
f64 iteration parity at the reference's 1e-10 tolerances is enforced by the
CPU test suite, tests/test_baseline_tables.py).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402


def laplace_rows(refs):
    from fictitious_domain_al_preconditioners_tpu.models import (
        ImmersedLaplaceConfig, ImmersedLaplaceProblem,
    )

    rows = []
    for ref in refs:
        cfg = ImmersedLaplaceConfig(
            initial_refinement=ref, initial_embedded_refinement=ref,
            embedded_configuration=("R*cos(2*pi*x)+Cx; R*sin(2*pi*x)+Cy",
                                    "R=.2, Cx=.4, Cy=.4"),
            embedding_rhs=("8*pi^2*sin(2*pi*x)*sin(2*pi*y)", ""),
            embedded_value=("sin(2*pi*x)*sin(2*pi*y)", ""),
            solver="augmented", use_operator_form=True,
            use_diagonal_inverse=True,
            # 67M dofs: cap the FGMRES basis memory (12 x n x 4 = 3.2 GB);
            # the solve takes 4 iterations, far below any restart
            fgmres_restart=12 if ref >= 13 else 50)
        cfg.schur.tolerance = 3e-5
        cfg.schur.reduction = 1e-6
        prob = ImmersedLaplaceProblem(cfg)
        prob.setup()
        prob.solve()  # compile + run
        t0 = time.perf_counter()
        u, lam, info = prob.solve()
        jax.block_until_ready(u)
        dt = time.perf_counter() - t0
        rows.append((prob.space.n_dofs, prob.imm_space.n_dofs,
                     prob.results["outer_iterations"], dt,
                     prob.constraint_residual()))
        print("laplace", rows[-1], flush=True)
    return rows


def elliptic_rows(cycles):
    """f32 on-chip + host-f64 iterative refinement to the reference's
    1e-10 regime (parameters_elliptic_interface/*.prm Tolerance = 1e-12 is
    relative to an O(1e2) rhs; 1e-10 absolute matches).  8-cycle scale:
    elliptic_interface.cc:1136-1163."""
    from fictitious_domain_al_preconditioners_tpu.models import (
        EllipticInterfaceConfig, EllipticInterfaceProblem,
    )

    rows = []
    for cyc in cycles:
        cfg = EllipticInterfaceConfig(
            initial_background_refinement=5, initial_immersed_refinement=3,
            beta_2=1e3, use_modified_AL_preconditioner=True,
            gamma_AL_background=10.0, gamma_AL_immersed=1e-2,
            use_fixed_iterations=True)
        cfg.outer.tolerance = 3e-5
        cfg.outer.reduction = 1e-5
        prob = EllipticInterfaceProblem(cfg)
        prob.setup(cyc)
        prob.solve_refined(tol_abs=1e-10)  # warm: compile + caches
        t0 = time.perf_counter()
        u, u2, lam, hist = prob.solve_refined(tol_abs=1e-10)
        dt = time.perf_counter() - t0
        rows.append((prob.space.n_dofs, prob.fg_space.n_dofs,
                     prob.results["outer_iterations"],
                     prob.results["refine_steps"], hist[-1], dt,
                     prob.results["converged"]))
        print("elliptic", rows[-1], flush=True)
    return rows


def stokes_rows(refs, spacedim=2):
    """f32 on-chip + host-f64 refinement to the reference's 1e-8 'Stokes
    solver control' (parameters_stokes.prm; stokes_immersed_boundary.cc
    :918-1074).  ``spacedim=3``: the <2,3> instantiation
    (stokes_immersed_boundary.cc:1218-1219, parameters_stokes_3d.prm —
    sphere of radius 0.1, g = (-1,1,0), body force (1,0,0))."""
    from fictitious_domain_al_preconditioners_tpu.models import (
        StokesConfig, StokesProblem,
    )
    from fictitious_domain_al_preconditioners_tpu.models.stokes import ALControl

    rows = []
    for ref, eref in refs:
        cfg = StokesConfig(spacedim=spacedim, initial_refinement=ref,
                           initial_embedded_refinement=eref,
                           al=ALControl(grad_div_stabilization=True,
                                        inverse_diag_square=True))
        if spacedim == 3:
            cfg.dirichlet_ids = (0, 1, 2, 3, 4, 5)
            cfg.body_force = ("1;0;0", "")
            cfg.dirichlet_bc = ("0;0;0", "")
            cfg.embedded_value = ("-1;1;0", "")
        cfg.outer.tolerance = 3e-4
        cfg.outer.reduction = 1e-5
        prob = StokesProblem(cfg)
        prob.setup()
        prob.solve_refined(tol_abs=1e-8)  # warm: compile + caches
        t0 = time.perf_counter()
        u, p, lam, hist = prob.solve_refined(tol_abs=1e-8)
        dt = time.perf_counter() - t0
        rows.append((prob.results["dofs_background"],
                     prob.results["dofs_immersed"],
                     prob.results["outer_iterations"],
                     prob.results["refine_steps"], hist[-1], dt,
                     prob.results["converged"]))
        print("stokes", rows[-1], flush=True)
    return rows


def rational_rows(refs):
    """The tables/results.md:30-39 family (f=0, g=1 on the circle): MinRes +
    rational preconditioner, iterations vs DoF."""
    from fictitious_domain_al_preconditioners_tpu.models import (
        ImmersedLaplaceConfig, ImmersedLaplaceProblem,
    )

    rows = []
    for ref in refs:
        cfg = ImmersedLaplaceConfig(
            initial_refinement=ref, initial_embedded_refinement=ref,
            embedded_configuration=("R*cos(2*pi*x)+Cx; R*sin(2*pi*x)+Cy",
                                    "R=.2, Cx=.4, Cy=.4"),
            embedding_rhs=("0", ""), embedded_value=("1", ""),
            solver="rational")
        cfg.schur.tolerance = 3e-5
        cfg.schur.reduction = 1e-6
        prob = ImmersedLaplaceProblem(cfg)
        prob.setup()
        prob.solve()
        t0 = time.perf_counter()
        u, lam, info = prob.solve()
        jax.block_until_ready(u)
        dt = time.perf_counter() - t0
        rows.append((prob.space.n_dofs, prob.imm_space.n_dofs,
                     prob.results["outer_iterations"], dt,
                     prob.constraint_residual()))
        print("rational", rows[-1], flush=True)
    return rows


def refined_rows(refs):
    """Reference-tolerance (1e-10 absolute, f64 true residual) solves on TPU
    via mixed-precision iterative refinement (VERDICT r1 item 8)."""
    from fictitious_domain_al_preconditioners_tpu.models import (
        ImmersedLaplaceConfig, ImmersedLaplaceProblem,
    )

    rows = []
    for ref in refs:
        cfg = ImmersedLaplaceConfig(
            initial_refinement=ref, initial_embedded_refinement=ref,
            embedded_configuration=("R*cos(2*pi*x)+Cx; R*sin(2*pi*x)+Cy",
                                    "R=.2, Cx=.4, Cy=.4"),
            embedding_rhs=("8*pi^2*sin(2*pi*x)*sin(2*pi*y)", ""),
            embedded_value=("sin(2*pi*x)*sin(2*pi*y)", ""),
            solver="augmented", use_operator_form=True,
            use_diagonal_inverse=True)
        cfg.schur.tolerance = 1e-5
        cfg.schur.reduction = 1e-6
        prob = ImmersedLaplaceProblem(cfg)
        prob.setup()
        prob.solve_refined(tol_abs=1e-10)  # warm: compile + caches
        t0 = time.perf_counter()
        u, lam, hist = prob.solve_refined(tol_abs=1e-10)
        dt = time.perf_counter() - t0
        rows.append((prob.space.n_dofs, prob.imm_space.n_dofs,
                     prob.results["outer_iterations"],
                     prob.results["refine_steps"], hist[-1], dt,
                     prob.results["converged"]))
        print("refined", rows[-1], flush=True)
    return rows




def nitsche_rows(cycles):
    """Boundary-multiplier Dirichlet (nitsche_bcs.cc): f32 on-chip + host-f64
    iterative refinement to 1e-10 (solve_refined — round-4 wiring, now the
    hardware path; was emulated f64 on-chip).  Per-outer inner-CG accounting
    mirrors the reference's solver-signal metric (nitsche_bcs.cc:652-667);
    the 5-cycle study is parameters_nitsche.prm ('Number of refinement
    cycles = 5')."""
    from fictitious_domain_al_preconditioners_tpu.models import (
        NitscheConfig, NitscheProblem,
    )

    rows = []
    for cyc in cycles:
        cfg = NitscheConfig(use_manufactured_solution=True)
        prob = NitscheProblem(cfg)
        prob.setup(cyc)
        prob.solve_refined(tol_abs=1e-10)  # warm: compile + caches
        t0 = time.perf_counter()
        u, lam, hist = prob.solve_refined(tol_abs=1e-10)
        dt = time.perf_counter() - t0
        rows.append((prob.space.n_dofs, prob.mult_space.n_dofs,
                     prob.results["outer_its"],
                     prob.results["refine_steps"], hist[-1], dt,
                     prob.results["converged"],
                     prob.results["inner_cg_per_outer"]))
        print("nitsche", rows[-1], flush=True)
    return rows


def elasticity_rows(cycles):
    """3D elasticity interface (reconstructed executable; modified AL) —
    f32 on-chip + host-f64 refinement (VERDICT r3 #5: 3+ cycles pinned)."""
    from fictitious_domain_al_preconditioners_tpu.models import (
        ElasticityInterfaceConfig, ElasticityInterfaceProblem,
    )

    rows = []
    for cyc in cycles:
        cfg = ElasticityInterfaceConfig(use_fixed_iterations=True)
        cfg.outer.tolerance = 3e-5
        cfg.outer.reduction = 1e-5
        prob = ElasticityInterfaceProblem(cfg)
        prob.setup(cyc)
        prob.solve_refined(tol_abs=1e-10)  # warm: compile + caches
        t0 = time.perf_counter()
        u, u2, lam, hist = prob.solve_refined(tol_abs=1e-10)
        dt = time.perf_counter() - t0
        rows.append((prob.results["dofs_background"],
                     prob.results["dofs_immersed"],
                     prob.results["outer_iterations"],
                     prob.results["refine_steps"], hist[-1], dt,
                     prob.results["converged"]))
        print("elasticity", rows[-1], flush=True)
    return rows


def _res_cell(res, conv=True):
    """Residual cell with integrity marks: non-finite -> 'diverged',
    unconverged (target missed) -> an explicit annotation.  Non-finite and
    unconverged rows are never published as plain results (VERDICT r4 #1,
    ADVICE r4: nan rendered as data)."""
    import math

    if res is None or not math.isfinite(res):
        return "**diverged**"
    cell = f"{res:.1e}"
    if not conv:
        cell += " **(unconverged)**"
    return cell


def fmt_refined(rows):
    out = ["| DoF (background) | DoF (immersed) | total outer its | refine steps | true f64 residual | wall [s] |",
           "|---|---|---|---|---|---|"]
    for row in rows:
        n, m, it, ks, res, dt = row[:6]
        conv = bool(row[6]) if len(row) > 6 else True
        out.append(f"| {n:,} | {m:,} | {it} | {ks} | {_res_cell(res, conv)} "
                   f"| {dt:.2f} |")
    return "\n".join(out)


def fmt_nitsche(rows):
    out = ["| DoF (bulk) | DoF (multiplier) | total outer its | refine steps | true f64 residual | wall [s] | inner CG / outer |",
           "|---|---|---|---|---|---|---|"]
    for row in rows:
        if len(row) == 5:
            # legacy emulated-f64 row (pre-solve_refined cache format):
            # (dofs, mult_dofs, iters, wall, inner-cg/outer) — rendered so a
            # stale cache can't crash the generator; re-measured rows use
            # the 8-field format below
            n, m, it, dt, icpo = row
            out.append(f"| {n:,} | {m:,} | {it} | — | — (legacy f64 row) "
                       f"| {dt:.3f} | {icpo:.1f} |")
            continue
        n, m, it, ks, res, dt, conv, icpo = row
        out.append(f"| {n:,} | {m:,} | {it} | {ks} | "
                   f"{_res_cell(res, bool(conv))} | {dt:.3f} | {icpo:.1f} |")
    return "\n".join(out)


def fmt(rows):
    out = ["| DoF (background) | DoF (immersed) | outer iterations | solve [s] | constraint residual |",
           "|---|---|---|---|---|"]
    for n, m, it, dt, cr in rows:
        out.append(f"| {n:,} | {m:,} | {it} | {dt:.3f} | {_res_cell(cr)} |")
    return "\n".join(out)


# Measurement order = re-measurement priority on a shared single chip: the
# families the round's integrity goal needs first (elliptic at the 8-cycle
# scale, Stokes 2D through 2.4M, nitsche on the mixed-precision path), then
# the flagship, then the rest — an interrupted run still leaves the
# highest-value rows fresh in the cache.
ROWSPECS = [
    ("elliptic", "0"), ("elliptic", "1"), ("elliptic", "2"),
    ("elliptic", "3"), ("elliptic", "4"), ("elliptic", "5"),
    ("elliptic", "6"),
    ("stokes", "4:5"), ("stokes", "5:6"), ("stokes", "6:7"),
    ("stokes", "7:8"), ("stokes", "8:9"), ("stokes", "9:10"),
    ("nitsche", "0"), ("nitsche", "1"), ("nitsche", "2"),
    ("nitsche", "3"), ("nitsche", "4"),
    ("elasticity", "0"), ("elasticity", "1"), ("elasticity", "2"),
    # 3D pairings keep h_Gamma/h_bg in the reference's ~1.3-2.3 band (bg 6
    # + 1 local with sphere ref 4, parameters_stokes_3d.prm): the multiplier
    # mesh must be COARSER than the velocity grid or the DLM inf-sup
    # constant collapses (round-4's 3:2 rows: ratio 0.53, 132 its/solve;
    # at 3:0/4:1 ratio 1.3/1.7 -> 10 outer its, measured CPU f64)
    ("stokes3d", "3:0"), ("stokes3d", "4:1"), ("stokes3d", "5:2"),
    ("laplace", "7"), ("laplace", "8"), ("laplace", "9"), ("laplace", "10"),
    ("laplace", "11"), ("laplace", "12"), ("laplace", "13"),
    ("refined", "9"), ("refined", "10"),
    ("rational", "5"), ("rational", "6"), ("rational", "7"),
    ("rational", "8"), ("rational", "9"),
]


def compute_row(kind, arg):
    if kind == "laplace":
        return laplace_rows([int(arg)])[0]
    if kind == "refined":
        return refined_rows([int(arg)])[0]
    if kind == "rational":
        return rational_rows([int(arg)])[0]
    if kind == "elliptic":
        return elliptic_rows([int(arg)])[0]
    if kind == "stokes":
        r, e = arg.split(":")
        return stokes_rows([(int(r), int(e))])[0]
    if kind == "stokes3d":
        r, e = arg.split(":")
        return stokes_rows([(int(r), int(e))], spacedim=3)[0]
    if kind == "nitsche":
        return nitsche_rows([int(arg)])[0]
    if kind == "elasticity":
        return elasticity_rows([int(arg)])[0]
    raise ValueError(kind)


CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                     "tables", ".results_tpu_rows.json")

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _git_head():
    import subprocess

    try:
        return subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout.strip() or None
    except OSError:
        return None


# model file each row family solves through (everything else in the package —
# ops/, precond/, core/, utils/, parallel/ — is shared and stales ALL rows)
FAMILY_MODEL = {
    "laplace": "immersed_laplace.py", "refined": "immersed_laplace.py",
    "rational": "immersed_laplace.py", "elliptic": "elliptic_interface.py",
    "stokes": "stokes.py", "stokes3d": "stokes.py",
    "nitsche": "nitsche_bcs.py", "elasticity": "elasticity.py",
}

_DIFF_CACHE = {}


def _changed_files(row_git):
    """Files touched between a row's measurement commit and HEAD (None when
    the commit is unknown/unreachable — treated as 'everything changed')."""
    import subprocess

    if row_git not in _DIFF_CACHE:
        try:
            r = subprocess.run(
                ["git", "diff", "--name-only", f"{row_git}..HEAD"],
                capture_output=True, text=True, cwd=_REPO)
            _DIFF_CACHE[row_git] = (r.stdout.split() if r.returncode == 0
                                    else None)
        except OSError:
            _DIFF_CACHE[row_git] = None
    return _DIFF_CACHE[row_git]


def row_is_stale(kind, row_git, head):
    """A cached row is stale iff the code that PRODUCES it changed since it
    was measured: any package file outside models/, its own family's model
    file, or this script (VERDICT r4 #1: never publish rows stamped with a
    different HEAD for a family touched since — rows of UNtouched families
    remain publishable, so an incremental re-measurement workflow is
    possible on a single chip)."""
    if row_git == head:
        return False
    if not row_git:
        return True
    files = _changed_files(row_git)
    if files is None:
        return True
    pkg = "fictitious_domain_al_preconditioners_tpu/"
    models = pkg + "models/"
    mine = models + FAMILY_MODEL[kind]
    for f in files:
        if f == "scripts/make_results_table.py" or f == mine:
            return True
        if f.startswith(pkg) and not (f.startswith(models)
                                      or f.endswith("/cli.py")):
            return True
    return False


def orchestrate(only=None):
    """One subprocess per row: a row that ABORTS the TPU runtime (the axon
    worker shows shape-dependent faults even in plain XLA programs — e.g.
    the Stokes (5,6) row) kills only its own session; the table annotates it
    and moves on.

    Rows are cached in tables/.results_tpu_rows.json after each run, each
    stamped with the git HEAD at measurement time; ``--only <prefix>``
    re-runs just the rows whose ``kind:arg`` key starts with the prefix and
    reuses the cache for the rest (refreshing a family after a solver fix
    without paying for the whole matrix again).  Reused rows measured at an
    older HEAD are warned about here and annotated in the table footer."""
    import json
    import subprocess

    head = _git_head()
    results = {}
    if os.path.exists(CACHE):
        with open(CACHE) as fh:
            for k, v in json.load(fh).items():
                # old-format entries were bare row lists with no git stamp
                if not (isinstance(v, dict) and "row" in v):
                    v = {"row": v, "git": None}
                results[tuple(k.split(":", 1))] = v

    def save():
        os.makedirs(os.path.dirname(CACHE), exist_ok=True)
        with open(CACHE, "w") as fh:
            json.dump({f"{k}:{a}": v for (k, a), v in results.items()}, fh)

    for kind, arg in ROWSPECS:
        if only is not None and not f"{kind}:{arg}".startswith(only):
            # --only means ONLY: rows outside the prefix are never computed
            # here, cached or not (ADVICE r4: a missing non-matching row
            # used to fall through and silently recompute for hours).
            ent = results.get((kind, arg))
            if ent is None:
                print(f"{kind}:{arg} not in cache (skipped by --only)",
                      flush=True)
            elif row_is_stale(kind, ent.get("git"), head):
                print(f"{kind}:{arg} reusing STALE cached row "
                      f"(measured at {ent.get('git') or 'unknown'}, "
                      f"HEAD is {head})", flush=True)
            continue
        ent = results.get((kind, arg))
        if (ent is not None and ent.get("row") is not None
                and not row_is_stale(kind, ent.get("git"), head)):
            # fresh (family-aware): the producing code is unchanged since
            # measurement — reuse instead of burning another chip-hour
            print(f"{kind}:{arg} cached (fresh at {ent.get('git')})",
                  flush=True)
            continue
        cmd = [sys.executable, os.path.abspath(__file__), "--row",
               f"{kind}:{arg}"]
        try:
            r = subprocess.run(cmd, capture_output=True, text=True,
                               timeout=3600)
            line = [l for l in r.stdout.splitlines() if l.startswith("ROW ")]
            if r.returncode == 0 and line:
                results[(kind, arg)] = {"row": json.loads(line[-1][4:]),
                                        "git": head}
                print(f"{kind}:{arg} -> {results[(kind, arg)]['row']}",
                      flush=True)
            else:
                # keep the failure DIAGNOSABLE: the stderr tail goes into
                # the cache next to the null row (VERDICT r4 #6)
                results[(kind, arg)] = {"row": None, "git": head,
                                        "err": f"rc={r.returncode} "
                                               + r.stderr[-800:]}
                print(f"{kind}:{arg} FAILED rc={r.returncode} "
                      f"{r.stderr[-200:]}", flush=True)
        except subprocess.TimeoutExpired:
            results[(kind, arg)] = {"row": None, "git": head,
                                    "err": "TIMEOUT (3600 s row budget)"}
            print(f"{kind}:{arg} TIMEOUT", flush=True)
        save()
    return results, head


def fmt_with_failures(entries, formatter, failed_note):
    """``entries``: list of cache entries ``{"row":, "git":, "err":}`` (or
    None for never-run).  Renders the table for the available rows, marks
    rows measured at a different git HEAD with a trailing ``†`` (stale —
    VERDICT r4 #1: never publish silently), and lists failures with their
    recorded error summaries."""
    rows, stale_flags = [], []
    errs = []
    for ent in entries:
        row = (ent or {}).get("row")
        if row is not None:
            rows.append(tuple(row))
            stale_flags.append((ent or {}).get("stale", False))
        else:
            err = (ent or {}).get("err")
            errs.append(err.splitlines()[-1][-120:] if err else "not run")
    lines = formatter(rows).splitlines()
    for i, st in enumerate(stale_flags):
        if st:
            lines[2 + i] += " †"
    out = "\n".join(lines)
    if errs:
        out += f"\n\n{failed_note.format(n=len(errs))}: " + "; ".join(errs)
    return out


def main():
    if len(sys.argv) > 2 and sys.argv[1] == "--row":
        kind, arg = sys.argv[2].split(":", 1)
        import json

        row = compute_row(kind, arg)
        print("ROW " + json.dumps(list(row)))
        return

    only = None
    if len(sys.argv) > 2 and sys.argv[1] == "--only":
        only = sys.argv[2]
    results, head = orchestrate(only=only)

    def get(kind, args):
        out = []
        for a in args:
            ent = results.get((kind, a))
            if ent is not None:
                ent = dict(ent, stale=row_is_stale(kind, ent.get("git"),
                                                   head))
            out.append(ent)
        return out

    stale = sorted(f"{k}:{a} ({v.get('git') or 'unknown'})"
                   for (k, a), v in results.items()
                   if row_is_stale(k, v.get("git"), head))
    reused = sorted({v.get("git") for (k, a), v in results.items()
                     if v.get("git") != head
                     and not row_is_stale(k, v.get("git"), head)})

    dev = str(jax.devices()[0])
    parts = [
        "# TPU results — h-independence of AL-preconditioned outer iterations",
        "",
        f"Device: {dev}, float32, outer reduction 1e-6 (Laplace) / 1e-5.",
        "f64 iteration parity at the reference's tolerances is enforced by the",
        "CPU test suite (tests/test_baseline_tables.py).  Solve time is the",
        "cached-executable wall-clock of the full preconditioned solve.",
        "",
        "## immersed_laplace, `augmented` (operator form, diag W), circle, smooth data",
        "",
        "The last row (67.1M background dofs) is 4x the largest size the",
        "reference's committed tables reach (tables/results.md:19, 16.8M).",
        "",
        fmt_with_failures(get("laplace",
                              ["7", "8", "9", "10", "11", "12", "13"]),
                          fmt, "({n} row(s) aborted by a runtime fault)"),
        "",
        "## reference solve quality on TPU: 1e-10 absolute via iterative refinement",
        "",
        "f32 FGMRES correction solves on device; TRUE f64 residual of the",
        "augmented system evaluated on the host each step (ops.host_ref) —",
        "the reference configs' `Schur solver control Tolerance = 1.e-10`",
        "regime (parameters/circle/*.prm), unreachable in plain f32.",
        "",
        fmt_with_failures(get("refined", ["9", "10"]), fmt_refined,
                          "({n} row(s) aborted by a runtime fault)"),
        "",
        "## immersed_laplace, `rational` (AAA fractional prec), f=0 g=1 circle",
        "",
        "f32 outer is FGMRES, f64 is MinRes — see",
        "models/immersed_laplace._build_rational for the why.",
        "",
        fmt_with_failures(get("rational", ["5", "6", "7", "8", "9"]), fmt,
                          "({n} row(s) aborted by a runtime fault)"),
        "",
        "## elliptic_interface, modified AL, beta jump 1e3 — f32 + refinement to 1e-10",
        "",
        "f32 on-chip solves + host-f64 iterative refinement (ops.host_ref",
        ".HostEllipticSystem): the reference's 8-cycle study scale",
        "(elliptic_interface.cc:1136-1163) at its 1e-10 residual regime.",
        "'total outer its' sums the outer FGMRES iterations across the",
        "refinement steps; per-solve counts are total/steps.",
        "",
        fmt_with_failures(get("elliptic",
                              ["0", "1", "2", "3", "4", "5", "6"]),
                          fmt_refined,
                          "({n} row(s) aborted by a runtime fault)"),
        "",
        "## stokes_immersed_boundary 2D, IBStokesAL (grad-div, diag mass) — f32 + refinement to 1e-8",
        "",
        "f32 on-chip + host-f64 refinement (ops.host_ref.HostStokesSystem)",
        "to the reference's 1e-8 'Stokes solver control'",
        "(parameters_stokes.prm).",
        "",
        fmt_with_failures(get("stokes", ["4:5", "5:6", "6:7", "7:8",
                                         "8:9", "9:10"]),
                          fmt_refined, "({n} row(s) failed)"),
        "",
        "## stokes_immersed_boundary 3D (<2,3> instantiation), IBStokesAL — f32 + refinement to 1e-8",
        "",
        "Sphere of radius 0.1 at the cube center, g = (-1,1,0), body force",
        "(1,0,0) (parameters_stokes_3d.prm; stokes_immersed_boundary.cc",
        ":1218-1219).",
        "",
        "Pairings keep the multiplier surface mesh coarser than the",
        "velocity grid (h_Gamma/h in the reference's ~1.3-2.3 band,",
        "parameters_stokes_3d.prm bg 6 + 1 local vs sphere ref 4); finer",
        "multiplier meshes collapse the DLM inf-sup constant (measured:",
        "132 its/solve at ratio 0.53 vs 10 at 1.7 — PARITY.md round 5).",
        "",
        fmt_with_failures(get("stokes3d", ["3:0", "4:1", "5:2"]),
                          fmt_refined, "({n} row(s) failed)"),
        "",
        "## nitsche_bcs (boundary-multiplier Dirichlet), manufactured solution — f32 + refinement to 1e-10",
        "",
        "f32 on-chip + host-f64 refinement (ops.host_ref.HostNitscheSystem);",
        "5-cycle study (parameters_nitsche.prm).  Last column: inner CG",
        "iterations per outer FGMRES iteration (the reference's per-outer",
        "accounting, nitsche_bcs.cc:652-667).",
        "",
        fmt_with_failures(get("nitsche", ["0", "1", "2", "3", "4"]),
                          fmt_nitsche, "({n} row(s) failed)"),
        "",
        "## elliptic_interface_elasticity 3D (reconstructed; modified AL) — f32 + refinement to 1e-10",
        "",
        fmt_with_failures(get("elasticity", ["0", "1", "2"]), fmt_refined,
                          "({n} row(s) failed)"),
        "",
    ]
    tail = f"Measured at git {head}"
    if reused:
        tail += (f" (rows measured at {', '.join(reused)} are reused — "
                 "git confirms no file producing them changed since)")
    parts.append(tail + "." if not stale else
                 tail + f", except rows marked † — STALE: their producing "
                 f"code changed after measurement: {', '.join(stale)}.")
    parts.append("")
    os.makedirs("tables", exist_ok=True)
    with open("tables/results_tpu.md", "w") as fh:
        fh.write("\n".join(parts))
    print("wrote tables/results_tpu.md")


if __name__ == "__main__":
    main()
