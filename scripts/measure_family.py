#!/usr/bin/env python
"""Measure a FAMILY of results-table rows in one process.

`make_results_table.py` isolates each row in its own subprocess (fault
containment for the round-2/3 era v5e runtime faults — since root-fixed,
PARITY.md round 4).  That costs a fresh interpreter + axon tunnel + jax
init per row, which dominates the small rows on the tunneled chip.  This
helper computes several rows of ONE family in a single process — same row
functions, same cache file, same git-stamp/staleness semantics — so a
single-chip re-measurement sweep fits a session budget.  A row that
raises is recorded as a failure (`row: None` + the exception) and the
sweep continues; a row that faults the runtime kills the process, and the
remaining rows simply stay stale/unmeasured in the cache.

Usage: python scripts/measure_family.py elliptic 1 2 3 [--force]
       (args as in make_results_table.ROWSPECS; --force re-measures rows
       that are already fresh at HEAD)
"""

from __future__ import annotations

import json
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import make_results_table as mrt  # noqa: E402


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    force = "--force" in sys.argv
    kind, row_args = args[0], args[1:]
    head = mrt._git_head()

    cache = {}
    if os.path.exists(mrt.CACHE):
        with open(mrt.CACHE) as fh:
            cache = json.load(fh)

    def save():
        with open(mrt.CACHE, "w") as fh:
            json.dump(cache, fh)

    for arg in row_args:
        key = f"{kind}:{arg}"
        ent = cache.get(key)
        if (not force and isinstance(ent, dict) and ent.get("row") is not None
                and not mrt.row_is_stale(kind, ent.get("git"), head)):
            print(f"{key} cached (fresh at {ent.get('git')})", flush=True)
            continue
        try:
            row = mrt.compute_row(kind, arg)
            cache[key] = {"row": list(row), "git": head}
            print(f"{key} -> {cache[key]['row']}", flush=True)
        except Exception:
            err = traceback.format_exc()
            cache[key] = {"row": None, "git": head, "err": err[-800:]}
            print(f"{key} FAILED\n{err[-400:]}", flush=True)
        save()


if __name__ == "__main__":
    main()
