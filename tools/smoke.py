"""Plan-construction smoke gate — the 2-minute check that MUST run
before any commit touching ops/ or registry.py.

Round-9 post-mortem (VERDICT r9 items 1-2): a final "cosmetic" commit
swept ``F.round`` -> ``stable_round`` across four ops files without
re-running anything, and shipped (a) a missing import in
``ops/relational.py`` — 17 registry entries raising ``NameError`` at
runtime, the driver bench dead at rc=1 — and (b) a dropped paren
inside a SQL string (``PARSE_SYNTAX_ERROR``).  Both failure classes
are visible at PLAN CONSTRUCTION time: calling every ``queries()``
entry to build its DataFrame (no collect, no execution) raises on any
NameError / ImportError / AnalysisException / ParseException in the
query-building path, in about two minutes at local[8].

This is NOT a correctness gate (tools/driver_sim.py is) and NOT a
perf gate (bench.py is).  It is the cheapest possible "does every
entry still construct a plan" check, meant to run unconditionally in
the round-closing recipe and after any mechanical sweep.

Usage: python tools/smoke.py [name ...]     # default: all entries
Exit 0 = every entry constructed a plan; 1 = at least one raised.
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("DRIVER_SIM_SF_DIR", "/root/testdata/sf0.01")


def main() -> int:
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("smoke-plan-construct")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    only = set(sys.argv[1:])
    failed: list[str] = []
    t0 = time.time()
    n = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        n += 1
        try:
            df = fn(spark, SF_DIR)
            # touch the analyzed schema so analysis-time errors
            # (unresolved columns, SQL parse errors inside expr())
            # surface even when fn defers them
            _ = df.schema
        except Exception:
            failed.append(name)
            print(f"FAIL {name}")
            traceback.print_exc(limit=3)
    dt = time.time() - t0
    print(
        f"smoke: {n - len(failed)}/{n} entries constructed a plan "
        f"in {dt:.1f}s"
    )
    if failed:
        print("FAILED: " + ", ".join(failed))
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
