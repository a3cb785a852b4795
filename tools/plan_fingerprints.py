"""Generate docs/plan_fingerprints.json: structural fingerprints of the
headline queries' physical plans at sf0.001.

A fingerprint counts the *scale-relevant* node types in the initial
physical plan — shuffles, join strategies, Python stages, top-k
operators, cartesian anythings.  `tests/test_plan_fingerprints.py`
compares the live plans against the committed file, so an accidental
plan regression (a broadcast join silently becoming a shuffle join, a
filter stage gaining a Python eval, a TakeOrdered collapsing into a
global sort) fails CI even for operators without a bespoke plan
assertion.

Intentional plan changes: re-run `python tools/plan_fingerprints.py`
and commit the diff — the diff IS the review artifact.
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "docs",
    "plan_fingerprints.json",
)

# node classes whose counts define the fingerprint (substring match on
# plan-tree node names)
NODE_CLASSES = [
    "Exchange",
    "BroadcastExchange",
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
    "HashAggregate",
    "ObjectHashAggregate",
    "SortAggregate",
    "TakeOrderedAndProject",
    "ArrowEvalPython",
    "MapInPandas",
    "FlatMapGroupsInPandas",
    "BatchEvalPython",
    "Window",
    "Generate",
]


def fingerprint(plan: str) -> dict[str, int]:
    counts: dict[str, int] = {}
    for line in plan.splitlines():
        # node names appear after the tree-drawing prefix; strip it
        m = re.search(r"[+*:\-\s]*([A-Za-z]+)", line)
        if not m:
            continue
        for cls in NODE_CLASSES:
            if re.search(rf"\b{cls}", line):
                counts[cls] = counts.get(cls, 0) + 1
    return dict(sorted(counts.items()))


def compute(spark, names=None) -> dict[str, dict[str, int]]:
    from bench import HEADLINE
    from basenine_spark.registry import SPARK_QUERIES

    out = {}
    for name in names or HEADLINE:
        df = SPARK_QUERIES[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        out[name] = fingerprint(plan)
    return out


def main() -> int:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("plan-fingerprints")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    fps = compute(spark)
    with open(OUT, "w") as f:
        json.dump(fps, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {OUT} ({len(fps)} fingerprints)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
