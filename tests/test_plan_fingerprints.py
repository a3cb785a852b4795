"""Plan-fingerprint regression gate: the structural node counts of
every headline query's physical plan must match the committed
`docs/plan_fingerprints.json` — a broadcast join silently degrading to
a shuffle join, a new Python stage on a JVM path, or a TakeOrdered
collapsing into a global sort fails here even for operators without a
bespoke plan assertion.

Intentional plan changes: `python tools/plan_fingerprints.py` and
commit the diff (the diff is the review artifact)."""

import json
import os

import pytest

from tools.plan_fingerprints import OUT, compute


@pytest.fixture(scope="module")
def committed():
    with open(OUT) as f:
        return json.load(f)


def test_headline_plans_match_committed_fingerprints(spark, committed):
    # earlier test modules may leave DataFrames cached (PPJoin's hsets
    # etc.); Spark's CacheManager substitutes InMemoryTableScan into
    # ANY later query with a matching logical subplan, which would make
    # the fingerprints order-dependent — clear first
    spark.catalog.clearCache()
    live = compute(spark)
    assert set(live) == set(committed), "headline list changed — regenerate"
    drift = {
        name: (committed[name], live[name])
        for name in live
        if live[name] != committed[name]
    }
    assert not drift, (
        "plan structure drifted (committed vs live); if intentional, "
        f"re-run tools/plan_fingerprints.py: {drift}"
    )
