"""The round-13 exact-regime sketch rows (`agg_heavy_hitters_
exact_regime`, `agg_quantile_exact_regime`) rest on two engine
conventions that a Spark version bump could silently change:

* space-saving (`approx_top_k`) with capacity above the per-group
  cardinality reports EXACT counts for EVERY key;
* GK (`percentile_approx`) at accuracy INT_MAX returns the LOWER
  nearest-rank element — the element at sorted index ceil(q*n)-1 —
  which is exactly DuckDB `quantile_disc`'s convention (probed
  adversarially in-round: heavy ties, two-point, singleton, integral
  rank boundaries, negatives — all agree).

These tests pin both conventions against pure-Python references on
adversarial shapes, so the driver oracle's assumptions are CI-checked
rather than hoped.
"""

import math
import random

from pyspark.sql import functions as F

QS = (0.1, 0.25, 0.5, 0.75, 0.9, 0.99)


def _nearest_rank_lower(vals, q):
    s = sorted(vals)
    return s[max(0, math.ceil(q * len(s)) - 1)]


def _spark_quantiles(spark, vals):
    df = spark.createDataFrame([(v,) for v in vals], "value double")
    arr = ",".join(str(q) for q in QS)
    return df.agg(
        F.expr(f"percentile_approx(value, array({arr}), 2147483647)")
        .alias("p")
    ).collect()[0]["p"]


def test_percentile_approx_max_accuracy_is_lower_nearest_rank(spark):
    random.seed(42)
    cases = {
        "ties_heavy": [
            float(random.choice([1, 1, 1, 2, 3])) for _ in range(997)
        ],
        "two_values": [1.0] * 500 + [2.0] * 500,
        "single": [7.5],
        "two": [1.0, 2.0],
        # q*n lands exactly on integral ranks — the convention edge
        "exact_boundaries": [float(i) for i in range(100)],
        "neg_and_dupes": [
            float(random.choice([-5, -5, 0, 0, 0, 3])) for _ in range(640)
        ],
    }
    for name, vals in cases.items():
        got = _spark_quantiles(spark, vals)
        expect = [_nearest_rank_lower(vals, q) for q in QS]
        assert list(got) == expect, (name, list(got), expect)


def test_heavy_hitters_full_capacity_is_exact_groupby(spark):
    """Zipf-skewed synthetic keys: the sketch at capacity above the
    cardinality must return the exact (group, key) multiset."""
    random.seed(7)
    rows = [
        (f"g{r % 3}", int(random.paretovariate(1.2)) % 40)
        for r in range(5000)
    ]
    df = spark.createDataFrame(rows, "grp string, key long")
    sk = (
        df.groupBy("grp")
        .agg(F.expr("approx_top_k(key, 4096)").alias("top"))
        .select("grp", F.explode("top").alias("e"))
        .select("grp", F.col("e.item").alias("key"),
                F.col("e.count").cast("bigint").alias("cnt"))
    )
    got = {(r["grp"], r["key"]): r["cnt"] for r in sk.collect()}
    exact = {
        (r["grp"], r["key"]): r["cnt"]
        for r in df.groupBy("grp", "key")
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .collect()
    }
    assert got == exact and got


def test_heavy_hitters_exactness_boundary_at_capacity(spark):
    """ADVICE r13: pin WHERE exactness actually ends. The concern was
    that space-saving's purge might start below nominal capacity
    (hash-map load factor), tightening the documented
    cardinality < maxItemsTracked boundary. Empirically it does not:
    at cardinality == capacity == 4096 — zero headroom — the sketch
    still returns the exact multiset through a multi-partition
    partial-agg merge. Above capacity the returned SET truncates to
    exactly ``capacity`` items (counts of survivors may then carry
    space-saving overestimates in general; membership is what this
    case pins). Distinct deterministic counts (1 + key % 7) make any
    count drift or purge visible per key."""
    for d, expect_exact in ((4095, True), (4096, True), (4500, False)):
        rows = [(key,) for key in range(d) for _ in range(1 + key % 7)]
        df = spark.createDataFrame(rows, "key long").repartition(8)
        sk = df.agg(
            F.expr("approx_top_k(key, 4096, 4096)").alias("top")
        ).collect()[0]["top"]
        got = {r["item"]: r["count"] for r in sk}
        if expect_exact:
            assert got == {key: 1 + key % 7 for key in range(d)}, d
        else:
            assert len(got) == 4096, (d, len(got))


def test_entry_capacity_exceeds_corpus_cardinality(spark):
    """The registered entry's min(k, maxItemsTracked)=4096 must stay
    above the per-type distinct-user cardinality at every test SF
    (1,500 at sf0.1) — k bounds the returned SET, maxItemsTracked
    bounds count exactness; the entry passes both explicitly and the
    smaller is 4096. Asserted at the largest corpus."""
    from basenine_spark.sources.tables import load_table

    ev = load_table(spark, "/root/testdata/sf0.1", "events").filter(
        F.col("user_id").isNotNull() & F.col("event_type").isNotNull()
    )
    mx = (
        ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .agg(F.max("n"))
        .collect()[0][0]
    )
    assert mx < 4096, mx
