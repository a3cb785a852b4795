"""Expectations gate: DuckDB differential on the events bundle,
NULL-is-violation semantics, uniqueness counting."""

import json

import pytest
from pyspark.sql import functions as F

from basenine_spark.ops import expectations

SF = "/root/testdata/sf0.001"


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(json.dumps([repr(row[i]) for i in order]) for row in rows)


def test_events_bundle_matches_duckdb(spark):
    import duckdb

    sdf = expectations.events_expectations(spark, SF)
    srows = [tuple(r) for r in sdf.collect()]
    con = duckdb.connect()
    cur = con.execute(
        f"""
        WITH ev AS (SELECT * FROM '{SF}/events.parquet'),
        agg AS (
          SELECT count(*) AS n,
            sum(CASE WHEN event_id IS NOT NULL THEN 0 ELSE 1 END) AS r1,
            sum(CASE WHEN epoch_ms(ts) > 0 THEN 0 ELSE 1 END) AS r2,
            sum(CASE WHEN event_type IN
                  ('view','click','purchase','signup','error')
                THEN 0 ELSE 1 END) AS r3,
            sum(CASE WHEN value >= 0 THEN 0 ELSE 1 END) AS r4,
            sum(CASE WHEN regexp_matches(props, '^\\{{.*\\}}$')
                THEN 0 ELSE 1 END) AS r5,
            count(event_id) - count(DISTINCT event_id) AS r6
          FROM ev
        )
        SELECT t.rule, agg.n::BIGINT AS n_rows, t.v::BIGINT AS n_violations,
               t.v = 0 AS passed
        FROM agg, LATERAL (VALUES
          ('event_id_not_null', r1), ('ts_positive', r2),
          ('event_type_known', r3), ('value_non_negative', r4),
          ('props_json_shaped', r5), ('unique_event_id', r6)
        ) AS t(rule, v)
        """
    )
    dcols = [d[0] for d in cur.description]
    drows = cur.fetchall()
    con.close()
    assert sorted(sdf.columns) == sorted(dcols)
    assert len(srows) == len(drows) == 6
    assert _canon(srows, sdf.columns) == _canon(drows, dcols)


def test_null_counts_as_violation_and_uniqueness(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, None), (2, -1.0), (None, 3.0)],
        "id long, v double",
    )
    rep = {
        r["rule"]: r
        for r in expectations.expectation_report(
            df,
            {"v_non_negative": F.col("v") >= 0, "id_not_null": F.col("id").isNotNull()},
            unique_keys=["id"],
        ).collect()
    }
    # v >= 0 is NULL for the None row -> violation; -1 -> violation
    assert rep["v_non_negative"]["n_violations"] == 2
    assert rep["id_not_null"]["n_violations"] == 1
    # id=2 appears twice -> one duplicate (NULLs don't count toward
    # uniqueness: count(id) ignores them)
    assert rep["unique_id"]["n_violations"] == 1
    assert not rep["unique_id"]["passed"]
    assert all(r["n_rows"] == 4 for r in rep.values())


def test_empty_rules_rejected(spark):
    df = spark.range(3)
    with pytest.raises(ValueError):
        expectations.expectation_report(df, {})
