"""RFM segmentation and the seasonality grid: bucket/grid invariants.

Exact values are pinned by the driver oracles (`events_rfm_segments`,
`events_seasonality`)."""

import pytest
from pyspark.sql import functions as F

from basenine_spark.ops import timeseries

SF = "/root/testdata/sf0.01"


def test_rfm_bucket_invariants(spark):
    rows = timeseries.rfm_segments(spark, SF).collect()
    assert len(rows) > 0
    for r in rows:
        assert 1 <= r["r_score"] <= 5
        assert 1 <= r["f_score"] <= 5
        assert 1 <= r["m_score"] <= 5
        assert r["rfm"] == f"{r['r_score']}-{r['f_score']}-{r['m_score']}"
    # ntile balance: bucket sizes differ by at most 1 per dimension
    n = len(rows)
    for dim in ("r_score", "f_score", "m_score"):
        counts = {}
        for r in rows:
            counts[r[dim]] = counts.get(r[dim], 0) + 1
        assert max(counts.values()) - min(counts.values()) <= 1
        assert sum(counts.values()) == n


def test_rfm_score_orders_follow_metrics(spark):
    rows = timeseries.rfm_segments(spark, SF).collect()
    by_r = sorted(rows, key=lambda r: (r["recency_ms"], r["user_id"]))
    assert [r["r_score"] for r in by_r] == sorted(r["r_score"] for r in rows)
    by_f = sorted(rows, key=lambda r: (r["frequency"], r["user_id"]))
    assert [r["f_score"] for r in by_f] == sorted(r["f_score"] for r in rows)


def test_seasonality_grid_invariants(spark):
    rows = timeseries.seasonality_profile(spark, SF).collect()
    cells = {(r["dow"], r["hod"]) for r in rows}
    assert len(rows) == len(cells) <= 168
    assert all(0 <= d <= 6 and 0 <= h <= 23 for d, h in cells)
    total_share = sum(r["share"] for r in rows)
    assert abs(total_share - 1.0) < 1e-3  # floor rounding loses <1e-6/cell
    assert all(r["chi2_term"] >= 0 for r in rows)
    # count conservation vs the raw table
    n_total = sum(r["n_events"] for r in rows)
    from basenine_spark.sources.tables import load_table

    raw = (
        load_table(spark, SF, "events")
        .filter(F.col("ts_ms").isNotNull())
        .count()
    )
    assert n_total == raw


def test_seasonality_dow_epoch_anchor(spark, tmp_path):
    """1970-01-01 (epoch day 0) was a Thursday: with 0 = Sunday the
    integer dow must be 4."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import datetime

    out = str(tmp_path / "season_sf")
    import os

    os.makedirs(out, exist_ok=True)
    tbl = pa.table(
        {
            "event_id": pa.array([1], pa.int64()),
            "ts": pa.array(
                [datetime.datetime(1970, 1, 1, 5, 0, 0)],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([7], pa.int64()),
            "event_type": pa.array(["click"]),
            "value": pa.array([1.0], pa.float64()),
            "props": pa.array(["{}"]),
        }
    )
    pq.write_table(tbl, f"{out}/events.parquet")
    rows = timeseries.seasonality_profile(spark, out).collect()
    assert len(rows) == 1
    assert rows[0]["dow"] == 4 and rows[0]["hod"] == 5


def test_plan_shapes(spark):
    for df in (
        timeseries.rfm_segments(spark, SF),
        timeseries.seasonality_profile(spark, SF),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        assert "CartesianProduct" not in plan
