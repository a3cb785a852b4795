"""Time-series operators (as-of join, range frames, gap-fill) plus the
cube/pivot/interval-join additions: semantic edge cases on synthetic
events + the plan shapes that make them survive a 100 TB scale-up.

The driver's DuckDB oracle covers the sf0.01 end-to-end values
(`join_asof_clicks`, `window_range_count`, `ts_gap_fill_hourly`,
`agg_cube_orders`, `pivot_segment_status`, `join_length_bands`); these
tests pin the tie/missing edges the synthetic distribution may not hit.
"""

import json

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from basenine_spark.ops import relational, timeseries

SF = "/root/testdata/sf0.001"

MS = 1_000_000  # ns per ms


def _write_events(tmp_path, rows):
    """rows: (event_id, ms, user_id, event_type). Written with ns
    timestamps, matching the driver testdata's physical layout."""
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] * MS for r in rows], pa.timestamp("ns")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array([json.dumps({"k": 1})] * len(rows), pa.string()),
        }
    )
    pq.write_table(table, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_asof_tie_missing_and_ordering(spark, tmp_path):
    sf = _write_events(
        tmp_path,
        [
            # user 1: purchase before any click -> NULL attribution
            (1, 500, 1, "purchase"),
            # user 1: click at the exact purchase ms counts (at-or-before)
            (2, 1000, 1, "click"),
            (3, 1000, 1, "purchase"),
            # user 2: latest prior click wins, later click ignored
            (4, 100, 2, "click"),
            (5, 200, 2, "click"),
            (6, 250, 2, "purchase"),
            (7, 300, 2, "click"),
        ],
    )
    got = {
        r["event_id"]: (r["last_click_ms"], r["gap_ms"])
        for r in timeseries.asof_last_click(spark, sf).collect()
    }
    assert got == {1: (None, None), 3: (1000, 0), 6: (200, 50)}


def test_sliding_range_frame_boundaries(spark, tmp_path):
    h = 3_600_000
    sf = _write_events(
        tmp_path,
        [
            (1, 0 * h, 1, "view"),
            (2, 12 * h, 1, "view"),
            # exactly 24h after event 2: inside the inclusive frame
            (3, 36 * h, 1, "error"),
            # 24h + 1ms after event 1: outside
            (4, 24 * h + 1, 2, "error"),
            (5, 0, 2, "view"),
        ],
    )
    got = {
        r["event_id"]: r["recent_n"]
        for r in timeseries.sliding_error_rate(spark, sf).collect()
    }
    assert got == {3: 2, 4: 1}


def test_gap_fill_dense_calendar(spark, tmp_path):
    h = 3_600_000
    sf = _write_events(
        tmp_path,
        [
            (1, 0 * h, 1, "view"),
            (2, 0 * h, 1, "click"),
            (3, 2 * h, 1, "view"),
        ],
    )
    rows = timeseries.gap_fill_hourly(spark, sf).collect()
    # 3 hours x 2 types, zero-filled where absent
    assert len(rows) == 6
    got = {(r["hour"], r["event_type"]): r["cnt"] for r in rows}
    assert got[(1, "view")] == 0 and got[(1, "click")] == 0
    assert got[(0, "view")] == 1 and got[(2, "view")] == 1
    assert got[(2, "click")] == 0


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_asof_is_single_shuffle(spark):
    # union + running max: the whole as-of join costs ONE hash shuffle
    # on user_id (no per-row probe, no range-join explosion)
    plan = _plan(timeseries.asof_last_click(spark, SF))
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "CartesianProduct" not in plan


def test_range_frame_is_single_shuffle(spark):
    plan = _plan(timeseries.sliding_error_rate(spark, SF))
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_gap_fill_reads_cached_aggregate(spark):
    # bounds/keys/counts all read the cached aggregate, not the fact
    # table (the plan string reprints the InMemoryRelation definition —
    # including its parquet scan — under every InMemoryTableScan, so
    # count the cache reads, not the textual scan occurrences)
    plan = _plan(timeseries.gap_fill_hourly(spark, SF))
    assert plan.count("InMemoryTableScan") >= 3, plan


def test_cube_expands_once(spark):
    # CUBE = one Expand + one aggregation pass, not four scans
    plan = _plan(relational.order_status_cube(spark, SF))
    assert "Expand" in plan
    assert plan.count("Scan parquet") == 1, plan


def test_band_join_broadcasts_constant_side(spark):
    # non-equi interval join against a rows-of-constants band table:
    # BroadcastNestedLoopJoin over a <10-row build side is the correct
    # physical strategy (fact side never shuffles)
    plan = _plan(relational.doc_length_band_join(spark, SF))
    assert "BroadcastNestedLoopJoin" in plan
    assert "Exchange hashpartitioning" in plan  # only the final groupBy


def test_pivot_uses_declared_values(spark):
    # explicit pivot values -> no distinct-discovery job; the plan is a
    # broadcast dim join + the standard two-phase pivot: shuffle on
    # (segment, status) for the sums, then a second shuffle on segment
    # that carries only the already-aggregated segment x status rows
    plan = _plan(relational.segment_status_pivot(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "pivotfirst" in plan, plan
    assert plan.count("Exchange hashpartitioning") == 2, plan


def test_day_partitioned_layout_prunes(spark, tmp_path):
    """A one-day predicate over the re-laid-out events must read only
    that day's directory (partition pruning, not just row-group
    stats)."""
    dest = str(tmp_path / "events_by_day")
    timeseries.write_day_partitioned(spark, SF, dest)
    df = spark.read.parquet(dest)
    days = [r["event_day"] for r in df.select("event_day").distinct().collect()]
    assert len(days) > 1  # sf0.001 spans multiple days
    one_day = str(sorted(days)[0])  # partition col reads back as DATE
    pruned = df.filter(df["event_day"] == one_day)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # the day predicate must land in PartitionFilters (directory-level
    # prune), not in PushedFilters (per-file row-group stats)
    import re

    m = re.search(r"PartitionFilters: \[(.*?)\]", plan)
    assert m and one_day in m.group(1), plan
    # ...and the pruned read equals reading that directory alone
    direct = spark.read.parquet(f"{dest}/event_day={one_day}")
    assert pruned.count() == direct.count() > 0
    # and the layout is lossless
    from basenine_spark.sources.tables import load_table

    assert df.count() == load_table(spark, SF, "events").count()
