"""`load_table` timestamp normalization across physical layouts.

The driver's generator has emitted `events.ts` as both timestamp[ns]
(rounds 1-2) and timestamp[us] (round 3) — ADVICE r3's high finding was
the loader only handling ns.  These tests pin every layout the loader
claims to support: ns/us/ms/s logical timestamps, a bare-INT64 epoch
column (unit inferred from footer stats), and a pre-normalized replica
(ts_ms already present — bench's scale-slope copies).
"""

import json

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from basenine_spark.sources.tables import load_table

ROWS = [(1, 1_000), (2, 250), (3, 86_400_000)]  # (event_id, epoch ms)


def _write(tmp_path, ts_array):
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in ROWS], pa.int64()),
            "ts": ts_array,
            "user_id": pa.array([7] * len(ROWS), pa.int64()),
            "event_type": pa.array(["click"] * len(ROWS), pa.string()),
            "value": pa.array([1.0] * len(ROWS), pa.float64()),
            "props": pa.array([json.dumps({"k": 1})] * len(ROWS), pa.string()),
        }
    )
    pq.write_table(table, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def _got_ms(spark, sf):
    df = load_table(spark, sf, "events")
    assert "ts" not in df.columns
    assert dict(df.dtypes)["ts_ms"] == "bigint"
    return {r["event_id"]: r["ts_ms"] for r in df.collect()}


@pytest.mark.parametrize("unit,scale", [("ns", 10**6), ("us", 10**3), ("ms", 1)])
def test_logical_timestamp_units(spark, tmp_path, unit, scale):
    ts = pa.array([ms * scale for _, ms in ROWS], pa.timestamp(unit))
    sf = _write(tmp_path, ts)
    assert _got_ms(spark, sf) == {eid: ms for eid, ms in ROWS}


def test_second_timestamps_multiply(spark, tmp_path):
    secs = [(1, 1), (2, 0), (3, 86_400)]
    ts = pa.array([s for _, s in secs], pa.timestamp("s"))
    sf = _write(tmp_path, ts)
    assert _got_ms(spark, sf) == {eid: s * 1000 for eid, s in secs}


@pytest.mark.parametrize(
    "scale", [10**6, 10**3]  # bare int64 epoch in us / ms (2024-epoch magnitudes)
)
def test_bare_int64_unit_inferred_from_stats(spark, tmp_path, scale):
    base = 1_700_000_000_000  # ~2023-11 in ms
    ts = pa.array([(base + ms) * scale for _, ms in ROWS], pa.int64())
    sf = _write(tmp_path, ts)
    assert _got_ms(spark, sf) == {eid: base + ms for eid, ms in ROWS}


def test_prenormalized_replica_passthrough(spark, tmp_path):
    table = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts_ms": pa.array([10, 20], pa.int64()),
            "event_type": pa.array(["a", "b"], pa.string()),
        }
    )
    pq.write_table(table, str(tmp_path / "events.parquet"))
    df = load_table(spark, str(tmp_path), "events")
    assert {r["ts_ms"] for r in df.collect()} == {10, 20}


def test_driver_testdata_loads(spark):
    """Whatever unit the current driver testdata uses, the loader must
    produce plausible 2024-epoch millis."""
    df = load_table(spark, "/root/testdata/sf0.001", "events")
    row = df.selectExpr("min(ts_ms) AS lo", "max(ts_ms) AS hi").head()
    assert 1_500_000_000_000 < row["lo"] <= row["hi"] < 2_500_000_000_000


def test_bare_int64_without_footer_stats(spark, tmp_path):
    """A stats-less writer must not break unit inference — the loader
    falls back to reading one value."""
    base = 1_700_000_000_000
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in ROWS], pa.int64()),
            "ts": pa.array([(base + ms) * 1000 for _, ms in ROWS], pa.int64()),
            "user_id": pa.array([7] * len(ROWS), pa.int64()),
            "event_type": pa.array(["click"] * len(ROWS), pa.string()),
            "value": pa.array([1.0] * len(ROWS), pa.float64()),
            "props": pa.array([json.dumps({"k": 1})] * len(ROWS), pa.string()),
        }
    )
    pq.write_table(
        table, str(tmp_path / "events.parquet"), write_statistics=False
    )
    assert _got_ms(spark, str(tmp_path)) == {eid: base + ms for eid, ms in ROWS}
