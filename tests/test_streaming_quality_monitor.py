"""Streaming quality monitor: windowed violation counts track injected
bad data, updates accumulate across micro-batches, NULL counts as a
violation."""

import json
import time

from pyspark.sql import functions as F

from basenine_spark.engine.db import BasenineDB
from basenine_spark.streaming.quality_monitor import quality_monitor_stream

HOUR_MS = 3_600_000


def _wait(spark, table, pred, deadline_s=90):
    deadline = time.time() + deadline_s
    rows = []
    while time.time() < deadline:
        rows = spark.sql(f"SELECT * FROM {table}").collect()
        if pred(rows):
            return rows
        time.sleep(0.5)
    return rows


def _ev(ts, val, et="view"):
    return json.dumps({"ts_ms": ts, "value": val, "event_type": et})


def test_windowed_violations(spark, tmp_path):
    db = BasenineDB(spark, path=str(tmp_path / "qmonstore"))
    # hour-0 window: 3 good + 1 negative; hour-1: 2 good + 1 null value
    db.insert_json(
        [
            _ev(100, 1.0), _ev(200, 2.0), _ev(300, 3.0), _ev(400, -5.0),
            _ev(HOUR_MS + 100, 1.0), _ev(HOUR_MS + 200, 2.0),
            _ev(HOUR_MS + 300, None),
        ]
    )
    rules = {
        "value_non_negative": F.col("value") >= 0,
        "known_type": F.col("event_type").isin("view", "click"),
    }
    sq = quality_monitor_stream(db, rules, query_name="qmon_t1")
    try:
        rows = _wait(
            spark,
            "qmon_t1",
            lambda rs: {r["window_start_ms"] for r in rs} == {0, HOUR_MS},
        )
        by_win = {r["window_start_ms"]: r for r in rows}
        assert by_win[0]["n_rows"] == 4
        assert by_win[0]["value_non_negative"] == 1
        assert by_win[0]["known_type"] == 0
        assert by_win[HOUR_MS]["n_rows"] == 3
        # NULL value -> predicate NULL -> violation (conservative)
        assert by_win[HOUR_MS]["value_non_negative"] == 1

        # second batch: more bad rows in hour 0 — update mode refreshes
        db.insert_json([_ev(500, -1.0, "weird"), _ev(600, 1.0)])
        rows = _wait(
            spark,
            "qmon_t1",
            lambda rs: any(
                r["window_start_ms"] == 0 and r["n_rows"] == 6 for r in rs
            ),
        )
        latest = max(
            (r for r in rows if r["window_start_ms"] == 0),
            key=lambda r: r["n_rows"],
        )
        assert latest["value_non_negative"] == 2
        assert latest["known_type"] == 1
    finally:
        sq.stop()
