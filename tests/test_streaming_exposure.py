"""Streaming incident-exposure join (cross-user stream-stream interval
join via the grid-cell equi key) — e2e over the document log."""

import json
import time

from basenine_spark.engine.db import BasenineDB
from basenine_spark.streaming.exposure import incident_exposure_stream

MIN = 60_000


def _ev(et, user, ms):
    return json.dumps({"event_type": et, "user": user, "ts_ms": ms})


def _await(spark, table, want, timeout=90):
    deadline = time.time() + timeout
    got = set()
    while time.time() < deadline:
        rows = spark.sql(
            f"SELECT error_ms, act_user, act_ms FROM {table}"
        ).collect()
        got = {(r["error_ms"], r["act_user"], r["act_ms"]) for r in rows}
        if len(got) >= want:
            break
        time.sleep(0.5)
    return got


def test_exposure_pairs_cross_user_within_pad(spark, tmp_path):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    db = BasenineDB(spark, path=str(tmp_path / "docstore"))
    base = 1_700_000_000_000
    err_ms = base + 20 * MIN
    db.insert_json(
        [
            _ev("view", "u1", err_ms - 4 * MIN),   # inside ±5 min
            _ev("click", "u2", err_ms + 3 * MIN),  # inside, OTHER user
            _ev("view", "u3", err_ms - 30 * MIN),  # outside
            _ev("view", "u4", err_ms + 9 * MIN),   # outside
            # straddles a grid-cell boundary relative to the error:
            # cell width 10 min, error at :20 covers cells of [:15,:25]
            _ev("click", "u5", err_ms + 5 * MIN),  # exactly on the pad edge
            _ev("error", "sys", err_ms),
        ]
    )
    sq = incident_exposure_stream(
        db, pad_minutes=5, grid_minutes=10, query_name="exp_t1"
    )
    try:
        got = _await(spark, "exp_t1", want=3)
        assert got == {
            (err_ms, "u1", err_ms - 4 * MIN),
            (err_ms, "u2", err_ms + 3 * MIN),
            (err_ms, "u5", err_ms + 5 * MIN),  # BETWEEN is inclusive
        }, got
    finally:
        sq.stop()


def test_exposure_pairs_unique_no_cell_dup(spark, tmp_path):
    """An error window spans several grid cells; an activity row inside
    it must pair exactly ONCE (only the error side explodes)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    db = BasenineDB(spark, path=str(tmp_path / "docstore"))
    base = 1_700_000_000_000
    err_ms = base + 29 * MIN  # ±5 min window covers cells [:24..:34] → 2 cells
    db.insert_json(
        [
            _ev("view", "u1", err_ms - 5 * MIN),
            _ev("view", "u1", err_ms + 4 * MIN),
            _ev("error", "sys", err_ms),
        ]
    )
    sq = incident_exposure_stream(
        db, pad_minutes=5, grid_minutes=10, query_name="exp_t2"
    )
    try:
        deadline = time.time() + 90
        rows = []
        while time.time() < deadline:
            rows = spark.sql("SELECT act_ms FROM exp_t2").collect()
            if len(rows) >= 2:
                # give one extra poll to catch any duplicate emission
                time.sleep(2)
                rows = spark.sql("SELECT act_ms FROM exp_t2").collect()
                break
            time.sleep(0.5)
        assert sorted(r["act_ms"] for r in rows) == [
            err_ms - 5 * MIN,
            err_ms + 4 * MIN,
        ]
    finally:
        sq.stop()


def test_exposure_two_incidents_multiple_batches(spark, tmp_path):
    """A second incident arriving in a LATER micro-batch still pairs
    with activity that streamed in earlier (state held under the
    watermark)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    db = BasenineDB(spark, path=str(tmp_path / "docstore"))
    base = 1_700_000_000_000
    e1, e2 = base + 10 * MIN, base + 12 * MIN
    db.insert_json(
        [
            _ev("view", "u1", base + 8 * MIN),
            _ev("error", "sys", e1),
        ]
    )
    sq = incident_exposure_stream(
        db, pad_minutes=5, grid_minutes=10, query_name="exp_t3"
    )
    try:
        got = _await(spark, "exp_t3", want=1)
        assert (e1, "u1", base + 8 * MIN) in got
        # second batch: a new incident near the same activity
        db.insert_json([_ev("error", "sys", e2)])
        got = _await(spark, "exp_t3", want=2)
        assert (e2, "u1", base + 8 * MIN) in got
    finally:
        sq.stop()
