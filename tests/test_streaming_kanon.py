"""Streaming k-anonymity gate: rows are held until their level-1 QI
group reaches k, the whole buffer flushes at once, later group members
pass straight through, and under-k groups never emit."""

import json
import time

from basenine_spark.engine.db import BasenineDB
from basenine_spark.streaming.kanon import k_anonymity_stream


def _wait_rows(spark, table, want, deadline_s=90):
    deadline = time.time() + deadline_s
    rows = []
    while time.time() < deadline:
        rows = spark.sql(f"SELECT * FROM {table}").collect()
        if len(rows) >= want:
            break
        time.sleep(0.5)
    return rows


def _ev(eid, et, hour, value):
    return json.dumps(
        {"event_id": eid, "event_type": et, "ts_ms": hour * 3600000, "value": value}
    )


def test_kanon_stream_holds_then_flushes(spark, tmp_path):
    db = BasenineDB(spark, path=str(tmp_path / "kanonstore"))
    # batch 1: 2 clicks in group (click, h3, b0) — below k=3, held;
    # one rare event — held forever
    db.insert_json(
        [_ev(0, "click", 3, 5.0), _ev(1, "click", 3, 6.0), _ev(99, "rare", 3, 5.0)]
    )
    sq = k_anonymity_stream(db, k=3, query_name="kanon_t1")
    try:
        # nothing released yet: give the stream a moment to process
        rows = _wait_rows(spark, "kanon_t1", 1, deadline_s=8)
        assert rows == []

        # batch 2: the 3rd click arrives -> all 3 flush together
        db.insert_json([_ev(2, "click", 3, 7.0)])
        rows = _wait_rows(spark, "kanon_t1", 3)
        got = {(r["event_id"], r["qi_type"], r["qi_hour"], r["qi_band"]) for r in rows}
        assert got == {
            (0, "click", 3, 0),
            (1, "click", 3, 0),
            (2, "click", 3, 0),
        }
        assert all(r["released_at_n"] == 3 for r in rows)

        # batch 3: a later group member passes straight through; the
        # rare group stays suppressed
        db.insert_json([_ev(3, "click", 3, 8.0)])
        rows = _wait_rows(spark, "kanon_t1", 4)
        ids = {r["event_id"] for r in rows}
        assert ids == {0, 1, 2, 3}
        assert 99 not in ids
        (late,) = [r for r in rows if r["event_id"] == 3]
        assert late["released_at_n"] == 4
    finally:
        sq.stop()


def test_kanon_stream_null_qi_sentinel_group(spark, tmp_path):
    """NULL QI components gate as the sentinel group — a NULL-heavy
    burst is held to the same k standard, not leaked."""
    db = BasenineDB(spark, path=str(tmp_path / "kanonstore2"))
    db.insert_json(
        [json.dumps({"event_id": i, "event_type": None, "ts_ms": None, "value": None}) for i in range(3)]
    )
    sq = k_anonymity_stream(db, k=3, query_name="kanon_t2")
    try:
        rows = _wait_rows(spark, "kanon_t2", 3)
        got = {(r["event_id"], r["qi_type"], r["qi_hour"], r["qi_band"]) for r in rows}
        assert got == {(i, "(null)", -1, -1) for i in range(3)}
    finally:
        sq.stop()


def test_kanon_stream_resumes_buffered_state(spark, tmp_path):
    """Crash/restart contract: rows buffered BELOW k before the stop
    are restored from state and flush the moment the group completes
    after the restart — nothing lost, nothing double-released."""
    db = BasenineDB(spark, path=str(tmp_path / "kanonstore3"))
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "released")

    def _sink_rows(want, deadline_s=90):
        deadline = time.time() + deadline_s
        rows = []
        while time.time() < deadline:
            try:
                rows = spark.read.parquet(sink).collect()
            except Exception:  # noqa: BLE001 — sink dir not created yet
                rows = []
            if len(rows) >= want:
                break
            time.sleep(0.5)
        return rows

    # run 1: two group members arrive (below k=3), then a full other
    # group proves the stream processed the batch before we stop
    db.insert_json(
        [_ev(0, "click", 3, 5.0), _ev(1, "click", 3, 6.0)]
        + [_ev(50 + i, "view", 1, 5.0) for i in range(3)]
    )
    sq = k_anonymity_stream(db, k=3, checkpoint=ckpt, sink_path=sink)
    try:
        rows = _sink_rows(3)
        assert {r["event_id"] for r in rows} == {50, 51, 52}
    finally:
        sq.stop()

    # run 2 (same checkpoint): the third click completes the group —
    # the two PRE-RESTART buffered clicks flush with it
    db.insert_json([_ev(2, "click", 3, 7.0)])
    sq2 = k_anonymity_stream(db, k=3, checkpoint=ckpt, sink_path=sink)
    try:
        rows = _sink_rows(6)
        clicks = [r for r in rows if r["qi_type"] == "click"]
        assert {r["event_id"] for r in clicks} == {0, 1, 2}
        assert all(r["released_at_n"] == 3 for r in clicks)
        # the view group is NOT re-emitted
        assert sum(1 for r in rows if r["qi_type"] == "view") == 3
    finally:
        sq2.stop()
