"""Streaming funnel: step transitions across micro-batches, greedy
strictly-after semantics, no history rewrites, batch-twin agreement
under UNORDERED multi-file arrival (r9 order-tolerant state buffer +
quiescence flush)."""

import json
import time

from basenine_spark.engine.db import BasenineDB
from basenine_spark.streaming.funnel import funnel_stream


def _wait_rows(spark, table, want, deadline_s=240):
    # generous deadline: under a fully loaded box (full-suite runs on
    # local[4] next to 31 busy cores) micro-batches can take minutes;
    # a short deadline makes THIS test flake while testing nothing
    deadline = time.time() + deadline_s
    rows = []
    while time.time() < deadline:
        rows = spark.sql(f"SELECT * FROM {table}").collect()
        if len(rows) >= want:
            break
        time.sleep(0.5)
    return rows


def _ev(uid, ts, et):
    return json.dumps({"user_id": uid, "ts_ms": ts, "event_type": et})


def test_funnel_stream_end_to_end(spark, tmp_path):
    db = BasenineDB(spark, path=str(tmp_path / "funnelstore"))
    # batch 1: user 1 views then clicks; user 2 clicks (no view yet —
    # must NOT count); user 3 views
    db.insert_json(
        [
            _ev(1, 10, "view"), _ev(1, 20, "click"),
            _ev(2, 15, "click"),
            _ev(3, 12, "view"),
        ]
    )
    sq = funnel_stream(db, query_name="funnel_t1")
    try:
        rows = _wait_rows(spark, "funnel_t1", 3)
        got = {(r["user_id"], r["step_idx"], r["ts_ms"]) for r in rows}
        assert got == {(1, 0, 10), (1, 1, 20), (3, 0, 12)}

        # batch 2: user 1 purchases (completes); user 2 finally views —
        # but the earlier click is history, the NEXT click counts;
        # user 3 clicks
        db.insert_json(
            [
                _ev(1, 30, "purchase"),
                _ev(2, 25, "view"), _ev(2, 35, "click"),
                _ev(3, 22, "click"),
            ]
        )
        rows = _wait_rows(spark, "funnel_t1", 7)
        got = {(r["user_id"], r["step_idx"], r["ts_ms"]) for r in rows}
        assert (1, 2, 30) in got
        assert (2, 0, 25) in got and (2, 1, 35) in got
        assert (3, 1, 22) in got
        assert len(got) == 7

        # batch 3: a late event with an EARLIER ts than user 1's
        # purchase cannot rewrite the filled funnel
        db.insert_json([_ev(1, 5, "view")])
        time.sleep(3)
        rows = spark.sql("SELECT * FROM funnel_t1").collect()
        assert len(rows) == 7
    finally:
        sq.stop()


def test_out_of_order_arrival_within_tolerance_folds_in_event_time(
    spark, tmp_path
):
    """The r9 capability in isolation: the later funnel step ARRIVES
    first (separate insert, separate trigger); the fold must still be
    view@10 -> click@20, which the r8 immediate-greedy fold got wrong
    (click arrived while step 0 was unfilled -> dropped forever)."""
    db = BasenineDB(spark, path=str(tmp_path / "funnelstore3"))
    db.insert_json([_ev(7, 20, "click")])
    # wide quiescence window: the view must be on disk before the
    # flush can possibly fire, so the test has no timing race
    sq = funnel_stream(db, query_name="funnel_t3", flush_after_ms=10_000)
    try:
        time.sleep(2)  # let the click land (and sit buffered) first
        db.insert_json([_ev(7, 10, "view")])
        rows = _wait_rows(spark, "funnel_t3", 2)
        got = {(r["user_id"], r["step_idx"], r["ts_ms"]) for r in rows}
        assert got == {(7, 0, 10), (7, 1, 20)}
    finally:
        sq.stop()


def test_agrees_with_batch_twin_on_ordered_arrivals(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from basenine_spark.ops import timeseries

    events = [
        (1, 10, "view"), (1, 20, "click"), (1, 30, "purchase"),
        (2, 5, "click"), (2, 15, "view"), (2, 25, "click"),
        (3, 10, "view"), (3, 12, "purchase"), (3, 20, "click"),
    ]
    # streaming: two batches split at ts 18, in event-time order
    db = BasenineDB(spark, path=str(tmp_path / "funnelstore2"))
    db.insert_json(
        [_ev(u, t, e) for u, t, e in sorted(events, key=lambda x: x[1]) if t <= 18]
    )
    sq = funnel_stream(db, query_name="funnel_t2")
    try:
        # first wave can only ever produce 3 transitions
        # ((1,0,10),(2,0,15),(3,0,10)) — waiting for more spins the
        # full deadline for nothing
        _wait_rows(spark, "funnel_t2", 3)
        # deliver the remaining events as ONE multi-file insert in
        # deliberately ts-DESCENDING order: part-files can straddle
        # trigger boundaries in arbitrary order (the r8 flake), and
        # the r9 order-tolerant fold (state-buffered, folded in
        # event-time order at the reorder horizon / quiescence flush)
        # must agree with the batch twin anyway
        db.insert_json(
            [
                _ev(u, t, e)
                for u, t, e in sorted(
                    events, key=lambda x: -x[1]
                )
                if t > 18
            ]
        )
        rows = _wait_rows(spark, "funnel_t2", 7)
    finally:
        sq.stop()
    online = {}
    for r in rows:
        online.setdefault(r["user_id"], {})[r["step_idx"]] = r["ts_ms"]

    # batch twin over the same events written as a parquet table
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(len(events)), pa.int64()),
                "ts": pa.array(
                    [t * 1000 for _, t, _ in events], pa.timestamp("ms")
                ),
                "user_id": pa.array([u for u, _, _ in events], pa.int64()),
                "event_type": pa.array([e for _, _, e in events]),
                "value": pa.array([0.0] * len(events)),
                "props": pa.array(["{}"] * len(events)),
            }
        ),
        d / "events.parquet",
    )
    batch = {
        r["user_id"]: [r["s1_ms"], r["s2_ms"], r["s3_ms"]]
        for r in timeseries.event_funnel(spark, str(d)).collect()
    }
    for uid, steps in batch.items():
        for i, t in enumerate(steps):
            # batch ts are epoch-millis of ts*1000; stream carried raw ms
            expect = None if t is None else t // 1000
            assert online.get(uid, {}).get(i) == expect
