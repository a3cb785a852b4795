"""Live tail / follow mode (T1/T2/T3, M1) over the durable log.

The streamed-records analog of the reference's QUERY-mode e2e tests
(server_test.go:123-206, client_test.go:89-147: stream existing data,
append mid-stream, assert new matching records arrive; limit(N) stops
the stream after N written records).
"""

import json

import pytest

from basenine_spark.engine.db import BasenineDB
from basenine_spark.streaming import tail


def _mkdb(spark, tmp_path):
    return BasenineDB(spark, path=str(tmp_path / "docstore"))


def _docs(lo, hi):
    return [
        json.dumps({"n": i, "tag": "hit" if i % 2 == 0 else "miss"})
        for i in range(lo, hi)
    ]


def test_tail_streams_existing_and_midstream_appends(spark, tmp_path):
    db = _mkdb(spark, tmp_path)
    db.insert_json(_docs(0, 100))
    t = tail(db, 'tag == "hit"')
    try:
        got = t.await_written(50, timeout=60)
        assert got == 50
        # append while the stream is live (fsnotify-resume analog,
        # native.go:520-522)
        db.insert_json(_docs(100, 200))
        got = t.await_written(100, timeout=60)
        assert got == 100
        ids = [rid for rid, _ in t.records]
        assert ids == sorted(ids)
        docs = [json.loads(v) for _, v in t.records]
        assert all(d["tag"] == "hit" for d in docs)
        assert {d["n"] for d in docs} == set(range(0, 200, 2))
    finally:
        t.stop()


def test_tail_limit_early_stop(spark, tmp_path):
    db = _mkdb(spark, tmp_path)
    db.insert_json(_docs(0, 100))
    t = tail(db, 'tag == "hit" and limit(10)')
    try:
        written = t.run_until_limit(timeout=60)
        assert written == 10
        docs = [json.loads(v) for _, v in t.records]
        assert [d["n"] for d in docs] == list(range(0, 20, 2))
    finally:
        t.stop()


def test_tail_left_off_resume(spark, tmp_path):
    db = _mkdb(spark, tmp_path)
    db.insert_json(_docs(0, 60))
    metas = []
    t = tail(db, "", left_off=49, on_metadata=metas.append)
    try:
        got = t.await_written(10, timeout=60)
        assert got == 10
        docs = [json.loads(v) for _, v in t.records]
        assert sorted(d["n"] for d in docs) == list(range(50, 60))
        assert metas and metas[-1].total == 60
    finally:
        t.stop()


def test_tail_per_record_metadata_golden(spark, tmp_path):
    """Per-record frame parity with native.go:497-511: after each
    delivered record the frame carries the cumulative delivered count,
    the candidates scanned since the previous delivered record
    (non-matching docs charged to the next frame, across batches), and
    the delivered record's resume token."""
    from basenine_spark.engine.db import index_to_id

    db = _mkdb(spark, tmp_path)
    db.insert_json(_docs(0, 60))  # hit at even n, miss at odd
    frames = []
    t = tail(db, 'tag == "hit"', on_metadata=frames.append)
    try:
        got = t.await_written(30, timeout=60)
        assert got == 30
        assert len(frames) == 30
        for i, md in enumerate(frames):
            assert md.number_of_written == i + 1  # cumulative
            assert md.left_off == index_to_id(2 * i)  # delivered id
            # first frame scanned one candidate (seq 0); later frames
            # charge the skipped odd record too
            assert md.current == (1 if i == 0 else 2)
            assert md.total == 60
            assert md.no_more_data is False
    finally:
        t.stop()


def test_tail_scanned_cadence_golden(spark, tmp_path):
    """Opt-in reference-exact cadence (VERDICT r8 #10, round 10): with
    ``frame_cadence="scanned"`` a frame follows EVERY scanned
    candidate, match or not — native.go:430-511: ``queried++`` per
    offset, the frame minted unconditionally after Eval, Current = 1
    on the contiguous path, NumberOfWritten cumulative, leftOff the
    scanned record's own token. Records still only for matches."""
    from basenine_spark.engine.db import index_to_id

    db = _mkdb(spark, tmp_path)
    db.insert_json(_docs(0, 40))  # hit at even n, miss at odd
    frames = []
    t = tail(
        db,
        'tag == "hit"',
        on_metadata=frames.append,
        frame_cadence="scanned",
    )
    try:
        got = t.await_written(20, timeout=60)
        assert got == 20
        # every scanned candidate framed — 40 frames for 20 deliveries
        deadline = __import__("time").time() + 30
        while len(frames) < 40 and __import__("time").time() < deadline:
            __import__("time").sleep(0.05)
        assert len(frames) == 40
        for seq, md in enumerate(frames):
            assert md.left_off == index_to_id(seq)
            assert md.current == 1  # contiguous scan, 1 per frame
            # cumulative deliveries: evens up to and including seq
            assert md.number_of_written == seq // 2 + 1
        docs = [json.loads(v) for _, v in t.records]
        assert [d["n"] for d in docs] == list(range(0, 40, 2))
    finally:
        t.stop()


def test_tail_scanned_cadence_rejects_bad_value(spark, tmp_path):
    db = _mkdb(spark, tmp_path)
    with pytest.raises(ValueError, match="frame_cadence"):
        tail(db, "", frame_cadence="per_batch")
