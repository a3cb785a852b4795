"""Streaming per-source cap: first-cap admission per source, state
persists across micro-batches, over-cap arrivals stay dropped."""

import json
import time

from basenine_spark.engine.db import BasenineDB
from basenine_spark.streaming.source_cap import source_cap_admit_stream


def _wait_rows(spark, table, want, deadline_s=90):
    deadline = time.time() + deadline_s
    rows = []
    while time.time() < deadline:
        rows = spark.sql(f"SELECT * FROM {table}").collect()
        if len(rows) >= want:
            break
        time.sleep(0.5)
    return rows


def _doc(did, src):
    return json.dumps({"doc_id": did, "source": src})


def test_source_cap_stream_end_to_end(spark, tmp_path):
    db = BasenineDB(spark, path=str(tmp_path / "capstore"))
    # batch 1: 5 docs from a, 2 from b; cap = 3
    db.insert_json(
        [_doc(i, "a") for i in range(5)] + [_doc(10 + i, "b") for i in range(2)]
    )
    sq = source_cap_admit_stream(db, cap=3, query_name="srccap_t1")
    try:
        rows = _wait_rows(spark, "srccap_t1", 5)
        got = {(r["doc_id"], r["source"], r["cap_rank"]) for r in rows}
        # source a: the 3 smallest doc_ids of the batch; b: both
        assert got == {
            (0, "a", 1),
            (1, "a", 2),
            (2, "a", 3),
            (10, "b", 1),
            (11, "b", 2),
        }

        # batch 2: a is full (drops), b admits 1 more then drops
        db.insert_json(
            [_doc(20, "a"), _doc(21, "b"), _doc(22, "b"), _doc(23, "c")]
        )
        rows = _wait_rows(spark, "srccap_t1", 7)
        got = {(r["doc_id"], r["source"], r["cap_rank"]) for r in rows}
        assert (20, "a", 4) not in got
        assert sum(1 for _, s, _ in got if s == "a") == 3
        assert (21, "b", 3) in got
        assert (22, "b", 4) not in got
        assert (23, "c", 1) in got
        assert len(got) == 7
    finally:
        sq.stop()


def test_ranks_contiguous_per_source(spark, tmp_path):
    db = BasenineDB(spark, path=str(tmp_path / "capstore2"))
    db.insert_json([_doc(i, f"s{i % 3}") for i in range(12)])
    sq = source_cap_admit_stream(db, cap=10, query_name="srccap_t2")
    try:
        rows = _wait_rows(spark, "srccap_t2", 12)
        by_src: dict = {}
        for r in rows:
            by_src.setdefault(r["source"], []).append(r["cap_rank"])
        for src, ranks in by_src.items():
            assert sorted(ranks) == list(range(1, len(ranks) + 1))
    finally:
        sq.stop()


def test_checkpoint_resume_preserves_cap_state(spark, tmp_path):
    """Crash/restart contract: with a fixed checkpoint the restarted
    stream restores per-source admitted counts and the log offset — a
    source that filled its cap before the stop stays closed, ranks
    continue, and already-processed batches are not re-emitted."""
    db = BasenineDB(spark, path=str(tmp_path / "capstore3"))
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "admitted")

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

    db.insert_json([_doc(i, "a") for i in range(3)] + [_doc(10, "b")])
    sq = source_cap_admit_stream(db, cap=3, checkpoint=ckpt, sink_path=sink)
    try:
        rows = _sink_rows(4)
        assert {(r["doc_id"], r["cap_rank"]) for r in rows} == {
            (0, 1), (1, 2), (2, 3), (10, 1),
        }
    finally:
        sq.stop()

    # while the stream is DOWN: a would overflow, b gets two more
    db.insert_json([_doc(20, "a"), _doc(21, "b"), _doc(22, "b")])
    sq2 = source_cap_admit_stream(db, cap=3, checkpoint=ckpt, sink_path=sink)
    try:
        rows = _sink_rows(6)
        got = {(r["doc_id"], r["source"], r["cap_rank"]) for r in rows}
        # a was already full BEFORE the restart -> doc 20 dropped;
        # b resumes at rank 2; first-run rows appear exactly once
        assert got == {
            (0, "a", 1), (1, "a", 2), (2, "a", 3), (10, "b", 1),
            (21, "b", 2), (22, "b", 3),
        }
    finally:
        sq2.stop()
