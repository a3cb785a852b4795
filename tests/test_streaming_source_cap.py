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
