"""Streaming blocklist-similarity gate: planted contamination is
flagged on the right axis while clean traffic passes, and late inserts
are caught by the running stream."""

import json
import time

from basenine_spark.engine.db import BasenineDB
from basenine_spark.streaming.blocklist import blocklist_gate_stream


def _doc(doc_id, text, emb):
    return json.dumps({"doc_id": doc_id, "text": text, "embedding": emb})


def _blocklist(spark):
    rows = [
        # entry 0: lexical-only (benchmark passage)
        (0, "the quick brown fox jumps over the lazy dog", None),
        # entry 1: dense-only (banned embedding direction)
        (1, None, [1.0, 0.0, 0.0, 0.0]),
    ]
    return spark.createDataFrame(
        rows, "block_id long, text string, embedding array<float>"
    )


def _wait(spark, table, pred, deadline_s=90):
    deadline = time.time() + deadline_s
    rows = []
    while time.time() < deadline:
        rows = spark.sql(f"SELECT * FROM {table}").collect()
        if pred(rows):
            return rows
        time.sleep(0.5)
    return rows


def test_planted_hits_right_axis_clean_passes(spark, tmp_path):
    db = BasenineDB(spark, path=str(tmp_path / "blstore"))
    db.insert_json(
        [
            # near-verbatim benchmark text, orthogonal embedding
            _doc(100, "a the quick brown fox jumps over the lazy dog b",
                 [0.0, 1.0, 0.0, 0.0]),
            # clean text, near-parallel embedding
            _doc(101, "totally unrelated training prose here",
                 [0.99, 0.01, 0.0, 0.0]),
            # clean on both axes
            _doc(102, "independent words with no overlap at all",
                 [0.0, 0.0, 1.0, 0.0]),
        ]
    )
    q = blocklist_gate_stream(
        db, _blocklist(spark), tau_cos=0.9, tau_jac=0.3,
        query_name="bl_hits1",
    )
    try:
        rows = _wait(spark, "bl_hits1", lambda r: len(r) >= 2)
        hits = {(r["doc_id"], r["block_id"]): r for r in rows}
        assert (100, 0) in hits and hits[(100, 0)]["hit_lexical"]
        assert not hits[(100, 0)]["hit_dense"]
        assert (101, 1) in hits and hits[(101, 1)]["hit_dense"]
        assert not hits[(101, 1)]["hit_lexical"]
        assert all(r["doc_id"] != 102 for r in rows)
    finally:
        q.stop()


def test_late_insert_caught_by_running_stream(spark, tmp_path):
    db = BasenineDB(spark, path=str(tmp_path / "blstore2"))
    db.insert_json([_doc(1, "benign warmup document", [0.0, 0.0, 0.0, 1.0])])
    q = blocklist_gate_stream(
        db, _blocklist(spark), tau_cos=0.9, tau_jac=0.3,
        query_name="bl_hits2",
    )
    try:
        # let the stream start on clean data, then inject contamination
        time.sleep(1.0)
        db.insert_json(
            [_doc(2, "x the quick brown fox jumps over the lazy dog",
                  [0.0, 0.0, 0.0, 1.0])]
        )
        rows = _wait(spark, "bl_hits2", lambda r: len(r) >= 1)
        assert any(r["doc_id"] == 2 and r["hit_lexical"] for r in rows)
    finally:
        q.stop()


def test_null_text_and_missing_embedding_are_safe(spark, tmp_path):
    """Docs without one of the two signals only gate on the other —
    no crash, no spurious hit."""
    db = BasenineDB(spark, path=str(tmp_path / "blstore3"))
    db.insert_json(
        [
            json.dumps({"doc_id": 5, "embedding": [1.0, 0.0, 0.0, 0.0]}),
            json.dumps({"doc_id": 6, "text": "short"}),
        ]
    )
    q = blocklist_gate_stream(
        db, _blocklist(spark), tau_cos=0.9, tau_jac=0.3,
        query_name="bl_hits3",
    )
    try:
        rows = _wait(spark, "bl_hits3", lambda r: len(r) >= 1)
        hits = {(r["doc_id"], r["block_id"]) for r in rows}
        assert (5, 1) in hits  # dense hit despite NULL text
        assert all(d != 6 for d, _ in hits)  # sub-gram text, no signal
    finally:
        q.stop()
