"""Streaming exact dedup: first copy of each content key survives,
later copies within the watermark horizon are dropped."""

import json
import time

from basenine_spark.engine.db import BasenineDB
from basenine_spark.streaming.dedup import dedup_stream


def _wait_rows(spark, table, want, deadline_s=60):
    deadline = time.time() + deadline_s
    rows = []
    while time.time() < deadline:
        rows = spark.sql(f"SELECT * FROM {table}").collect()
        if len(rows) >= want:
            break
        time.sleep(0.5)
    return rows


def test_dedup_stream_drops_repeats(spark, tmp_path):
    db = BasenineDB(spark, path=str(tmp_path / "docstore"))
    batch = [
        json.dumps({"text": "alpha", "n": 1}),
        json.dumps({"text": "beta", "n": 2}),
        json.dumps({"text": "alpha", "n": 3}),  # dup of record 1 by text
    ]
    db.insert_json(batch)
    sq = dedup_stream(db, json_key="$.text", query_name="dedup_t1")
    try:
        rows = _wait_rows(spark, "dedup_t1", want=2)
        assert len(rows) == 2
        texts = sorted(json.loads(r["value"])["text"] for r in rows)
        assert texts == ["alpha", "beta"]

        # a second micro-batch: one more dup and one new doc
        db.insert_json(
            [
                json.dumps({"text": "beta", "n": 4}),
                json.dumps({"text": "gamma", "n": 5}),
            ]
        )
        rows = _wait_rows(spark, "dedup_t1", want=3)
        texts = sorted(json.loads(r["value"])["text"] for r in rows)
        assert texts == ["alpha", "beta", "gamma"]
    finally:
        sq.stop()


def test_dedup_stream_whole_payload(spark, tmp_path):
    db = BasenineDB(spark, path=str(tmp_path / "docstore2"))
    db.insert_json(
        [
            json.dumps({"a": 1}),
            json.dumps({"a": 1}),
            json.dumps({"a": 2}),
        ]
    )
    sq = dedup_stream(db, query_name="dedup_t2")
    try:
        rows = _wait_rows(spark, "dedup_t2", want=2)
        assert len(rows) == 2
        # one survivor per distinct payload (the stored value embeds the
        # assigned id, which the content hash normalizes away)
        assert sorted(json.loads(r["value"])["a"] for r in rows) == [1, 2]
    finally:
        sq.stop()


def test_curation_stream_quality_gate_before_dedup(spark, tmp_path):
    """The streaming curation funnel: a BFL quality gate drops junk
    records stateless-ly BEFORE the dedup state, then first-copy-wins
    dedup — the streaming twin of pipeline.curate_documents' first two
    stages."""
    db = BasenineDB(spark, path=str(tmp_path / "curstore"))
    batch = [
        json.dumps({"text": "good alpha", "n": 50}),
        json.dumps({"text": "junk", "n": 1}),  # fails quality (n < 10)
        json.dumps({"text": "good alpha", "n": 60}),  # dup of rec 1 by text
        json.dumps({"text": "good beta", "n": 70}),
    ]
    db.insert_json(batch)
    sq = dedup_stream(
        db,
        json_key="$.text",
        query_name="cur_t1",
        quality_filter="n > 10",
    )
    try:
        rows = _wait_rows(spark, "cur_t1", want=2)
        texts = sorted(json.loads(r["value"])["text"] for r in rows)
        assert texts == ["good alpha", "good beta"]
        ns = {json.loads(r["value"])["text"]: json.loads(r["value"])["n"] for r in rows}
        # exactly one alpha survived; within a single micro-batch the
        # surviving copy is partition-order-arbitrary (cross-batch,
        # first-batch-wins is what the watermark state guarantees —
        # pinned by test_dedup_stream_drops_repeats); junk (n=1) never
        # entered the state
        assert ns["good alpha"] in (50, 60) and ns["good beta"] == 70
    finally:
        sq.stop()
