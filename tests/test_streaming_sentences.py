"""Streaming sentence-level keep-first scrub (online C4 twin): first
arrival of each case-folded sentence survives; later copies inside the
watermark horizon drop; NULL/zero-sentence payloads are safe."""

import json
import time

from basenine_spark.engine.db import BasenineDB
from basenine_spark.streaming.sentences import sentence_scrub_stream


def _wait_rows(spark, table, want, deadline_s=60):
    deadline = time.time() + deadline_s
    rows = []
    while time.time() < deadline:
        rows = spark.sql(f"SELECT * FROM {table}").collect()
        if len(rows) >= want:
            break
        time.sleep(0.5)
    return rows


def test_keep_first_across_batches_and_nulls(spark, tmp_path):
    db = BasenineDB(spark, path=str(tmp_path / "sentstore"))
    # batch 1: establishes the seen-set (incl. a case+whitespace pair
    # whose survivor is intra-batch arbitrary — asserted count-only)
    db.insert_json(
        [
            json.dumps({"doc_id": 1, "text": "Common line. Unique one!"}),
            # case + whitespace variant of the common line -> one of the
            # two survives (intra-batch order is undefined)
            json.dumps({"doc_id": 2, "text": "common   LINE. Unique two."}),
            json.dumps({"doc_id": 3}),             # no text -> no rows
            json.dumps({"doc_id": 4, "text": "...!?"}),  # zero sentences
        ]
    )
    sq = sentence_scrub_stream(db, query_name="sent_t1")
    try:
        rows = _wait_rows(spark, "sent_t1", want=3)
        got = sorted((r["doc_id"], r["sent_idx"], r["sentence"]) for r in rows)
        assert len(got) == 3
        # the common line survives exactly once; which copy is
        # intra-batch arbitrary (documented divergence)
        commons = [g for g in got if g[2].lower() == "common line"]
        assert len(commons) == 1 and commons[0][0] in (1, 2)
        assert (1, 1, "Unique one") in got and (2, 1, "Unique two") in got

        # LATER micro-batch: cross-batch keep-first IS deterministic —
        # the repeat drops, the fresh sentence lands
        db.insert_json(
            [json.dumps({"doc_id": 5, "text": "Unique one! Fresh line."})]
        )
        rows = _wait_rows(spark, "sent_t1", want=4)
        sents = sorted(r["sentence"].lower() for r in rows)
        assert sents.count("unique one") == 1
        assert "fresh line" in sents
        # the surviving "unique one" is still batch-1's copy
        keep = [r for r in rows if r["sentence"].lower() == "unique one"]
        assert keep[0]["doc_id"] == 1
    finally:
        sq.stop()


def test_batch_stream_agreement_per_batch_ingest(spark, tmp_path):
    # each doc arrives in its OWN micro-batch in doc_id order -> the
    # stream's kept (doc_id, sent_idx, sentence) rows equal the batch
    # keep-first scrub's exactly (the documented agreement regime)
    from basenine_spark.ops import text as text_ops

    db = BasenineDB(spark, path=str(tmp_path / "sentstore2"))
    docs = [
        (1, "Aa bb. Cc dd! Aa bb."),
        (2, "Cc dd. New here?"),
        (3, "Totally novel."),
    ]
    db.insert_json([json.dumps({"doc_id": docs[0][0], "text": docs[0][1]})])
    sq = sentence_scrub_stream(db, query_name="sent_t2")
    try:
        _wait_rows(spark, "sent_t2", want=2)
        for d, t in docs[1:]:
            db.insert_json([json.dumps({"doc_id": d, "text": t})])
        rows = _wait_rows(spark, "sent_t2", want=4)
        stream_set = sorted(
            (r["doc_id"], r["sent_idx"], r["sentence"]) for r in rows
        )
        # batch twin over the same documents
        out = str(tmp_path / "sent_sf")
        spark.createDataFrame(
            [(d, t, "en", "s", len(t)) for d, t in docs],
            "doc_id long, text string, lang string, source string, n_chars int",
        ).write.mode("overwrite").parquet(f"{out}/documents.parquet")
        batch_set = sorted(
            (r["doc_id"], r["sent_idx"], r["sentence"])
            for r in text_ops.scrub_dup_sentences(spark, out).collect()
        )
        assert stream_set == batch_set
    finally:
        sq.stop()
