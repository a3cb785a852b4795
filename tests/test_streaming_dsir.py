"""Streaming DSIR admission gate: target-like traffic is admitted with
positive weights, junk is rejected, late inserts are caught, and
NULL/empty text is dropped safely."""

import json
import time

from basenine_spark.engine.db import BasenineDB
from basenine_spark.streaming.dsir import dsir_admit_stream, train_dsir_model


def _doc(doc_id, text):
    return json.dumps({"doc_id": doc_id, "text": text})


def _model(spark):
    """Target slice speaks {alpha, beta}; the pool speaks {junk, noise}."""
    rows = [
        (0, "alpha beta alpha beta", True),
        (1, "beta alpha beta", True),
        (2, "junk noise junk noise junk", False),
        (3, "noise junk noise", False),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, is_t boolean")
    from pyspark.sql import functions as F

    return train_dsir_model(docs, F.col("is_t"), n_buckets=1 << 12)


def _wait(spark, table, pred, deadline_s=90):
    deadline = time.time() + deadline_s
    rows = []
    while time.time() < deadline:
        rows = spark.sql(f"SELECT * FROM {table}").collect()
        if pred(rows):
            return rows
        time.sleep(0.5)
    return rows


def test_admit_reject_late_and_null(spark, tmp_path):
    model = _model(spark)
    db = BasenineDB(spark, path=str(tmp_path / "dsirstore"))
    db.insert_json(
        [
            _doc(100, "alpha beta alpha"),      # target-like → admit
            _doc(101, "junk noise junk"),       # pool-like → reject
            _doc(102, ""),                       # empty → dropped, no crash
            json.dumps({"doc_id": 103}),         # NULL text → dropped
        ]
    )
    q = dsir_admit_stream(db, model, threshold=0.0, query_name="dsir_adm1")
    try:
        rows = _wait(spark, "dsir_adm1", lambda r: len(r) >= 1)
        by_id = {r["doc_id"]: r for r in rows}
        assert 100 in by_id and by_id[100]["dsir_weight"] > 0
        assert by_id[100]["n_tokens"] == 3
        assert 101 not in by_id and 102 not in by_id and 103 not in by_id
        # late insert: a second target-like doc arrives mid-stream
        db.insert_json([_doc(200, "beta alpha beta alpha")])
        rows = _wait(spark, "dsir_adm1", lambda r: len(r) >= 2)
        by_id = {r["doc_id"]: r for r in rows}
        assert 200 in by_id and by_id[200]["dsir_weight"] > 0
        # the reject really is score-based, not a fluke: rerun the gate
        # with a permissive threshold and the junk doc scores negative
        q2 = dsir_admit_stream(
            db, model, threshold=-100.0, query_name="dsir_adm2"
        )
        try:
            rows = _wait(spark, "dsir_adm2", lambda r: len(r) >= 3)
            by_id2 = {r["doc_id"]: r for r in rows}
            assert by_id2[101]["dsir_weight"] < 0
        finally:
            q2.stop()
    finally:
        q.stop()
