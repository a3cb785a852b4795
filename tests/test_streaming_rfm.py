"""Streaming RFM: per-user state accumulates across micro-batches,
frozen-boundary scores apply, NULL rows are dropped safely."""

import json
import time

from basenine_spark.engine.db import BasenineDB
from basenine_spark.streaming.rfm import rfm_stream


def _ev(eid, uid, ts_ms, value):
    return json.dumps(
        {"event_id": eid, "user_id": uid, "ts_ms": ts_ms, "value": value}
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


def _latest(rows):
    out = {}
    for r in rows:
        cur = out.get(r["user_id"])
        if cur is None or r["frequency"] > cur["frequency"]:
            out[r["user_id"]] = r
    return out


def test_accumulation_scoring_and_null_safety(spark, tmp_path):
    db = BasenineDB(spark, path=str(tmp_path / "rfmstore"))
    db.insert_json(
        [
            _ev(1, 7, 1000, 10.0),
            _ev(2, 7, 5000, 2.5),
            _ev(3, 8, 2000, None),  # NULL value: counts, adds nothing
            _ev(4, None, 3000, 1.0),  # NULL user: dropped
            json.dumps({"event_id": 5, "user_id": 9}),  # NULL ts: dropped
        ]
    )
    q = rfm_stream(
        db,
        r_cuts=[1500.0, 4000.0],  # 3 recency buckets
        f_cuts=[1.5],  # freq 1 → 1, ≥2 → 2 (cuts are bisect_right)
        m_cuts=[5.0],
        query_name="rfm1",
    )
    try:
        rows = _wait(spark, "rfm1", lambda r: len(_latest(r)) >= 2)
        live = _latest(rows)
        assert set(live) == {7, 8}
        u7 = live[7]
        assert u7["recency_ms"] == 5000 and u7["frequency"] == 2
        assert u7["monetary"] == 12.5
        assert u7["r_score"] == 3 and u7["f_score"] == 2 and u7["m_score"] == 2
        u8 = live[8]
        assert u8["frequency"] == 1 and u8["monetary"] == 0.0
        assert u8["r_score"] == 2 and u8["f_score"] == 1 and u8["m_score"] == 1
        # late events fold into existing state
        db.insert_json([_ev(6, 8, 9000, 100.0)])
        rows = _wait(
            spark,
            "rfm1",
            lambda r: _latest(r).get(8, {"frequency": 0})["frequency"] >= 2,
        )
        u8 = _latest(rows)[8]
        assert u8["recency_ms"] == 9000 and u8["frequency"] == 2
        assert u8["monetary"] == 100.0
        assert u8["r_score"] == 3 and u8["m_score"] == 2
    finally:
        q.stop()
