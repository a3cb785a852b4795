"""Streaming anomaly detection: spikes flagged online across
micro-batches, warm-up respected, state (Welford moments) persists,
steady traffic stays silent."""

import json
import time

from basenine_spark.engine.db import BasenineDB
from basenine_spark.streaming.anomaly import anomaly_stream


def _wait_rows(spark, table, want, deadline_s=90):
    deadline = time.time() + deadline_s
    rows = []
    while time.time() < deadline:
        rows = spark.sql(f"SELECT * FROM {table}").collect()
        if len(rows) >= want:
            break
        time.sleep(0.5)
    return rows


def _ev(eid, et, val):
    return json.dumps({"event_id": eid, "event_type": et, "value": val})


def test_anomaly_stream_end_to_end(spark, tmp_path):
    db = BasenineDB(spark, path=str(tmp_path / "anomstore"))
    # batch 1: 20 jittered-baseline events + one huge spike at the end
    baseline = [_ev(i, "api", 10.0 + (i % 5) * 0.1) for i in range(20)]
    db.insert_json(baseline + [_ev(20, "api", 500.0)])
    sq = anomaly_stream(db, z_threshold=3.0, min_n=10, query_name="anom_t1")
    try:
        rows = _wait_rows(spark, "anom_t1", 1)
        got = {(r["event_id"], r["event_type"]) for r in rows}
        assert (20, "api") in got
        # only the spike fires; the first min_n rows were warm-up and
        # the baseline jitter is within 3 sigma
        assert len(got) == 1

        # batch 2: steady traffic stays silent; a new spike fires —
        # state carried the moments across batches
        db.insert_json(
            [_ev(30 + i, "api", 10.2 + (i % 3) * 0.1) for i in range(10)]
            + [_ev(99, "api", -400.0)]
        )
        rows = _wait_rows(spark, "anom_t1", 2)
        got = {(r["event_id"], r["event_type"]) for r in rows}
        assert (99, "api") in got
        assert len(got) == 2

        # independent key: its own warm-up, no cross-contamination
        db.insert_json([_ev(200, "db", 99999.0)])
        time.sleep(3)
        got = {
            (r["event_id"], r["event_type"])
            for r in spark.sql("SELECT * FROM anom_t1").collect()
        }
        assert (200, "db") not in got  # db key has n=0 < min_n
    finally:
        sq.stop()
