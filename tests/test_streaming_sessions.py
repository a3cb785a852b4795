"""Stateful streaming sessionization (applyInPandasWithState).

Sessions close either by an in-data gap (a newer event arrives > gap
after the previous one) or by processing-time idle timeout.
"""

import json
import time

from basenine_spark.engine.db import BasenineDB
from basenine_spark.streaming.sessions import session_stream


def test_session_stream_gap_and_timeout(spark, tmp_path):
    db = BasenineDB(spark, path=str(tmp_path / "docstore"))
    base = 1_700_000_000_000
    # user 1: two bursts separated by > 30 min (gap closes session 1);
    # user 2: one burst (closes only via idle timeout)
    batch1 = [
        json.dumps({"user_id": 1, "ts_ms": base + i * 1000}) for i in range(3)
    ] + [json.dumps({"user_id": 2, "ts_ms": base + i * 500}) for i in range(4)]
    db.insert_json(batch1)
    sq = session_stream(db, gap_minutes=30, idle_timeout_seconds=3,
                        query_name="sess_t1")
    try:
        # second burst for user 1, 45 min later -> closes their first session
        db.insert_json(
            [json.dumps({"user_id": 1, "ts_ms": base + 45 * 60_000 + i * 1000})
             for i in range(2)]
        )
        deadline = time.time() + 60
        rows = []
        while time.time() < deadline:
            rows = spark.sql("SELECT * FROM sess_t1").collect()
            if len(rows) >= 3:
                break
            time.sleep(0.5)
        by_user = {}
        for r in rows:
            by_user.setdefault(r["user_id"], []).append(r)
        # user 1 session 1: closed by the in-data gap
        u1 = sorted(by_user.get(1, []), key=lambda r: r["session_start_ms"])
        assert u1 and u1[0]["n_events"] == 3
        assert u1[0]["session_start_ms"] == base
        assert u1[0]["session_end_ms"] == base + 2000
        # user 2: closed by idle timeout
        u2 = by_user.get(2, [])
        assert u2 and u2[0]["n_events"] == 4
        # user 1 session 2 eventually closes by timeout too
        assert len(rows) >= 3
    finally:
        sq.stop()
