"""Stream-stream interval attribution join (streaming twin of the
batch as-of join)."""

import json
import time

from basenine_spark.engine.db import BasenineDB
from basenine_spark.streaming.asof import attribution_join_stream

MIN = 60_000


def test_attribution_pairs_within_horizon(spark, tmp_path):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    db = BasenineDB(spark, path=str(tmp_path / "docstore"))
    base = 1_700_000_000_000

    def ev(et, user, ms):
        return json.dumps({"event_type": et, "user": user, "ts_ms": ms})

    db.insert_json(
        [
            ev("click", "u1", base),                # inside 30 min horizon
            ev("click", "u1", base + 25 * MIN),     # inside
            ev("click", "u1", base + 40 * MIN),     # AFTER purchase: excluded
            ev("click", "u2", base + 5 * MIN),      # other user
            ev("purchase", "u1", base + 29 * MIN),
            ev("purchase", "u2", base + 90 * MIN),  # no click in horizon
        ]
    )
    sq = attribution_join_stream(db, horizon_minutes=30, query_name="attr_t1")
    try:
        deadline = time.time() + 60
        got = set()
        while time.time() < deadline:
            rows = spark.sql(
                "SELECT purchase_user, purchase_ms, click_ms FROM attr_t1"
            ).collect()
            got = {(r["purchase_user"], r["purchase_ms"], r["click_ms"]) for r in rows}
            if len(got) >= 2:
                break
            time.sleep(0.5)
        assert got == {
            ("u1", base + 29 * MIN, base),
            ("u1", base + 29 * MIN, base + 25 * MIN),
        }, got
    finally:
        sq.stop()
