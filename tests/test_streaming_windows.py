"""Watermarked streaming windowed aggregation (T4 extension)."""

import json
import time

from pyspark.sql import functions as F

from basenine_spark.engine.db import BasenineDB
from basenine_spark.streaming.windows import windowed_counts_stream

HOUR = 3_600_000


def test_windowed_counts_with_late_data(spark, tmp_path):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    db = BasenineDB(spark, path=str(tmp_path / "docstore"))
    base = (1_700_000_000_000 // HOUR) * HOUR  # aligned hour start
    db.insert_json(
        [json.dumps({"event_type": "click", "ts_ms": base + i * 60_000}) for i in range(5)]
        + [json.dumps({"event_type": "view", "ts_ms": base + HOUR + 60_000})]
    )
    sq = windowed_counts_stream(db, query_name="win_t1")
    try:
        # a late-but-within-watermark row for the first window
        time.sleep(2)
        db.insert_json([json.dumps({"event_type": "click", "ts_ms": base + 2 * 60_000 + 1})])
        deadline = time.time() + 60
        rows = {}
        while time.time() < deadline:
            got = spark.sql(
                "SELECT window_start_ms, key, max(cnt) AS cnt FROM win_t1 "
                "GROUP BY 1, 2"
            ).collect()
            rows = {(r["window_start_ms"], r["key"]): r["cnt"] for r in got}
            if rows.get((base, "click")) == 6 and rows.get((base + HOUR, "view")) == 1:
                break
            time.sleep(0.5)
        assert rows.get((base, "click")) == 6, rows   # 5 + 1 late row
        assert rows.get((base + HOUR, "view")) == 1, rows
    finally:
        sq.stop()
