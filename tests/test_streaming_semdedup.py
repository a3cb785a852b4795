"""Online SemDeDup admission stream: a vector is admitted iff it is
not a near-duplicate of anything its cluster has already admitted —
the streaming twin of ops.similarity.semantic_dedup, with per-cluster
state bounded at max_kept unit vectors."""

import json
import time

import numpy as np

from basenine_spark.engine.db import BasenineDB
from basenine_spark.streaming.semdedup import semantic_admit_stream


def _wait_rows(spark, table, want, deadline_s=90):
    deadline = time.time() + deadline_s
    rows = []
    while time.time() < deadline:
        rows = spark.sql(f"SELECT * FROM {table}").collect()
        if len(rows) >= want:
            break
        time.sleep(0.5)
    return rows


def _vec_doc(vid, v):
    return json.dumps({"vec_id": vid, "embedding": [round(float(x), 6) for x in v]})


def test_semantic_admit_stream_end_to_end(spark, tmp_path):
    """4 bases + dups arrive; only the bases are admitted. Dups
    arriving mid-stream stay dropped (state persists across batches);
    a genuinely novel vector is admitted."""
    rng = np.random.RandomState(5)
    base = rng.randn(4, 16)
    db = BasenineDB(spark, path=str(tmp_path / "vecstore"))
    docs = [_vec_doc(i, base[i]) for i in range(4)]
    docs += [
        _vec_doc(4 + i, base[i % 4] + rng.randn(16) * 1e-3) for i in range(8)
    ]
    db.insert_json(docs)
    sq = semantic_admit_stream(
        db,
        centroids=base,  # pre-trained routing: each base is a centroid
        threshold=0.99,
        query_name="sem_admit_t1",
    )
    try:
        rows = _wait_rows(spark, "sem_admit_t1", 4)
        assert sorted(r["vec_id"] for r in rows) == [0, 1, 2, 3]

        # mid-stream: more dups (must stay dropped) + one novel vector
        novel = rng.randn(16)
        db.insert_json(
            [
                _vec_doc(100, base[2] + rng.randn(16) * 1e-3),
                _vec_doc(101, novel),
            ]
        )
        rows = _wait_rows(spark, "sem_admit_t1", 5)
        ids = sorted(r["vec_id"] for r in rows)
        assert ids == [0, 1, 2, 3, 101]
    finally:
        sq.stop()


def test_semantic_admit_stream_bounded_state_still_compares(spark, tmp_path):
    """With max_kept=1 per cluster, the first vector is remembered,
    its later dups are still dropped, and novel vectors are admitted
    (compared but no longer remembered) — bounded state, bounded
    recall."""
    rng = np.random.RandomState(9)
    a = rng.randn(16)
    db = BasenineDB(spark, path=str(tmp_path / "vecstore2"))
    db.insert_json([_vec_doc(0, a)])
    sq = semantic_admit_stream(
        db,
        centroids=[a],  # single cluster
        threshold=0.99,
        max_kept=1,
        query_name="sem_admit_t2",
    )
    try:
        rows = _wait_rows(spark, "sem_admit_t2", 1)
        assert [r["vec_id"] for r in rows] == [0]
        db.insert_json(
            [
                _vec_doc(1, a + rng.randn(16) * 1e-3),  # dup of remembered
                _vec_doc(2, rng.randn(16)),  # novel: admitted, not stored
            ]
        )
        rows = _wait_rows(spark, "sem_admit_t2", 2)
        assert sorted(r["vec_id"] for r in rows) == [0, 2]
    finally:
        sq.stop()
