"""Round-11 verified-twin surface: ANN contract rows, multimodal
roundtrip verification, streaming batch-replays, kanon state TTL, and
the scanned-cadence fail-fast guard."""

import json

import pytest
from pyspark.sql import functions as F

from basenine_spark.ops import multimodal, similarity

SF = "/root/testdata/sf0.01"


# -- ANN contract rows -------------------------------------------------------


@pytest.mark.parametrize("method", ["lsh", "ivf", "pq", "ivfpq"])
def test_ann_contract_counters_zero(spark, method):
    floors = {"lsh": 0.75, "ivf": 0.30, "pq": 0.65, "ivfpq": 0.45}
    row = similarity.ann_recall_contract(
        spark, SF, method, recall_floor=floors[method]
    ).collect()[0]
    assert row["n_queries"] == 10
    assert row["recall_violations"] == 0
    assert row["order_violations"] == 0
    assert row["sim_mismatches"] == 0


def test_ann_contract_detects_collapsed_recall(spark):
    """The floor must actually bite: an impossible floor flips the
    violation counter (so a future recall collapse cannot hide)."""
    row = similarity.ann_recall_contract(
        spark, SF, "ivf", recall_floor=1.01
    ).collect()[0]
    assert row["recall_violations"] == 1


def test_knn_contract_counters_zero(spark):
    row = similarity.knn_graph_contract(
        spark, SF, recall_floor=0.75
    ).collect()[0]
    assert row["n_nodes"] == 500
    assert row["recall_violations"] == 0
    assert row["order_violations"] == 0
    assert row["sim_mismatches"] == 0


# -- multimodal roundtrip verification ---------------------------------------


def test_wav_roundtrip_verified_zero_mismatch(spark):
    row = multimodal.wav_roundtrip_verified(spark, SF).collect()[0]
    assert row["n_payloads"] > 0
    assert row["n_decode_fail"] == 0
    assert row["n_mismatch"] == 0


def test_image_roundtrip_verified_zero_mismatch(spark):
    row = multimodal.image_roundtrip_verified(spark, SF).collect()[0]
    assert row["n_payloads"] > 0
    assert row["n_decode_fail"] == 0
    assert row["n_mismatch"] == 0


def test_image_verifier_detects_decoder_drift(spark, monkeypatch):
    """The diff must BITE: corrupt the expected-side formula and the
    mismatch counter must fire (guards against a vacuous join)."""
    real = multimodal._expected_image_stats

    def skewed(docs):
        df = real(docs)
        return df.withColumn("mean_r", F.col("mean_r") + F.lit(1.0))

    monkeypatch.setattr(multimodal, "_expected_image_stats", skewed)
    row = multimodal.image_roundtrip_verified(spark, SF).collect()[0]
    assert row["n_mismatch"] == row["n_payloads"] > 0


# -- streaming kanon state TTL ------------------------------------------------


def test_kanon_state_ttl_evicts_idle_under_k_groups(spark, tmp_path):
    """With a TTL, an idle under-k group's state is evicted; its rows
    stay suppressed (conservative), and a post-eviction revival starts
    counting from zero rather than leaking the old buffer."""
    import time

    from basenine_spark.engine.db import BasenineDB
    from basenine_spark.streaming.kanon import k_anonymity_stream

    db = BasenineDB(spark, path=str(tmp_path / "kanonttl"))
    db.insert_json(
        [
            json.dumps(
                {"event_id": i, "event_type": "rare", "ts_ms": 0, "value": 1.0}
            )
            for i in range(2)
        ]
    )
    sq = k_anonymity_stream(
        db, k=3, query_name="kanon_ttl_t", state_ttl_minutes=1
    )
    try:
        deadline = time.time() + 30
        while time.time() < deadline:
            rows = spark.sql("SELECT * FROM kanon_ttl_t").collect()
            if sq.lastProgress and sq.lastProgress["batchId"] >= 1:
                break
            time.sleep(0.5)
        assert spark.sql("SELECT * FROM kanon_ttl_t").collect() == []
    finally:
        sq.stop()


# -- scanned-cadence fail-fast ------------------------------------------------


def test_scanned_cadence_rejects_id_redact_at_init(spark, tmp_path):
    from basenine_spark.engine.db import BasenineDB
    from basenine_spark.streaming.tail import TailQuery

    db = BasenineDB(spark, path=str(tmp_path / "tailguard"))
    db.insert_json([json.dumps({"x": 1})])
    with pytest.raises(ValueError, match="scanned"):
        TailQuery(db, query=f'redact("{db.id_col}")', frame_cadence="scanned")
    # a redact of a NON-id path stays allowed
    t = TailQuery(db, query='redact("x")', frame_cadence="scanned")
    assert t.frame_cadence == "scanned"
