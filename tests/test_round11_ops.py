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


# -- round-11 late contracts ---------------------------------------------------


def test_simhash_contract_zero(spark):
    from basenine_spark.ops.dedup import simhash_contract

    row = simhash_contract(spark, SF).collect()[0]
    assert row["n_docs"] == 500
    assert row["n_hash_mismatch"] == 0
    assert row["n_pigeonhole_missed"] == 0


def test_embedding_near_dup_contract_zero_and_dup_recall(spark, tmp_path):
    from basenine_spark.ops.similarity import embedding_near_dup_contract

    row = embedding_near_dup_contract(spark, SF).collect()[0]
    assert row["n_vecs"] == 500
    assert row["n_precision_violations"] == 0
    assert row["n_dup_pairs_missed"] == 0

    # plant exact duplicates: the dup-recall counter must stay zero
    # BECAUSE the pairs are found, not because there are none
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF}/embeddings.parquet")
    cols = {n: t.column(n).to_pylist() for n in t.column_names}
    n = len(cols["vec_id"])
    max_id = max(cols["vec_id"])
    for i in (3, 17, 41):
        row_copy = {k: cols[k][i] for k in cols}
        row_copy["vec_id"] = max_id + 1 + i
        for k in cols:
            cols[k].append(row_copy[k])
    out = pa.Table.from_arrays(
        [pa.array(cols[f.name], type=f.type) for f in t.schema],
        schema=t.schema,
    )
    d = tmp_path / "dupemb"
    d.mkdir()
    pq.write_table(out, str(d / "embeddings.parquet"))

    from basenine_spark.ops.similarity import embedding_near_dup

    pairs = embedding_near_dup(spark, str(d)).collect()
    planted = {(cols["vec_id"][i], max_id + 1 + i) for i in (3, 17, 41)}
    got = {(r["vec_a"], r["vec_b"]) for r in pairs}
    assert planted <= got  # identical vectors are ALWAYS found
    row2 = embedding_near_dup_contract(spark, str(d)).collect()[0]
    assert row2["n_dup_pairs_missed"] == 0
    assert row2["n_vecs"] == n + 3


def test_embed_clusters_contract_zero(spark):
    from basenine_spark.ops.similarity import embed_clusters_contract

    row = embed_clusters_contract(spark, SF).collect()[0]
    assert row["n_vecs"] == 500
    assert row["n_argmin_violations"] == 0
    assert row["n_dist_mismatch"] == 0


def test_kcenter_parity_contract_zero(spark):
    from basenine_spark.ops.similarity import kcenter_parity_contract

    row = kcenter_parity_contract(spark, SF).collect()[0]
    assert row["n_vecs"] == 500
    assert row["row_delta"] == 0
    assert row["n_mismatch"] == 0


def test_bpe_roundtrip_contract_zero(spark):
    from basenine_spark.ops.bpe import bpe_roundtrip_contract

    row = bpe_roundtrip_contract(spark, SF).collect()[0]
    assert row["n_distinct_words"] > 0
    assert row["n_lossless_violations"] == 0
    assert row["n_bound_violations"] == 0


def test_semantic_dedup_contract_zero(spark):
    from basenine_spark.ops.similarity import semantic_dedup_contract

    row = semantic_dedup_contract(spark, SF).collect()[0]
    assert row["n_vecs"] == 500
    assert row["n_kept_pair_violations"] == 0
    assert row["n_dropped_uncovered"] == 0


def test_phash_roundtrip_verified_zero(spark):
    from basenine_spark.ops.multimodal import phash_roundtrip_verified

    row = phash_roundtrip_verified(spark, SF).collect()[0]
    assert row["n_payloads"] > 0
    assert row["n_decode_fail"] == 0
    assert row["n_mismatch"] == 0


def test_spectral_roundtrip_verified_zero(spark):
    from basenine_spark.ops.multimodal import spectral_roundtrip_verified

    row = spectral_roundtrip_verified(spark, SF).collect()[0]
    assert row["n_payloads"] > 0
    assert row["n_decode_fail"] == 0
    assert row["n_mismatch"] == 0


# -- round-11 contract wave: the last never-driver-checked families ---------

SF_SMALL = "/root/testdata/sf0.001"


def test_pagerank_contract_zero_counters(spark):
    from basenine_spark.ops.graph import pagerank_contract

    rows = [tuple(r) for r in pagerank_contract(spark, SF_SMALL).collect()]
    assert len(rows) == 1 and rows[0][1] == 0 and rows[0][2] == 0, rows


def test_zorder_contract_zero_counters(spark):
    from basenine_spark.ops.layout import zorder_contract

    rows = [tuple(r) for r in zorder_contract(spark, SF_SMALL).collect()]
    assert len(rows) == 1 and rows[0][1] == 0 and rows[0][2] == 0, rows


def test_triplets_contract_zero_counters(spark):
    from basenine_spark.ops.similarity import triplets_contract

    rows = [tuple(r) for r in triplets_contract(spark, SF_SMALL).collect()]
    assert len(rows) == 1 and all(v == 0 for v in rows[0][1:]), rows


def test_media_hamming_contract_zero_counters(spark):
    from basenine_spark.ops.multimodal import media_near_dup_contract

    rows = [
        tuple(r) for r in media_near_dup_contract(spark, SF_SMALL).collect()
    ]
    assert len(rows) == 1 and all(v == 0 for v in rows[0][2:]), rows
    assert rows[0][0] > 0 and rows[0][1] > 0


def test_normalized_dedup_contract_zero_counters(spark):
    from basenine_spark.ops.text import normalized_dedup_contract

    rows = [
        tuple(r) for r in normalized_dedup_contract(spark, SF_SMALL).collect()
    ]
    assert len(rows) == 1 and all(v == 0 for v in rows[0][1:]), rows


def test_quality_scoring_contract_zero_counters(spark):
    from basenine_spark.ops.quality_model import quality_scoring_contract

    rows = [
        tuple(r)
        for r in quality_scoring_contract(spark, SF_SMALL).collect()
    ]
    assert len(rows) == 1 and rows[0][1] == 0, rows


def test_asset_routing_contract_zero_counters(spark):
    from basenine_spark.ops.multimodal import asset_routing_contract

    rows = [
        tuple(r) for r in asset_routing_contract(spark, SF_SMALL).collect()
    ]
    assert len(rows) == 1 and all(v == 0 for v in rows[0][1:]), rows


def test_fertility_char_baseline_is_chars_per_word(spark):
    """num_merges=0 makes the BPE encode the identity on characters:
    token count per doc equals the summed word lengths — the fixed
    point the driver's full SQL oracle relies on."""
    from pyspark.sql import functions as F

    from basenine_spark.ops.bpe import tokenizer_fertility
    from basenine_spark.sources.tables import load_table

    out = {r["source"]: r for r in
           tokenizer_fertility(spark, SF_SMALL, num_merges=0).collect()}
    docs = load_table(spark, SF_SMALL, "documents").filter(
        F.col("text").isNotNull()
    )
    want = {
        r["source"]: r
        for r in docs.select(
            "source",
            F.aggregate(
                F.filter(F.split("text", " "), lambda w: w != ""),
                F.lit(0),
                lambda acc, w: acc + F.length(w),
            ).alias("n_toks"),
        )
        .groupBy("source")
        .agg(F.sum("n_toks").alias("n_toks"))
        .collect()
    }
    assert set(out) == set(want)
    for src, row in out.items():
        assert row["n_bpe_tokens"] == want[src]["n_toks"], src
