"""The per-cluster GEMM SemDeDup checker (round 14,
similarity._semdedup_check_counts) against the join shape it replaced:
identical violation counts on the real dev corpus AND on a planted
corpus engineered to have nonzero counts for a deliberately wrong
threshold — so the equality can't pass vacuously on (0, 0)."""

from pyspark.sql import functions as F

from basenine_spark.ops.similarity import (
    _semdedup_check_counts,
    dot,
    embed_clusters,
    load_embeddings,
    norm_col,
    semantic_dedup,
)

SF = "/root/testdata/sf0.01"


def _join_shape_counts(kept_e, dropped, threshold, tol):
    """The pre-round-14 reference implementation: kept×kept self-join
    for pair violations, dropped×kept left join for coverage."""
    a, b = kept_e.alias("a"), kept_e.alias("b")
    pair_sim = dot(F.col("a.embedding"), F.col("b.embedding")) / (
        F.col("a.nrm") * F.col("b.nrm")
    )
    viol1 = (
        a.join(
            b,
            (F.col("a.cluster") == F.col("b.cluster"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .filter(pair_sim > F.lit(threshold + tol))
        .count()
    )
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
                    dot(F.col("d.embedding"), F.col("w_embedding"))
                    / (F.col("d.nrm") * F.col("w_nrm"))
                    >= F.lit(threshold - tol)
                )
            ).alias("is_witness"),
        )
        .groupBy("vec_id")
        .agg(F.max(F.col("is_witness")).alias("has_witness"))
        .filter(~F.col("has_witness"))
        .count()
    )
    return int(viol1), int(viol2)


def _frames(spark, k=8, iters=4, threshold=0.35):
    kept = semantic_dedup(
        spark, SF, k=k, iters=iters, threshold=threshold
    ).localCheckpoint(eager=True)
    assigned = embed_clusters(spark, SF, k=k, iters=iters).select(
        "vec_id", "cluster"
    )
    emb = load_embeddings(spark, SF).select(
        "vec_id",
        "embedding",
        F.when(norm_col(F.col("embedding")) == 0.0, F.lit(1.0))
        .otherwise(norm_col(F.col("embedding")))
        .alias("nrm"),
    )
    kept_e = kept.join(emb, "vec_id").localCheckpoint(eager=True)
    dropped = (
        assigned.join(kept.select("vec_id"), "vec_id", "left_anti")
        .join(emb, "vec_id")
        .localCheckpoint(eager=True)
    )
    return kept_e, dropped


def test_gemm_checker_matches_join_shape_green(spark):
    """On the real contract inputs both shapes report (0, 0)."""
    kept_e, dropped = _frames(spark)
    threshold, tol = 0.35, 1e-6
    gemm = _semdedup_check_counts(kept_e, dropped, threshold, tol)
    join = _join_shape_counts(kept_e, dropped, threshold, tol)
    assert gemm == join == (0, 0)


def test_gemm_checker_matches_join_shape_nonzero(spark):
    """Checked at boundaries the survivor set was NOT built for, both
    counts go nonzero — and the two substrates still agree exactly."""
    kept_e, dropped = _frames(spark, threshold=0.35)
    for wrong_thr in (0.05, 0.8):
        gemm = _semdedup_check_counts(kept_e, dropped, wrong_thr, 1e-6)
        join = _join_shape_counts(kept_e, dropped, wrong_thr, 1e-6)
        assert gemm == join, (wrong_thr, gemm, join)
    # the pair check trips below the build threshold, the coverage
    # check above it — both branches of the checker are exercised
    assert _semdedup_check_counts(kept_e, dropped, 0.05, 1e-6)[0] > 0
    assert _semdedup_check_counts(kept_e, dropped, 0.8, 1e-6)[1] > 0
