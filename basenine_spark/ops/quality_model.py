"""Model-based quality scoring — the fastText-style classifier filter
(CCNet / GPT-3 "quality filtering" recipe, public): train a linear
classifier to distinguish a high-quality reference slice from the rest
of the corpus, then keep/weight documents by the model's probability.

Spark-first shape: features are hashed bag-of-words (``HashingTF`` —
feature space fixed at 2^18, no vocabulary state to ship), the trainer
is MLlib's distributed ``LogisticRegression`` (tree-aggregated LBFGS —
the corpus never leaves the executors), scoring is a map-only model
transform. The weak-label construction (reference slice = positive,
hash-sampled rest = negative) mirrors how production pipelines
bootstrap quality classifiers without human labels.

Determinism note: LBFGS over tree-aggregated float sums is
deterministic for a fixed partitioning but the last few probability
digits can vary across layouts — scores are rounded to 4 decimals and
the pytest gates assert held-out separation (AUC), not exact floats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .sampling import _bucket
from .util import stable_round, timed_phase


def _featurize(docs: DataFrame):
    from pyspark.ml.feature import HashingTF

    toks = docs.withColumn(
        "words", F.filter(F.split(F.col("text"), " "), lambda w: w != "")
    )
    tf = HashingTF(
        inputCol="words", outputCol="features", numFeatures=1 << 18
    )
    return tf.transform(toks)


def quality_model_scores(
    spark: SparkSession,
    sf_dir: str,
    reference_source: str = "src0",
    neg_rate: float = 0.5,
    docs: DataFrame | None = None,
) -> DataFrame:
    """Train the weak-label quality classifier and score every
    document.

    Positives: the reference slice (``source == reference_source``).
    Negatives: a content-stable hash sample of the rest at
    ``neg_rate`` (so the training set is bounded relative to the
    reference slice and reproducible — no RNG). Held-out evaluation
    and the separation floor live in pytest.

    Output: (doc_id, source, quality_prob) for every non-null-text
    document, probability rounded to 4 decimals.
    """
    from pyspark.ml.classification import LogisticRegression

    if docs is None:
        docs = load_table(spark, sf_dir, "documents")
    docs = docs.filter(F.col("text").isNotNull())
    feats = _featurize(docs)
    pos = feats.filter(F.col("source") == reference_source).withColumn(
        "label", F.lit(1.0)
    )
    neg = (
        feats.filter(F.col("source") != reference_source)
        .filter(
            _bucket("qmodel", F.col("doc_id"))
            < F.lit("%08x" % int(neg_rate * 0x100000000))
        )
        .withColumn("label", F.lit(0.0))
    )
    train = pos.unionByName(neg).select("features", "label")
    lr = LogisticRegression(
        maxIter=25, regParam=1e-4, standardization=False, tol=1e-7
    )
    model = lr.fit(train)
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(feats.select("doc_id", "source", "features"))
    prob_one = F.element_at(vector_to_array(F.col("probability")), 2)
    return scored.select(
        "doc_id", "source", stable_round(prob_one, 4).alias("quality_prob")
    )


def quality_scoring_contract(
    spark: SparkSession,
    sf_dir: str,
    reference_source: str = "src0",
    tol: float = 1e-6,
) -> DataFrame:
    """Driver-verified contract for :func:`quality_model_scores` (never
    driver-checked in rounds 1-11; the TRAINING floats are layout-
    sensitive, so the model fit stays pytest territory — this row pins
    the SCORING path, which is what every production batch reuses).
    Every emitted probability must equal ``sigmoid(w . tf + b)``
    recomputed from the trained coefficients through a different
    substrate — a broadcast numpy weight vector applied to the sparse
    HashingTF indices in an Arrow batch, vs ``model.transform``'s
    MLlib vector dot. The op emits stable_round(p, 4); the
    recomputation must land within half a grid step (+``tol`` for
    accumulation-order ulps): ``n_score_mismatch`` = 0. Ballast:
    ``n_docs`` (non-NULL text)."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    n_docs = docs.count()
    # build = the production path (featurize + distributed LR fit +
    # model.transform scoring); verify = the independent numpy
    # recomputation and the full-outer diff
    # persist the featurization ONCE (round 14, guide §1.2): `feats`
    # feeds the LR fit, `model.transform`, and the manual numpy
    # scorer — three consumers, each of which re-ran split+HashingTF
    # over the corpus. Same lineage, evaluated once; unpersisted in
    # the finally below.
    feats = _featurize(docs).persist()
    try:
        return _scoring_contract_body(
            spark, feats, n_docs, reference_source, tol
        )
    finally:
        feats.unpersist()


def _scoring_contract_body(spark, feats, n_docs, reference_source, tol):
    from pyspark.ml.classification import LogisticRegression

    with timed_phase("build"):
        pos = feats.filter(F.col("source") == reference_source).withColumn(
            "label", F.lit(1.0)
        )
        neg = (
            feats.filter(F.col("source") != reference_source)
            .filter(
                _bucket("qmodel", F.col("doc_id"))
                < F.lit("%08x" % int(0.5 * 0x100000000))
            )
            .withColumn("label", F.lit(0.0))
        )
        lr = LogisticRegression(
            maxIter=25, regParam=1e-4, standardization=False, tol=1e-7
        )
        model = lr.fit(pos.unionByName(neg).select("features", "label"))

    w = model.coefficients.toArray()  # dense (2^18,) float64, ~2 MiB
    b = float(model.intercept)
    bc = spark.sparkContext.broadcast(w)

    # manual substrate: SparseVector rows scored with the broadcast
    # numpy weight vector on the RDD path (pandas UDFs cannot carry
    # VectorUDT; the per-row Python here is a verification twin over
    # a bounded corpus, not a production path)
    def _score_part(rows):
        import numpy as np

        wv = bc.value
        for r in rows:
            v = r["features"]
            idx = np.asarray(v.indices, dtype=np.int64)
            val = np.asarray(v.values, dtype=np.float64)
            m = float(wv[idx] @ val) + b
            yield (int(r["doc_id"]), 1.0 / (1.0 + float(np.exp(-m))))

    manual = spark.createDataFrame(
        feats.select("doc_id", "features").rdd.mapPartitions(_score_part),
        "doc_id bigint, p_manual double",
    )

    from pyspark.ml.functions import vector_to_array as v2a

    scored = model.transform(feats.select("doc_id", "features"))
    emitted = scored.select(
        "doc_id",
        stable_round(
            F.element_at(v2a(F.col("probability")), 2), 4
        ).alias("quality_prob"),
    )
    with timed_phase("verify"):
        n_mism = (
            emitted.join(manual, "doc_id", "full_outer")
            .filter(
                F.col("quality_prob").isNull()
                | F.col("p_manual").isNull()
                | (
                    F.abs(F.col("quality_prob") - F.col("p_manual"))
                    > F.lit(0.5e-4 + tol)
                )
            )
            .count()
        )
    return spark.createDataFrame(
        [(int(n_docs), int(n_mism))],
        "n_docs bigint, n_score_mismatch bigint",
    )
