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
from .util import stable_round


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
