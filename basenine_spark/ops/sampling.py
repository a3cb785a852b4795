"""Deterministic sampling for training-data pipelines.

A 100 TB corpus is sampled by *content-stable hash thresholds*, not by
``rand()``: the decision for a document depends only on (salt, doc_id),
so re-runs, retries, and other engines (the DuckDB oracle) pick exactly
the same rows — a requirement for reproducible dataset releases.

The predicate compares the first 8 hex chars of ``md5(salt || doc_id)``
against a hex threshold string: both Spark and DuckDB emit lowercase
hex, so a plain lexicographic compare is portable with no integer
conversion anywhere.  Map-only (no shuffle), pushdown-friendly
(deterministic scalar expression over scanned columns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table


def rate_to_hex_threshold(rate: float) -> str:
    """First-8-hex-chars threshold for a sampling rate in [0, 1]."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate out of range: {rate}")
    # "g" sorts above every lowercase hex digit → rate 1.0 keeps all
    return "%08x" % int(rate * 0x100000000) if rate < 1.0 else "g"


def _bucket(salt: str, key) -> F.Column:
    return F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 8)


def deterministic_sample(
    df: DataFrame, key: str, rate: float, salt: str = "bn"
) -> DataFrame:
    """Content-stable Bernoulli sample: keep rows whose hash bucket
    falls below the rate threshold."""
    return df.filter(_bucket(salt, F.col(key)) < rate_to_hex_threshold(rate))


def stratified_sample(
    spark: SparkSession,
    sf_dir: str,
    rates: dict[str, float] | None = None,
    default_rate: float = 0.1,
    salt: str = "bn",
) -> DataFrame:
    """Per-source sampling of the documents table (the standard
    training-mix operation: keep X% of crawl, Y% of wiki, ...).
    Deterministic and engine-portable; the driver oracle reproduces it
    verbatim in SQL."""
    rates = rates or {"src0": 0.8, "src1": 0.25, "src2": 0.5}
    docs = load_table(spark, sf_dir, "documents")
    thr = F.lit(rate_to_hex_threshold(default_rate))
    for source, rate in sorted(rates.items()):
        thr = F.when(
            F.col("source") == source, F.lit(rate_to_hex_threshold(rate))
        ).otherwise(thr)
    return docs.filter(_bucket(salt, F.col("doc_id")) < thr).select(
        "doc_id", "source"
    )
