"""JSONL corpus ingestion with an explicit corrupt-record policy — the
way raw crawl/export data actually arrives (newline-delimited JSON,
some of it broken), read once with Spark's native JSON source so the
corpus never touches Python.

Three policies, matching production ingest stances:

* ``quarantine`` (default): good rows come back typed, broken lines
  land in a side DataFrame with their raw text — nothing is silently
  dropped, and the quarantine count is the data-quality signal
  (feed it to :mod:`..ops.expectations`);
* ``strict``: any corrupt line fails the read (``FAILFAST``) — the
  contract for data that is supposed to be machine-written;
* ``drop``: corrupt lines vanish (``DROPMALFORMED``) — only for
  sources where brokenness is expected and unactionable.

Scale notes: the schema is supplied by the caller (no inference scan);
``PERMISSIVE`` + ``columnNameOfCorruptRecord`` is a single pass — the
quarantine split is two filters over one cached scan, not two reads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str,
    policy: str = "quarantine",
) -> tuple[DataFrame, DataFrame | None]:
    """Read newline-delimited JSON under ``path`` with the given DDL
    ``schema``. Returns ``(good, quarantined)``; ``quarantined`` is
    None unless ``policy='quarantine'`` (then: one ``raw`` string
    column of the offending lines).

    A PERMISSIVE corrupt row has every data column NULL and the raw
    line in the corrupt column — but so can a VALID line of nulls; the
    split below keys on the corrupt column alone, which Spark
    populates only for unparseable/mismatched lines.
    """
    if policy == "strict":
        df = spark.read.schema(schema).option("mode", "FAILFAST").json(path)
        return df, None
    if policy == "drop":
        df = (
            spark.read.schema(schema)
            .option("mode", "DROPMALFORMED")
            .json(path)
        )
        return df, None
    if policy != "quarantine":
        raise ValueError(f"unknown policy: {policy!r}")
    full_schema = f"{schema}, {CORRUPT_COL} string"
    df = (
        spark.read.schema(full_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
        .cache()
    )
    good = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw")
    )
    return good, bad


def ingest_jsonl_documents(
    spark: SparkSession,
    path: str,
) -> tuple[DataFrame, DataFrame]:
    """Documents-table ingest from JSONL: typed good rows shaped like
    the driver's documents table (doc_id, text, lang, source, n_chars —
    n_chars recomputed, never trusted from the wire) plus the
    quarantine side."""
    good, bad = read_jsonl(
        spark,
        path,
        "doc_id bigint, text string, lang string, source string",
        policy="quarantine",
    )
    typed = good.filter(F.col("doc_id").isNotNull()).select(
        "doc_id",
        "text",
        "lang",
        "source",
        F.coalesce(F.length("text"), F.lit(0)).cast("bigint").alias(
            "n_chars"
        ),
    )
    return typed, bad
