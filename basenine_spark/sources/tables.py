"""Parquet table loaders for the driver test data (TESTDATA.md).

Scans here are the replacement for the reference's length-prefixed log
reader (``native.go:1112-1136``): Parquet gives predicate/column pushdown
and file-stat pruning for free (SURVEY.md §2.1 S5).

The ``events`` table is written with TIMESTAMP(NANOS) which Spark's
vectorized reader rejects; we read it via
``spark.sql.legacy.parquet.nanosAsLong`` and normalize to an epoch-millis
``ts_ms`` BIGINT — the only time representation BFL has (SURVEY §1.2).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # nanos → millis via *integer* division: nanos (~1.7e18) exceed
        # double's 53-bit mantissa, so float division can be ±1 ms off.
        df = df.withColumn("ts_ms", F.expr("ts div 1000000")).drop("ts")
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all tables as temp views for spark.sql() use."""
    for name, df in load_all(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
