"""Parquet table loaders for the driver test data (TESTDATA.md).

Scans here are the replacement for the reference's length-prefixed log
reader (``native.go:1112-1136``): Parquet gives predicate/column pushdown
and file-stat pruning for free (SURVEY.md §2.1 S5).

The ``events`` table is written with TIMESTAMP(NANOS) which Spark's
vectorized reader rejects by default; we read it with an explicit schema
derived from the parquet footer (nanos column → BIGINT — physically
INT64, so the vectorized reader takes it as-is) and normalize to an
epoch-millis ``ts_ms`` BIGINT — the only time representation BFL has
(SURVEY §1.2).  No session config is touched anywhere on a load/query
path: a ``spark.conf.set`` inside a loader is a race against concurrent
readers of other tables (VERDICT r2).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

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


def _nanos_safe_schema(path: str) -> T.StructType | None:
    """Footer-derived read schema with ``timestamp[ns]`` columns mapped
    to ``long`` (their physical INT64 form), or None when the file has
    no nanos column (plain read)."""
    import glob

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import from_arrow_schema

    if os.path.isdir(path):  # multi-file dataset: any footer will do
        files = glob.glob(os.path.join(path, "*.parquet"))
        if not files:
            return None
        path = files[0]
    arrow = pq.read_schema(path)
    if not any(
        pa.types.is_timestamp(f.type) and f.type.unit == "ns" for f in arrow
    ):
        return None
    fields = [
        pa.field(f.name, pa.int64())
        if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
        else f
        for f in arrow
    ]
    return from_arrow_schema(pa.schema(fields))


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = f"{sf_dir}/{name}.parquet"
    reader = spark.read
    if name == "events":
        schema = _nanos_safe_schema(path)
        if schema is not None:
            reader = reader.schema(schema)
    df = reader.parquet(path)
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
