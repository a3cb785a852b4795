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


# epoch-unit → factor relative to milliseconds.  Divisors (ns, us) use
# *integer* division: nanos (~1.7e18) exceed double's 53-bit mantissa,
# so float division can be ±1 ms off.
_TS_TO_MS = {"ns": ("div", 1_000_000), "us": ("div", 1_000), "ms": ("div", 1), "s": ("mul", 1_000)}


def _ts_safe_schema(path: str) -> tuple[T.StructType | None, str | None]:
    """Footer-derived read schema with timestamp columns (any unit: the
    driver's generator has emitted both ``timestamp[ns]`` and
    ``timestamp[us]`` across rounds) mapped to ``long`` — their physical
    INT64 form, which the vectorized reader takes as-is.  Returns
    ``(schema, unit_of_ts)``; ``(None, None)`` when there is no
    timestamp column (plain read)."""
    import glob

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import from_arrow_schema

    if os.path.isdir(path):  # multi-file dataset: any footer will do
        files = glob.glob(os.path.join(path, "*.parquet"))
        if not files:
            return None, None
        path = files[0]
    arrow = pq.read_schema(path)
    if not any(pa.types.is_timestamp(f.type) for f in arrow):
        return None, None
    unit = None
    fields = []
    for f in arrow:
        if pa.types.is_timestamp(f.type):
            if f.name == "ts":
                unit = f.type.unit
            fields.append(pa.field(f.name, pa.int64()))
        else:
            fields.append(f)
    return from_arrow_schema(pa.schema(fields)), unit


def _int_ts_unit(path: str) -> str:
    """Infer the epoch unit of an INT64 ``ts`` column from footer stats
    magnitude (2000-2100 epochs differ by 3 orders of magnitude per
    unit, so the bands can't collide)."""
    import glob

    import pyarrow.parquet as pq

    if os.path.isdir(path):
        path = glob.glob(os.path.join(path, "*.parquet"))[0]
    pf = pq.ParquetFile(path)
    idx = pf.schema_arrow.get_field_index("ts")
    stats = pf.metadata.row_group(0).column(idx).statistics
    if stats is not None and stats.has_min_max:
        lo = stats.min
    else:  # stats-less writer: read one batch's first value instead
        batch = next(pf.iter_batches(batch_size=1, columns=["ts"]))
        lo = batch.column(0)[0].as_py()
    for unit, bound in (("s", 1e11), ("ms", 1e14), ("us", 1e17)):
        if abs(lo) < bound:
            return unit
    return "ns"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = f"{sf_dir}/{name}.parquet"
    if name != "events":
        return spark.read.parquet(path)
    schema, unit = _ts_safe_schema(path)
    reader = spark.read.schema(schema) if schema is not None else spark.read
    df = reader.parquet(path)
    if "ts_ms" in df.columns and "ts" not in df.columns:
        return df  # already normalized (e.g. bench's scaled replica)
    if unit is None:
        # ts stored as a plain integer (no logical timestamp type):
        # infer the epoch unit from stats magnitude.
        unit = _int_ts_unit(path)
    op, k = _TS_TO_MS[unit]
    expr = f"ts div {k}" if op == "div" else f"ts * {k}"
    return df.withColumn("ts_ms", F.expr(expr)).drop("ts")


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all tables as temp views for spark.sql() use."""
    for name, df in load_all(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
