"""Data-quality expectations — the contract gate a pipeline runs
before promoting a dataset release: declarative per-row rules
(not-null, range, set membership, regex shape) plus table-level
uniqueness, evaluated in ONE aggregation pass over the scan (each rule
is a ``sum(violation)`` conditional aggregate — map-side combined, no
shuffle beyond the single global agg) and one distinct-count per
uniqueness key.

The report is data, not logs: (rule, n_rows, n_violations, passed) per
rule, so releases can be gated on ``passed`` and violation counts can
be tracked across versions like any other metric (the tabular sibling
of ``profile_drift``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table


def expectation_report(
    df: DataFrame,
    rules: dict[str, Column],
    unique_keys: list[str] | None = None,
) -> DataFrame:
    """Evaluate named per-row rules (Column[boolean]; a row violates a
    rule when the predicate is NOT true — NULL counts as a violation,
    the conservative reading) plus optional uniqueness expectations.
    Output: (rule, n_rows, n_violations, passed), one row per rule."""
    if not rules and not unique_keys:
        raise ValueError("no expectations given")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for name, pred in rules.items():
        aggs.append(
            F.sum(
                F.when(pred, F.lit(0)).otherwise(F.lit(1))
            ).alias(name)
        )
    for key in unique_keys or []:
        aggs.append(
            (F.count(key) - F.count_distinct(F.col(key))).alias(
                f"unique_{key}"
            )
        )
    row = df.agg(*aggs).collect()[0]
    n = int(row["__n"])
    names = list(rules) + [f"unique_{k}" for k in (unique_keys or [])]
    out = [
        (name, n, int(row[name] or 0), int(row[name] or 0) == 0)
        for name in names
    ]
    return df.sparkSession.createDataFrame(
        out, "rule string, n_rows bigint, n_violations bigint, passed boolean"
    )


def events_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: the expectation bundle a release of the events
    table would gate on — id integrity, timestamp sanity, enum
    membership, JSON-shaped props, non-negative values."""
    ev = load_table(spark, sf_dir, "events")
    rules = {
        "event_id_not_null": F.col("event_id").isNotNull(),
        "ts_positive": F.col("ts_ms") > 0,
        "event_type_known": F.col("event_type").isin(
            "view", "click", "purchase", "signup", "error"
        ),
        "value_non_negative": F.col("value") >= 0,
        "props_json_shaped": F.col("props").rlike("^\\{.*\\}$"),
    }
    return expectation_report(ev, rules, unique_keys=["event_id"])
