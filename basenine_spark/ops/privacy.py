"""Privacy-preserving release operators for training corpora.

The reference ships record redaction (``redact(...)`` — server/lib/
basenine.go eval path; re-expressed in ``bfl/``); a 100 TB training-
data pipeline additionally needs GROUP-level privacy before a corpus
or telemetry release: a row whose quasi-identifier combination is
rare is re-identifiable even with direct identifiers redacted.

``k_anonymize_events`` implements classic k-anonymity with a fixed
generalization ladder over the events table's quasi-identifiers
(event type × hour-of-day × value band):

* level 1 — (event_type, hour, width-10 value band)
* level 2 — (event_type, 4-hour block, width-20 value band)
* level 3 — (event_type) only
* level 4 — suppressed (the type itself is rarer than k)

Each row is released at the FINEST level whose group reaches ``k``
rows.  :func:`l_diversify_events` adds the l-diversity bound (>= l
distinct users per released group) on the same ladder, and
:mod:`..streaming.kanon` is the online admission twin.

Scale design (the part that matters at 100 TB): the full table is
aggregated ONCE to the level-1 quasi-identifier rollup; level-2 and
level-3 group sizes are re-aggregations of that rollup (no second
scan), the ladder decision is made on the rollup (bounded:
|event types| × 24 × |bands| rows), and the decision table is
broadcast-joined back to the rows — one full shuffle total, then
map-side work. NULL quasi-identifier components are coalesced to
sentinels (``'(null)'`` / ``-1``) BEFORE grouping so no NULL ever
reaches a join key (Spark equi-joins drop NULL keys where GROUP BY
keeps them — the r6 nulls-fuzz class).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table


def k_anonymize_events(
    spark: SparkSession, sf_dir: str, k: int = 20
) -> DataFrame:
    """Release every event row at the finest generalization level whose
    quasi-identifier group holds at least ``k`` rows.

    Output (one row per event, insertion order): ``event_id``,
    ``qi_type`` (the event type, or ``'(suppressed)'`` at level 4),
    ``qi_hour`` / ``qi_band`` (the generalized indices at the chosen
    level: hour-of-day and width-10 band index at level 1, 4-hour
    block and width-20 band index at level 2, ``-1`` once generalized
    away), ``anon_level`` (1-4) and ``group_n`` (the size of the
    releasing group; 0 when suppressed).
    """
    ev = load_table(spark, sf_dir, "events")
    qi = ev.select(
        "event_id",
        F.coalesce(F.col("event_type"), F.lit("(null)")).alias("et"),
        F.coalesce(
            F.floor(F.col("ts_ms") / F.lit(3600000.0)).cast("bigint") % 24,
            F.lit(-1),
        ).alias("hr"),
        F.coalesce(
            F.floor(F.col("value") / F.lit(10.0)).cast("bigint"),
            F.lit(-1),
        ).alias("b10"),
    )
    l1 = qi.groupBy("et", "hr", "b10").agg(
        F.count(F.lit(1)).alias("n1")
    )
    l1 = l1.withColumn(
        "hr4", F.floor(F.col("hr") / F.lit(4.0)).cast("bigint")
    ).withColumn("b20", F.floor(F.col("b10") / F.lit(2.0)).cast("bigint"))
    # The rollup feeds three branches (l2, l3, and the decision join);
    # without a materialization boundary each branch re-scans the full
    # events table (4 scans in the physical plan). The rollup is
    # bounded (|types| x 24 x |bands|), so pin it once — the whole op
    # then reads events exactly twice: rollup build + row release.
    l1 = l1.localCheckpoint(eager=False)
    l2 = l1.groupBy("et", "hr4", "b20").agg(F.sum("n1").alias("n2"))
    l3 = l1.groupBy("et").agg(F.sum("n1").alias("n3"))
    dec = (
        l1.join(F.broadcast(l2), ["et", "hr4", "b20"])
        .join(F.broadcast(l3), "et")
        .select(
            "et",
            "hr",
            "b10",
            "hr4",
            "b20",
            F.when(F.col("n1") >= k, F.lit(1))
            .when(F.col("n2") >= k, F.lit(2))
            .when(F.col("n3") >= k, F.lit(3))
            .otherwise(F.lit(4))
            .alias("anon_level"),
            F.when(F.col("n1") >= k, F.col("n1"))
            .when(F.col("n2") >= k, F.col("n2"))
            .when(F.col("n3") >= k, F.col("n3"))
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("group_n"),
        )
    )
    lvl = F.col("anon_level")
    return (
        qi.join(F.broadcast(dec), ["et", "hr", "b10"])
        .select(
            "event_id",
            F.when(lvl == 4, F.lit("(suppressed)"))
            .otherwise(F.col("et"))
            .alias("qi_type"),
            F.when(lvl == 1, F.col("hr"))
            .when(lvl == 2, F.col("hr4"))
            .otherwise(F.lit(-1))
            .cast("bigint")
            .alias("qi_hour"),
            F.when(lvl == 1, F.col("b10"))
            .when(lvl == 2, F.col("b20"))
            .otherwise(F.lit(-1))
            .cast("bigint")
            .alias("qi_band"),
            lvl.cast("int").alias("anon_level"),
            "group_n",
        )
        .orderBy("event_id")
    )


def l_diversify_events(
    spark: SparkSession, sf_dir: str, k: int = 20, l_div: int = 5
) -> DataFrame:
    """k-anonymity + l-diversity: a released group must hold at least
    ``k`` rows AND at least ``l_div`` distinct users — k-anonymity
    alone still leaks when a small set of users dominates a group (the
    classic homogeneity attack); the diversity bound closes it.

    Same 3-level generalization ladder and output shape as
    :func:`k_anonymize_events`, plus ``group_users`` (the distinct-user
    count of the releasing group).

    Scale design: distinct users do NOT re-aggregate from row counts,
    so the base rollup is (QI, user)-grained — one full-scan groupBy,
    bounded by distinct (type, hour, band, user) combinations, pinned
    via localCheckpoint; every coarser level re-aggregates that rollup
    (user-level first, then the QI level), the ladder decision is
    broadcast back onto the rows.  Events is read exactly twice.  NULL
    users take a ``-1`` sentinel and count as one "user" — the
    conservative direction (they never inflate diversity past one
    slot)."""
    ev = load_table(spark, sf_dir, "events")
    qi = ev.select(
        "event_id",
        F.coalesce(F.col("event_type"), F.lit("(null)")).alias("et"),
        F.coalesce(
            F.floor(F.col("ts_ms") / F.lit(3600000.0)).cast("bigint") % 24,
            F.lit(-1),
        ).alias("hr"),
        F.coalesce(
            F.floor(F.col("value") / F.lit(10.0)).cast("bigint"),
            F.lit(-1),
        ).alias("b10"),
        F.coalesce(F.col("user_id"), F.lit(-1)).alias("uid"),
    )
    g1 = (
        qi.groupBy("et", "hr", "b10", "uid")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("hr4", F.floor(F.col("hr") / F.lit(4.0)).cast("bigint"))
        .withColumn("b20", F.floor(F.col("b10") / F.lit(2.0)).cast("bigint"))
        .localCheckpoint(eager=False)
    )
    l1 = g1.groupBy("et", "hr", "b10").agg(
        F.sum("cnt").alias("n1"), F.count(F.lit(1)).alias("u1")
    )
    l2 = (
        g1.groupBy("et", "hr4", "b20", "uid")
        .agg(F.sum("cnt").alias("cnt"))
        .groupBy("et", "hr4", "b20")
        .agg(F.sum("cnt").alias("n2"), F.count(F.lit(1)).alias("u2"))
    )
    l3 = (
        g1.groupBy("et", "uid")
        .agg(F.sum("cnt").alias("cnt"))
        .groupBy("et")
        .agg(F.sum("cnt").alias("n3"), F.count(F.lit(1)).alias("u3"))
    )
    keys = g1.select("et", "hr", "b10", "hr4", "b20").dropDuplicates(
        ["et", "hr", "b10"]
    )
    ok1 = (F.col("n1") >= k) & (F.col("u1") >= l_div)
    ok2 = (F.col("n2") >= k) & (F.col("u2") >= l_div)
    ok3 = (F.col("n3") >= k) & (F.col("u3") >= l_div)
    dec = (
        keys.join(F.broadcast(l1), ["et", "hr", "b10"])
        .join(F.broadcast(l2), ["et", "hr4", "b20"])
        .join(F.broadcast(l3), "et")
        .select(
            "et",
            "hr",
            "b10",
            "hr4",
            "b20",
            F.when(ok1, F.lit(1))
            .when(ok2, F.lit(2))
            .when(ok3, F.lit(3))
            .otherwise(F.lit(4))
            .alias("anon_level"),
            F.when(ok1, F.col("n1"))
            .when(ok2, F.col("n2"))
            .when(ok3, F.col("n3"))
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("group_n"),
            F.when(ok1, F.col("u1"))
            .when(ok2, F.col("u2"))
            .when(ok3, F.col("u3"))
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("group_users"),
        )
    )
    lvl = F.col("anon_level")
    return (
        qi.join(F.broadcast(dec), ["et", "hr", "b10"])
        .select(
            "event_id",
            F.when(lvl == 4, F.lit("(suppressed)"))
            .otherwise(F.col("et"))
            .alias("qi_type"),
            F.when(lvl == 1, F.col("hr"))
            .when(lvl == 2, F.col("hr4"))
            .otherwise(F.lit(-1))
            .cast("bigint")
            .alias("qi_hour"),
            F.when(lvl == 1, F.col("b10"))
            .when(lvl == 2, F.col("b20"))
            .otherwise(F.lit(-1))
            .cast("bigint")
            .alias("qi_band"),
            lvl.cast("int").alias("anon_level"),
            "group_n",
            "group_users",
        )
        .orderBy("event_id")
    )
