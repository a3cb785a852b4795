"""Relational extension operators (aggregations, joins, windows, set ops).

The reference implements none of these (verified SURVEY.md §2.3-2.7); they
are the Spark-for-free extension surface. Every builder here takes
``(spark, sf_dir)`` and returns a declarative DataFrame plan so Catalyst
gets full pushdown/pruning/codegen.

Scale notes (100 TB):

* Dimension sides of joins are wrapped in ``F.broadcast`` when they are
  dimension-sized (customer/nation/region at TPC-H proportions) — the
  fact table never shuffles for those joins.
* Aggregations are expressed as ``groupBy().agg()`` → Catalyst plans
  partial (map-side) aggregation before the shuffle, so the shuffle
  carries one row per (partition × group), not per input row.
* Top-N uses ``row_number`` over a window **partitioned by** a key —
  a single hash shuffle on the partition key, no global sort; global
  top-K uses ``orderBy().limit()`` which Spark executes as
  TakeOrderedAndProject (per-partition heap + driver merge).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .util import stable_round


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary over lineitem.

    Filter is pushed to the Parquet scan; sums are rounded to 2 decimals
    so the double accumulation order (Spark partial-agg tree vs a serial
    oracle) cannot flip the printed value.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_quantity") < 48)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            stable_round(F.sum("l_quantity"), 2).alias("sum_qty"),
            stable_round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            stable_round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_disc_price"
            ),
            stable_round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def revenue_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-style filtered aggregate — the canonical pushdown probe.

    All three predicates reach the scan (`PushedFilters`), only three
    columns are read (`ReadSchema`).
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            stable_round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue")
        )
    )


def mktsegment_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders ⋈ customer (broadcast) → orders and value per market segment.

    customer is the dimension side → broadcast hash join, no shuffle of
    the orders fact table.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return (
        orders.join(
            F.broadcast(customer.select("c_custkey", "c_mktsegment")),
            orders.o_custkey == F.col("c_custkey"),
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("order_cnt"),
            stable_round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )


def top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-flavored 3-way join + top-10 orders by lineitem revenue.

    customer is broadcast; orders⋈lineitem shuffles on orderkey (the
    natural co-partitioning key). Global top-10 is
    TakeOrderedAndProject. Revenue rounded before ranking so the rank is
    stable across accumulation orders; o_orderkey breaks ties.
    """
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(
            F.broadcast(customer.filter(F.col("c_mktsegment") == "BUILDING")),
            orders.o_custkey == F.col("c_custkey"),
        )
        .groupBy("o_orderkey")
        .agg(stable_round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )
    return joined.orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc()).limit(10)


def top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window top-N: each customer's 3 highest-value orders.

    One hash shuffle on o_custkey; rank is fully deterministic
    (totalprice desc, orderkey asc tiebreak). ``row_number`` cast to
    bigint to match ANSI ROW_NUMBER()'s type.
    """
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", F.col("o_totalprice"), "rn")
    )


def supplier_nation_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two broadcast dim joins (nation, region) + aggregate on supplier."""
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        supplier.join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("supplier_cnt"),
            stable_round(F.sum("s_acctbal"), 2).alias("total_acctbal"),
        )
    )


def customers_without_big_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join: customers with no order above 300k total price.

    ``left_anti`` against a broadcast-able filtered build side — at scale
    the build side (big orders' custkeys) is small, so this stays a
    broadcast anti join rather than a shuffle.
    """
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    big = orders.filter(F.col("o_totalprice") > 300000).select("o_custkey").distinct()
    return customer.join(
        F.broadcast(big), customer.c_custkey == big.o_custkey, "left_anti"
    ).select("c_custkey", "c_mktsegment")


def customers_with_urgent_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join: customers having at least one 1-URGENT order."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return customer.join(
        urgent, customer.c_custkey == urgent.o_custkey, "left_semi"
    ).select("c_custkey")


def event_type_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set op: distinct users who clicked ∪ users who purchased."""
    events = load_table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select("user_id")
    purchases = events.filter(F.col("event_type") == "purchase").select("user_id")
    return clicks.union(purchases).distinct()


def distinct_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (= exact dedup on a key) — partial-agg then shuffle."""
    events = load_table(spark, sf_dir, "events")
    return events.select("event_type").distinct()


def hourly_window_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time tumbling-window aggregate — the batch twin of the
    Structured Streaming windowed aggregation (T4 extension; the
    reference has no event-time semantics at all, SURVEY §2.9).

    Buckets are computed with integer epoch arithmetic (``ts_ms div
    3_600_000``) rather than ``F.window`` so the result is independent
    of ``spark.sql.session.timeZone`` — mutating shared session config
    inside a query builder is not acceptable, and epoch-hour buckets are
    identical to UTC ``F.window`` buckets anyway. The streaming variant
    (:mod:`basenine_spark.streaming.windows`) uses real ``F.window`` +
    watermarks where the caller owns the session config."""
    events = load_table(spark, sf_dir, "events")
    window_start = (F.expr("ts_ms div 3600000") * F.lit(3_600_000)).alias(
        "window_start_ms"
    )
    return (
        events.groupBy(window_start, "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select("window_start_ms", "event_type", "cnt")
    )


def sessionize(spark: SparkSession, sf_dir: str, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization — the canonical stateful streaming
    operator (``applyInPandasWithState`` territory), expressed here in
    its exact batch form: a session breaks when a user is idle longer
    than the gap. Pure window functions (lag + running sum), one shuffle
    on user_id, fully deterministic integer arithmetic.

    NULL policy (mirrored in the DuckDB oracle): NULL
    ``user_id``/``ts_ms`` rows are dropped up front — a NULL user is
    not a sessionizable entity, a NULL timestamp has no position in
    the gap sequence, and the engines disagree on NULL
    grouping/ordering if they are kept (VERDICT r6 item 1).
    """
    events = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("ts_ms").isNotNull()
    )
    gap_ms = gap_minutes * 60_000
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    new_session = F.when(
        (F.col("ts_ms") - F.lag("ts_ms").over(w)) > gap_ms, 1
    ).otherwise(0)
    with_sid = events.withColumn(
        "session_no",
        F.sum(new_session).over(
            Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return with_sid.groupBy("user_id", "session_no").agg(
        F.min("ts_ms").alias("session_start_ms"),
        F.max("ts_ms").alias("session_end_ms"),
        F.count(F.lit(1)).alias("n_events"),
    )


def value_median_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated median per event type (``percentile`` is
    JVM-side exact; the approximate t-digest variant is
    ``approx_percentile`` for the 100 TB path)."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        stable_round(F.expr("percentile(value, 0.5)"), 4).alias("median_value"),
        F.count(F.lit(1)).alias("cnt"),
    )


def order_priority_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS (rollup) — subtotals per (status, priority), per
    status, and grand total, with grouping ids to disambiguate NULLs."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            stable_round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("status"),
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("priority"),
            "cnt",
            "total",
        )
    )


def daily_event_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time daily rollup over the events stream table (batch view
    of the streaming aggregation in :mod:`basenine_spark.streaming`).

    ``ts_ms`` is epoch millis (BFL's only time representation,
    SURVEY §1.2); day = floor(ms / 86_400_000) keeps everything in
    integer space — no timezone semantics to disagree on.
    """
    events = load_table(spark, sf_dir, "events")
    return (
        events.withColumn("day", F.expr("ts_ms div 86400000"))
        .groupBy("day", "event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            stable_round(F.sum("value"), 2).alias("total_value"),
        )
    )


def order_status_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY CUBE — all 2^2 grouping-set combinations of
    (status, priority) in one pass. Catalyst expands the cube into a
    single Expand + partial-agg + one shuffle (not four scans)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            stable_round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("status"),
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("priority"),
            "cnt",
            "total",
        )
    )


def segment_status_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: order value per market segment × order status, statuses
    spread into columns.

    The pivot values are declared explicitly — with an implicit pivot
    Spark first runs a distinct-scan job just to learn the column set,
    which is a full extra pass at 100 TB. customer is the broadcast
    dimension side; the pivot itself is a regular partial-agg shuffle
    keyed on the segment.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    joined = orders.join(
        F.broadcast(customer.select("c_custkey", "c_mktsegment")),
        orders.o_custkey == customer.c_custkey,
    )
    pivoted = (
        joined.groupBy("c_mktsegment")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(stable_round(F.sum("o_totalprice"), 2))
    )
    return pivoted.select(
        "c_mktsegment",
        F.col("F").alias("total_f"),
        F.col("O").alias("total_o"),
        F.col("P").alias("total_p"),
    )


# Irregular length bands for the interval join below. Deliberately NOT
# arithmetic-bucketable (unequal widths) so the operator demonstrates a
# genuine non-equi interval join, not bucketing in disguise.
LENGTH_BANDS: list[tuple[str, int, int]] = [
    ("xs", 0, 100),
    ("s", 100, 180),
    ("m", 180, 260),
    ("l", 260, 340),
    ("xl", 340, 460),
    ("xxl", 460, 1_000_000),
]


def doc_length_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval (band) join: documents → irregular length bands via
    ``lo <= n_chars < hi``.

    The band table is rows-of-constants and broadcast: Spark plans a
    BroadcastNestedLoopJoin, which for a <10-row build side is the
    *correct* physical strategy — each fact row tests a handful of
    predicates, no shuffle of the fact table at all. (For two large
    interval sides the scale pattern is overlap-bucketing both sides;
    here the dimension side is constant-sized by construction.)
    """
    docs = load_table(spark, sf_dir, "documents")
    bands = spark.createDataFrame(
        LENGTH_BANDS, ["band", "lo", "hi"]
    )
    return (
        docs.join(
            F.broadcast(bands),
            (F.col("n_chars") >= F.col("lo")) & (F.col("n_chars") < F.col("hi")),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            stable_round(F.avg("n_chars"), 3).alias("avg_chars"),
        )
    )


def approx_distinct_users(
    spark: SparkSession, sf_dir: str, rsd: float = 0.02
) -> DataFrame:
    """HyperLogLog++ distinct users per event type
    (``approx_count_distinct``).

    The sketch path for the 100 TB cardinality question: fixed-size HLL
    state merges in the partial-agg tree, so the shuffle carries one
    ~1.5/rsd² register block per (partition × group) instead of every
    distinct (type, user) pair. Approximate by design → rows-only
    driver check; the error bound vs the exact count is pinned in
    pytest (``tests/test_sketch_ops.py``).
    """
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd).alias("approx_users"),
        F.count(F.lit(1)).alias("cnt"),
    )


def approx_value_quantiles(
    spark: SparkSession, sf_dir: str, accuracy: int = 1000
) -> DataFrame:
    """Approximate p50/p95/p99 of ``value`` per event type
    (``percentile_approx``, a Greenwald-Khanna-family mergeable
    sketch).

    The scale path next to the exact ``agg_value_median`` entry: exact
    percentiles gather every value of a group on one reducer; the
    sketch keeps O(accuracy) state and merges map-side. Rows-only
    driver check; error vs the exact percentile is pinned in pytest.
    """
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        stable_round(F.expr(f"percentile_approx(value, 0.5, {accuracy})"), 4).alias("p50"),
        stable_round(F.expr(f"percentile_approx(value, 0.95, {accuracy})"), 4).alias("p95"),
        stable_round(F.expr(f"percentile_approx(value, 0.99, {accuracy})"), 4).alias("p99"),
    )


def salted_revenue_by_status(
    spark: SparkSession, sf_dir: str, salt_buckets: int = 8
) -> DataFrame:
    """Big-big join (lineitem ⋈ orders on orderkey) with explicit key
    salting, aggregated to revenue per order status.

    The skew-mitigation pattern for joins where NEITHER side broadcasts
    and a handful of keys dominate (null keys, default ids, a viral
    item): the fact side gets a deterministic salt in [0, B); the other
    side is replicated across all B salts; the join key becomes
    (key, salt), spreading each hot key's rows over B reducers. AQE's
    skew-join split (`spark.sql.adaptive.skewJoin`) is the first line
    of defense and handles moderate skew automatically — explicit
    salting is the declarative form for catastrophic single-key skew,
    and costs one B× replication of the smaller (but un-broadcastable)
    side.

    The salt is derived from a data column (`pmod(l_linenumber, B)`),
    not `rand()`, so the plan is deterministic and the driver oracle
    (a plain unsalted join) hash-matches exactly.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    fact = lineitem.withColumn(
        "salt", F.pmod(F.col("l_linenumber"), F.lit(salt_buckets))
    )
    replicated = orders.select(
        "o_orderkey",
        "o_orderstatus",
        F.explode(
            F.array(*[F.lit(i) for i in range(salt_buckets)])
        ).alias("salt"),
    )
    joined = fact.join(
        replicated,
        (fact["l_orderkey"] == replicated["o_orderkey"])
        & (fact["salt"] == replicated["salt"]),
    )
    return (
        joined.groupBy("o_orderstatus")
        .agg(
            stable_round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("o_orderstatus")
    )


def approx_heavy_hitters(
    spark: SparkSession, sf_dir: str, k: int = 5
) -> DataFrame:
    """Approximate top-k frequent users per event type via
    ``approx_top_k`` — the frequent-items sketch completing the trio
    next to HLL distinct and the GK quantile sketch.

    The sketch state is fixed-size and merges in the partial-agg tree,
    so the shuffle carries one sketch per (partition × group) instead
    of every (type, user) pair — the 100 TB heavy-hitters shape.
    Approximate by design → rows-only driver check; containment and
    count accuracy vs the exact top-k are pinned in pytest.
    """
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(F.expr(f"approx_top_k(user_id, {k})").alias("top"))
        .select(
            "event_type",
            F.posexplode("top").alias("rank", "entry"),
        )
        .select(
            "event_type",
            F.col("rank").cast("bigint").alias("rank"),
            F.col("entry.item").alias("user_id"),
            F.col("entry.count").alias("approx_cnt"),
        )
    )


def _top_k_counts(events: DataFrame, k: int, max_tracked: int | None = None) -> DataFrame:
    """Shared sketch-extraction pipeline for the heavy-hitters rows:
    per event_type ``approx_top_k`` → explode → (event_type, user_id,
    cnt). ``max_tracked`` is space-saving's CAPACITY (Spark default
    10,000) — the exactness knob; ``k`` only truncates the returned
    list. One definition so the verified and exact-regime twins can't
    drift from each other."""
    expr = (
        f"approx_top_k(user_id, {k})"
        if max_tracked is None
        else f"approx_top_k(user_id, {k}, {max_tracked})"
    )
    return (
        events.groupBy("event_type")
        .agg(F.expr(expr).alias("top"))
        .select("event_type", F.explode("top").alias("e"))
        .select(
            "event_type",
            F.col("e.item").alias("user_id"),
            F.col("e.count").cast("bigint").alias("cnt"),
        )
    )


def heavy_hitters_verified(
    spark: SparkSession, sf_dir: str, k: int = 5
) -> DataFrame:
    """Driver-verifiable twin of :func:`approx_heavy_hitters` — the
    ann_index_persisted pattern (parity aggregate, VERDICT r8 #3):
    the sketch's top-k itself is tie-ambiguous (equal counts at the
    k-boundary make the SET sketch-internal), so the raw rows can't
    hash-match a SQL oracle; what IS deterministic is that, under
    sketch capacity, (a) every reported count equals the exact count
    and (b) every reported user belongs to the ties-closed exact
    top-k (count >= the k-th-ranked count).  The entry emits one row
    per event type: data-derived ballast (boundary count, rows
    returned, ties-closed membership size) plus two violation
    counters the oracle expects at zero.

    NULL event types are excluded on BOTH sides (a Spark equi-join
    drops NULL keys where GROUP BY keeps them — the r6 nulls-fuzz
    class); NULL user ids never enter the sketch or the exact counts.
    """
    events = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("event_type").isNotNull()
    )
    sketch = _top_k_counts(events, k).withColumnRenamed(
        "cnt", "approx_cnt"
    )
    exact = events.groupBy("event_type", "user_id").agg(
        F.count("*").alias("cnt")
    )
    w = Window.partitionBy("event_type").orderBy(
        F.col("cnt").desc(), F.col("user_id").asc()
    )
    boundary = (
        exact.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .groupBy("event_type")
        .agg(
            F.min("cnt").cast("bigint").alias("boundary_cnt"),
            F.max("rn").cast("bigint").alias("k_returned"),
        )
    )
    at_or_above = (
        exact.join(F.broadcast(boundary), "event_type")
        .filter(F.col("cnt") >= F.col("boundary_cnt"))
        .groupBy("event_type")
        .agg(F.count("*").cast("bigint").alias("n_at_or_above"))
    )
    checks = (
        sketch.join(exact, ["event_type", "user_id"], "left")
        .join(F.broadcast(boundary.select("event_type", "boundary_cnt")), "event_type")
        .groupBy("event_type")
        .agg(
            F.sum(
                (
                    F.col("cnt").isNull()
                    | (F.col("approx_cnt") != F.col("cnt"))
                ).cast("bigint")
            ).alias("n_count_errors"),
            F.sum(
                (
                    F.coalesce(F.col("cnt"), F.lit(-1))
                    < F.col("boundary_cnt")
                ).cast("bigint")
            ).alias("n_outside_ties"),
        )
    )
    return (
        boundary.join(at_or_above, "event_type")
        .join(checks, "event_type")
        .select(
            "event_type",
            "boundary_cnt",
            "k_returned",
            "n_at_or_above",
            "n_count_errors",
            "n_outside_ties",
        )
        .orderBy("event_type")
    )


def heavy_hitters_full_capacity(
    spark: SparkSession, sf_dir: str, k: int = 4096
) -> DataFrame:
    """The frequent-items sketch in its EXACT REGIME (round 13, the
    md5-twin discipline applied to a sketch). Two knobs, two bounds —
    stated precisely because they differ: ``approx_top_k``'s THIRD
    parameter ``maxItemsTracked`` (passed explicitly as
    ``max(k, 10_000)``) is space-saving's CAPACITY — counts are exact
    for every key iff the per-group cardinality stays under IT; ``k``
    only truncates the RETURNED list — the output is the complete
    (group, key) multiset iff cardinality also stays under ``k``.
    Below ``min(k, maxItemsTracked)`` both hold, the output IS the
    exact GROUP BY, and a total-order SQL oracle exists for the whole
    sketch dataflow (per-partition build, partial-agg tree MERGE,
    serialization, final extract). ``heavy_hitters_verified`` keeps
    the under-capacity guarantees (counts exact, membership inside the
    ties-closed top-k) when cardinality exceeds ``k``.

    The plan is the production shape — one sketch per (partition ×
    group) through the shuffle, never the raw pairs — run where its
    answer is provably the GROUP BY. min(k, maxItemsTracked)=4096
    covers the ≤1,500 distinct users/type at sf0.1 with 2.7× headroom
    (pinned by ``test_entry_capacity_exceeds_corpus_cardinality``).
    The exactness boundary itself is empirically pinned at capacity,
    not merely under it: ``test_heavy_hitters_exactness_boundary_at_
    capacity`` shows the exact multiset survives a multi-partition
    merge at cardinality == maxItemsTracked == 4096 (zero headroom) —
    the hash-map-load-factor early purge ADVICE r13 warned about does
    not occur in Spark's implementation — while one key past capacity
    truncates the returned set to exactly ``capacity``.
    """
    events = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("event_type").isNotNull()
    )
    return _top_k_counts(events, k, max_tracked=max(k, 10_000))


def quantile_sketch_exact_regime(
    spark: SparkSession,
    sf_dir: str,
    qs: tuple = (0.1, 0.25, 0.5, 0.75, 0.9, 0.99),
) -> DataFrame:
    """The GK quantile sketch in its EXACT REGIME (round 13, the
    sibling of :func:`heavy_hitters_full_capacity`): with the
    ``accuracy`` knob at INT_MAX the epsilon bound is below 1/(2N)
    for any test corpus, so ``percentile_approx`` returns the exact
    discrete quantile element — DuckDB's ``quantile_disc`` is a
    total-order oracle for the whole sketch dataflow (per-partition
    build, partial-agg MERGE through the shuffle, final query).
    ``quantiles_verified`` keeps the under-accuracy rank-error
    contract; this pins the algebra by value.
    """
    events = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("event_type").isNotNull()
    )
    arr = ",".join(str(q) for q in qs)
    agg = events.groupBy("event_type").agg(
        F.expr(f"percentile_approx(value, array({arr}), 2147483647)").alias(
            "p"
        )
    )
    return agg.select(
        "event_type",
        *[
            F.col("p")[i].alias(f"q{int(q * 100)}")
            for i, q in enumerate(qs)
        ],
    )


def profile_table(
    spark: SparkSession, sf_dir: str, table: str = "orders", exact: bool = True
) -> DataFrame:
    """Per-column data profile — row count, nulls, distincts — the
    health check a pipeline runs before and after every stage (a column
    suddenly going 90% null is a data bug the funnel view can't see).

    One aggregation pass; ``stack`` unpivots the single stats row into
    one row per column. ``exact=True`` uses exact distinct counts (the
    DuckDB-verifiable form — Catalyst plans the multi-distinct via one
    Expand, an accepted profiling cost); ``exact=False`` swaps in
    HyperLogLog sketches whose state merges map-side — the 100 TB
    default where ±2% on a profile is free accuracy to give away.
    """
    df = load_table(spark, sf_dir, table)
    cols = df.columns
    d_fn = (
        F.count_distinct
        if exact
        else (lambda c: F.approx_count_distinct(c, 0.02))
    )
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("bigint")).alias(f"__nn_{c}"))
        aggs.append(d_fn(F.col(c)).alias(f"__nd_{c}"))
    stats = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __n, __nn_{c}, __nd_{c}" for c in cols
    )
    return stats.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(column_name, n_rows, n_nulls, n_distinct)"
        )
    )


def bucketed_revenue_join(
    spark: SparkSession, sf_dir: str, buckets: int = 8
) -> DataFrame:
    """Co-located big-big join via bucketed tables: both sides are
    written ``bucketBy(buckets, orderkey)`` + sorted, so the join
    consumes bucket files directly — NO Exchange under the
    SortMergeJoin (the plan assertion in
    ``tests/test_scale_patterns_ops.py`` is the point of this op).

    This is the third big-big join strategy next to AQE skew-split and
    explicit salting (:func:`salted_revenue_by_status`): pre-shuffle
    ONCE at write time, join shuffle-free forever after — the layout a
    100 TB fact/fact join amortizes into its ingest. Bucket pruning and
    sorted merges come free; the only remaining exchange is the final
    small aggregation.

    Tables are written into the session catalog with PER-PROCESS
    names (``bn_bkt_*_p<pid>``): a shared warehouse dir is the normal
    layout when several local sweeps run concurrently (two driver_sim
    fuzz sweeps, pytest next to a bench), and unsuffixed names made
    them race on the same managed-table location (the documented
    r10/r11 219/220 artifact). Per-pid names make concurrent writers
    disjoint by construction; within a process the write is an
    idempotent overwrite. Stale directories are GC'd first — only
    those whose owning pid is provably dead (``/proc/<pid>`` gone) or
    the legacy unsuffixed names, so a live concurrent sweep's tables
    are never touched (a managed-table location under ``bn_bkt_`` is
    owned by this op, never user data).
    """
    import os
    import re
    import shutil

    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    wh = spark.conf.get("spark.sql.warehouse.dir")
    if wh.startswith("file:"):
        wh = wh[len("file:"):]
    pid = os.getpid()
    t_orders = f"bn_bkt_orders_p{pid}"
    t_lineitem = f"bn_bkt_lineitem_p{pid}"
    if os.path.isdir(wh):
        for d in os.listdir(wh):
            if not d.startswith("bn_bkt_"):
                continue
            m = re.search(r"_p(\d+)$", d)
            owner = int(m.group(1)) if m else None
            dead = owner is None or (
                owner != pid
                and os.path.isdir("/proc")
                and not os.path.exists(f"/proc/{owner}")
            )
            if dead:
                spark.sql(f"DROP TABLE IF EXISTS {d}")
                shutil.rmtree(os.path.join(wh, d), ignore_errors=True)
    for t in (t_orders, t_lineitem):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(os.path.join(wh, t), ignore_errors=True)
    (
        orders.write.bucketBy(buckets, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable(t_orders)
    )
    (
        lineitem.write.bucketBy(buckets, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable(t_lineitem)
    )
    li = spark.table(t_lineitem).hint("merge")
    od = spark.table(t_orders).hint("merge")
    joined = li.join(od, li["l_orderkey"] == od["o_orderkey"])
    return (
        joined.groupBy("o_orderstatus")
        .agg(
            stable_round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("o_orderstatus")
    )


def profile_drift(
    spark: SparkSession,
    old_dir: str,
    new_dir: str,
    table: str = "documents",
    exact: bool = True,
) -> DataFrame:
    """Corpus drift detector: the per-column profile diff between two
    dataset versions — what a recurring release pipeline alerts on
    (null-rate jumps, distinct-cardinality collapse, silent row-count
    shifts are data bugs that no single-version profile can see).

    Built entirely from two :func:`profile_table` passes joined on the
    column name (a |columns|-row join — broadcast, trivially), emitting
    per-column deltas and ratios rounded for engine-stable comparison.
    At 100 TB each side is the same one-pass aggregate profile_table
    runs; the diff itself costs nothing.
    """
    old = profile_table(spark, old_dir, table, exact=exact)
    new = profile_table(spark, new_dir, table, exact=exact)
    o, n = old.alias("o"), new.alias("n")
    return (
        # full_outer so ADDED/REMOVED columns surface as rows with
        # one side null (broadcast is unsupported for full-outer
        # builds; a |columns|-row SMJ costs nothing)
        o.join(n, "column_name", "full_outer")
        .select(
            "column_name",
            F.col("o.n_rows").alias("rows_old"),
            F.col("n.n_rows").alias("rows_new"),
            # stable_round, not F.round: these ratios are DuckDB-oracle
            # compared by hash (promoted round 9), and the inputs are
            # exact integer counts so the quotients are bit-identical
            # across engines — the rounding must be too
            stable_round(
                F.col("n.n_rows") / F.col("o.n_rows").cast("double"), 4
            ).alias("rows_ratio"),
            stable_round(
                F.col("o.n_nulls") / F.col("o.n_rows").cast("double"), 6
            ).alias("null_rate_old"),
            stable_round(
                F.col("n.n_nulls") / F.col("n.n_rows").cast("double"), 6
            ).alias("null_rate_new"),
            stable_round(
                F.col("n.n_distinct") / F.col("o.n_distinct").cast("double"),
                4,
            ).alias("distinct_ratio"),
        )
        .orderBy("column_name")
    )


def equi_depth_histogram(
    spark: SparkSession,
    sf_dir: str,
    k: int = 10,
    table: str = "events",
    col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Exact equi-depth (equal-frequency) histogram of a numeric column
    — the statistic a cost-based optimizer stores per column and a
    skew diagnosis starts from (equal-WIDTH histograms hide heavy
    tails; equal-DEPTH buckets expose them as wide value ranges).

    Semantics are exactly ``ntile(k)`` over the global (value, id)
    order, but computed DISTRIBUTED — no whole-column single-partition
    sort. The global rank is assembled from a two-pass range shuffle:

    1. ``repartitionByRange`` on (value, id) puts disjoint, ordered
       value ranges in separate partitions;
    2. a window partitioned on ``spark_partition_id()`` sorts each
       range locally (hash exchange on pid — every task sorts only its
       own range);
    3. per-partition row counts (a P-row aggregate) turn into rank
       offsets via a cumulative window over those P rows — the only
       single-partition exchange left in the plan holds P ≈ one row
       per task, not the data;
    4. global_rank = offset + local row_number, folded to a bucket by
       integer ntile arithmetic (first N%k buckets take one extra row).

    Per-task state is O(|range|) — balanced by the range partitioner —
    so the plan survives a 100×  scale-up where the old unpartitioned
    ``ntile`` died in one task. The approximate twin remains
    :func:`approx_value_quantiles` (one map-side sketch pass, no
    shuffle) when sketch-error boundaries are acceptable.

    Output: (bucket 1..k, lo, hi, n_rows), values rounded to 4.
    """
    from pyspark.sql import Window

    df = load_table(spark, sf_dir, table).filter(F.col(col).isNotNull())
    num_parts = max(spark.sparkContext.defaultParallelism, 2)
    ranged = df.select(
        F.col(col).alias("v"), F.col(id_col).alias("tid")
    ).repartitionByRange(num_parts, F.col("v").asc(), F.col("tid").asc())
    # lazy localCheckpoint pins ONE materialized range partitioning that
    # both branches (ranks and counts) read: RangePartitioner samples
    # with an RDD-id-derived seed, so two physical executions of the
    # exchange could pick different bounds and make counts-per-pid
    # inconsistent with ranks-per-pid. Blocks are ContextCleaner-managed
    # (no session-lifetime cache accumulation).
    with_pid = ranged.withColumn(
        "pid", F.spark_partition_id()
    ).localCheckpoint(eager=False)
    w_local = Window.partitionBy("pid").orderBy(
        F.col("v").asc(), F.col("tid").asc()
    )
    local = with_pid.withColumn("rn", F.row_number().over(w_local).cast("bigint"))
    # counts branch hangs off with_pid (NOT local) so the second pass
    # over the data is a bare count-by-pid — map-side partial agg, no
    # second window sort
    counts = with_pid.groupBy("pid").agg(F.count(F.lit(1)).alias("cnt"))
    w_all = Window.orderBy("pid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_off = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "pid",
        F.coalesce(F.sum("cnt").over(w_off), F.lit(0)).alias("off"),
        F.sum("cnt").over(w_all).alias("n_total"),
    )
    r = F.col("off") + F.col("rn")
    q = F.floor(F.col("n_total") / k).cast("bigint")
    rem = (F.col("n_total") % k).cast("bigint")
    # exact integer ntile: rank r -> bucket (first `rem` buckets hold
    # q+1 rows, the rest q); ceil(a/b) as (a + b - 1) div b keeps the
    # arithmetic in bigints (q = 0, i.e. N < k, degenerates to bucket=r
    # exactly as ntile does)
    big = (q + 1) * rem
    bucket = F.when(r <= big, F.floor((r + q) / (q + 1))).otherwise(
        rem + F.floor((r - big + q - 1) / F.greatest(q, F.lit(1)))
    )
    return (
        local.join(F.broadcast(offsets), "pid")
        .select("v", bucket.cast("int").alias("bucket"))
        .groupBy("bucket")
        .agg(
            stable_round(F.min("v"), 4).alias("lo"),
            stable_round(F.max("v"), 4).alias("hi"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


def psi_drift(
    spark: SparkSession,
    ref_dir: str,
    cur_dir: str,
    k: int = 10,
    table: str = "events",
    col: str = "value",
) -> DataFrame:
    """Population Stability Index between two releases of a numeric
    column — THE model-monitoring drift metric: bucket boundaries come
    from the REFERENCE release's equi-depth quantiles, both releases
    are histogrammed against those fixed boundaries, and each bucket
    contributes ``(p_cur - p_ref) * ln(p_cur / p_ref)`` (PSI > 0.2 is
    the conventional "investigate" line).

    Plan: the k-1 boundaries are exact reference percentiles (one
    1-row aggregate) broadcast-cross-joined into both histogram
    passes, which bucket by counting smaller bounds inside the
    broadcast array (``1 + size(filter(bs, x -> v > x))`` — the exact
    formulation the DuckDB oracle uses), so BOTH passes stay map-only
    scans + one tiny bucket aggregate each, and the grand totals fold
    in the same way. ZERO driver actions in the whole derivation —
    the plan is a single lazy job (VERDICT r6 item 6; the previous
    form collected boundaries and totals to the driver between
    stages). Laplace-smoothed counts keep empty buckets finite,
    symmetrically on both sides.

    Output: (bucket 1..k, p_ref, p_cur, psi_term), rounded to 6.
    """
    probs = [i / k for i in range(1, k)]
    ref = load_table(spark, ref_dir, table).filter(F.col(col).isNotNull())
    cur = load_table(spark, cur_dir, table).filter(F.col(col).isNotNull())
    bounds = ref.agg(
        F.percentile(F.col(col), F.array(*[F.lit(p) for p in probs])).alias(
            "bs"
        )
    )

    def hist(df, name):
        bucket = F.lit(1) + F.size(
            F.filter(F.col("bs"), lambda x: F.col(col) > x)
        )
        return (
            df.crossJoin(F.broadcast(bounds))
            .select(bucket.alias("bucket"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias(name))
        )

    # the k-row histogram feeds both the totals branch and the output:
    # cache it so the two branches don't each re-derive it from full
    # table scans (same reasoning as gap_fill_hourly's aggregate cache)
    h = (
        hist(ref, "n_ref")
        .join(hist(cur, "n_cur"), "bucket", "full")
        .select(
            "bucket",
            F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
            F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
        )
        .cache()
    )
    tot = h.agg(F.sum("n_ref").alias("tr"), F.sum("n_cur").alias("tc"))
    p_ref = (F.col("n_ref") + 1) / (F.col("tr") + F.lit(k))
    p_cur = (F.col("n_cur") + 1) / (F.col("tc") + F.lit(k))
    return h.crossJoin(F.broadcast(tot)).select(
        "bucket",
        stable_round(p_ref, 6).alias("p_ref"),
        stable_round(p_cur, 6).alias("p_cur"),
        stable_round((p_cur - p_ref) * F.log(p_cur / p_ref), 6).alias(
            "psi_term"
        ),
    )


def skew_profile(
    spark: SparkSession,
    sf_dir: str,
    table: str = "events",
    key: str = "user_id",
    top_k: int = 10,
) -> DataFrame:
    """Join/aggregation skew diagnosis for a key column — the check you
    run BEFORE a big keyed shuffle to decide between a plain hash join,
    AQE skew splitting, and deterministic salting
    (:func:`salted_revenue_by_status`): the ``top_k`` heaviest keys
    with their share of all rows and their multiple of the mean key
    size.

    One partial-aggregated count + a TakeOrdered — diagnosing skew must
    itself be skew-proof (a count aggregate is; a
    ``collect_list``-style profile would not be). The grand
    total/mean fold in as a broadcast 1-row cross join, so the whole
    profile is ONE lazy plan with zero driver actions (VERDICT r6
    item 6). NULL keys are profiled too (labelled) — null-key pileups
    are the most common skew bomb in practice.

    Output: (key_value string, n_rows, share, x_mean), ordered
    heaviest-first; share/x_mean rounded to 6/2.
    """
    df = load_table(spark, sf_dir, table)
    # cached: the per-key counts feed both the 1-row stats aggregate
    # and the TakeOrdered — without the pin each branch re-scans the
    # fact table (the aggregate itself is |keys| rows, tiny)
    counts = (
        df.groupBy(
            F.coalesce(F.col(key).cast("string"), F.lit("<NULL>")).alias(
                "key_value"
            )
        )
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .cache()
    )
    stats = counts.agg(
        F.sum("n_rows").alias("total"), F.avg("n_rows").alias("mean_n")
    )
    # floor(x*10^k + 0.5)/10^k instead of round(): Spark's round() on
    # doubles goes through the shortest decimal repr (BigDecimal
    # HALF_UP on "1.035"), DuckDB rounds the binary value — they
    # disagree on repr-boundary values; floor of the shared binary
    # quotient is bit-identical on both engines
    share = F.col("n_rows") / F.col("total").cast("double")
    xmean = F.col("n_rows") / F.col("mean_n")
    return (
        counts.orderBy(F.col("n_rows").desc(), F.col("key_value").asc())
        .limit(top_k)
        .crossJoin(F.broadcast(stats))
        .select(
            "key_value",
            "n_rows",
            (F.floor(share * 1e6 + 0.5) / 1e6).alias("share"),
            (F.floor(xmean * 100 + 0.5) / 100).alias("x_mean"),
        )
    )


def quantiles_verified(
    spark: SparkSession, sf_dir: str, accuracy: int = 1000
) -> DataFrame:
    """Driver-verifiable twin of :func:`approx_value_quantiles` — the
    ann_index_persisted parity pattern: the sketch's values are
    approximate by design so the raw rows cannot hash-match a SQL
    oracle, but the Greenwald-Khanna rank CONTRACT is checkable
    exactly: ``percentile_approx(value, p, accuracy)`` must return a
    value whose rank is within ``n/accuracy`` rows of ``p*n``.  The
    entry emits, per event type, data-derived ballast the oracle
    recomputes (non-null count, tolerance) plus one violation counter
    per probed percentile, each deterministically zero.

    Scale shape: the sketch aggregate is one pass (mergeable GK state),
    the rank audit joins the tiny per-type sketch row back via
    broadcast and re-aggregates — two scans total, no full-data
    shuffle beyond the groupBys.  NULL event types are coalesced to a
    sentinel BEFORE grouping (join keys must never be NULL)."""
    events = load_table(spark, sf_dir, "events").select(
        F.coalesce(F.col("event_type"), F.lit("(null)")).alias("et"),
        "value",
    )
    ps = (0.5, 0.95, 0.99)
    sk = events.groupBy("et").agg(
        *[
            F.expr(f"percentile_approx(value, {p}, {accuracy})").alias(
                f"q{int(p * 100)}"
            )
            for p in ps
        ]
    )
    audited = events.join(F.broadcast(sk), "et")
    aggs = [F.count("value").alias("n_vals")]
    for p in ps:
        q = F.col(f"q{int(p * 100)}")
        aggs.append(
            F.coalesce(
                F.sum((F.col("value") < q).cast("bigint")), F.lit(0)
            ).alias(f"lt{int(p * 100)}")
        )
        aggs.append(
            F.coalesce(
                F.sum((F.col("value") <= q).cast("bigint")), F.lit(0)
            ).alias(f"le{int(p * 100)}")
        )
    ranks = audited.groupBy("et").agg(*aggs)
    # GK contract: rank error <= n/accuracy; +1 absorbs the floor/ceil
    # boundary on degenerate tiny groups (fuzz corpora plant n=1 types)
    tol = (
        F.ceil(F.col("n_vals") / F.lit(float(accuracy))).cast("bigint")
        + F.lit(1)
    )
    out_cols = [
        F.col("et").alias("event_type"),
        F.col("n_vals").cast("bigint").alias("n_vals"),
        tol.alias("tol_rows"),
    ]
    for p in ps:
        lo = F.floor(F.lit(p) * F.col("n_vals")).cast("bigint") - tol
        hi = F.ceil(F.lit(p) * F.col("n_vals")).cast("bigint") + tol
        out_cols.append(
            (
                (F.col(f"le{int(p * 100)}") < lo)
                | (F.col(f"lt{int(p * 100)}") > hi)
            )
            .cast("bigint")
            .alias(f"viol{int(p * 100)}")
        )
    return ranks.select(*out_cols).orderBy("event_type")


def hll_distinct_verified(
    spark: SparkSession, sf_dir: str, rsd: float = 0.02
) -> DataFrame:
    """Driver-verifiable twin of :func:`approx_distinct_users`: the
    HLL++ estimate itself is approximate, but its error CONTRACT is
    checkable against the exact distinct count in the same single
    groupBy (both aggregates are mergeable — one pass, one shuffle).
    ``n_violations`` flags |approx − exact| beyond a generous
    6·rsd·exact + 1 envelope and is deterministically zero (the sketch
    is deterministic given the data; at small cardinalities HLL++'s
    sparse mode is exact).  ``exact_users`` and ``cnt`` are the
    data-derived ballast the oracle recomputes."""
    events = load_table(spark, sf_dir, "events").select(
        F.coalesce(F.col("event_type"), F.lit("(null)")).alias("event_type"),
        "user_id",
    )
    agg = events.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd).alias("approx_users"),
        F.count_distinct(F.col("user_id")).alias("exact_users"),
        F.count(F.lit(1)).alias("cnt"),
    )
    envelope = (
        F.ceil(F.lit(6.0 * rsd) * F.col("exact_users")).cast("bigint")
        + F.lit(1)
    )
    return agg.select(
        "event_type",
        F.col("exact_users").cast("bigint").alias("exact_users"),
        F.col("cnt").cast("bigint").alias("cnt"),
        (
            F.abs(F.col("approx_users") - F.col("exact_users")) > envelope
        )
        .cast("bigint")
        .alias("n_violations"),
    ).orderBy("event_type")
