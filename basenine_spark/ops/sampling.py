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
from .util import stable_round


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


def mixture_sample(
    spark: SparkSession,
    sf_dir: str,
    weights: dict[str, float] | None = None,
    default_weight: float = 0.03125,
    budget: int = 200,
    salt: str = "mix",
) -> DataFrame:
    """Sample the documents table toward a target source *mixture*
    (the data-mixing step of a pretraining run: given per-source weights
    summing to ~1 and a document budget, keep ≈ ``budget * w_s``
    documents of source ``s``).

    Per-source rates are computed from actual counts —
    ``rate_s = min(1, budget * w_s / n_s)`` — in one tiny aggregation
    (one row per source) joined back via broadcast; selection is the
    same content-stable hash threshold as :func:`deterministic_sample`,
    so the realized sample is reproducible across runs and engines.
    When a source lacks mass the rate clamps to 1 (keep all) — the
    under-delivery is visible in the output counts rather than silently
    re-weighted, matching how production mixers surface shortfalls.

    Scale shape: one source-cardinality count aggregation runs first
    (columnar scan of `source` only) and its handful of rows come back
    to the driver, where the per-source thresholds fold into a literal
    CASE expression — so the fact scan itself is MAP-ONLY with zero
    joins (hash + string compare, pushdown-friendly).  This is the
    static-weight shape; the release funnel keeps the lazy
    broadcast-join variant because there the counts derive from the
    curated survivors, which collecting would compute twice.
    """
    docs = load_table(spark, sf_dir, "documents")
    n_by_source = {
        r["source"]: r["n_src"]
        for r in docs.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_src"))
        .collect()
    }
    return mixture_filter(
        docs, weights, default_weight, budget, salt, counts=n_by_source
    ).select("doc_id", "source")


def mixture_filter(
    df: DataFrame,
    weights: dict[str, float] | None,
    default_weight: float,
    budget: int,
    salt: str,
    counts: dict[str, int] | None = None,
) -> DataFrame:
    """The mixture-sampling core over an arbitrary (doc_id, source, …)
    frame — reused by :func:`mixture_sample` (raw documents) and the
    composed release pipeline (curated survivors).  Keeps all input
    columns of the sampled rows.

    With ``counts`` (per-source row counts known up front), the
    thresholds fold into a literal CASE expression and the plan is
    MAP-ONLY — no aggregation, no join; a source absent from
    ``counts`` gets a NULL threshold and is dropped (an explicit
    contract: the static path samples only sources it was sized for).
    Without ``counts``, the sizing aggregation and a broadcast join
    stay inside the (lazy) plan — the right shape when ``df`` is
    itself expensive (the curated-survivor funnel) and collecting
    counts would compute it twice.  Threshold arithmetic is the same
    IEEE double sequence either way (budget·w exact dyadic literal,
    one divide, one multiply, floor), so both paths and the SQL oracle
    pick identical rows."""
    # dyadic defaults: every target (budget * w) is an exact double, so
    # the only in-engine float math is division/multiply of identical
    # bit patterns — IEEE-deterministic across engines
    weights = weights or {"src0": 0.25, "src1": 0.125, "src2": 0.0625}
    if counts is not None:
        import math

        def _thr(source: str) -> str:
            rate = (
                float(budget) * weights.get(source, default_weight)
            ) / float(counts[source])
            if rate >= 1.0:
                return "g"
            return "%08x" % math.floor(rate * 4294967296.0)

        thr_lit = F.lit(None).cast("string")
        # a NULL source group can't match any equality predicate and
        # would keep the NULL threshold (dropped) — skip it rather than
        # crash sorted() on a None key; the oracle's CASE drops it the
        # same way
        for source in sorted(s for s in counts if s is not None):
            thr_lit = F.when(
                F.col("source") == source, F.lit(_thr(source))
            ).otherwise(thr_lit)
        return df.filter(_bucket(salt, F.col("doc_id")) < thr_lit)
    counts_df = df.groupBy("source").agg(F.count(F.lit(1)).alias("n_src"))
    # the per-source target (budget * w_s) is folded driver-side so both
    # engines divide the same double literal by n_src — identical IEEE
    # results, no cross-engine rounding drift
    target = F.lit(float(budget) * default_weight)
    for source, w in sorted(weights.items()):
        target = F.when(
            F.col("source") == source, F.lit(float(budget) * w)
        ).otherwise(target)
    rate = target / F.col("n_src")
    thr = F.when(rate >= 1.0, F.lit("g")).otherwise(
        F.format_string(
            "%08x", F.floor(rate * F.lit(4294967296.0)).cast("bigint")
        )
    )
    thresholds = counts_df.select("source", thr.alias("mix_thr"))
    return (
        df.join(F.broadcast(thresholds), "source")
        .filter(_bucket(salt, F.col("doc_id")) < F.col("mix_thr"))
        .drop("mix_thr")
    )


def quality_quantile_filter(
    spark: SparkSession,
    sf_dir: str,
    keep_frac: float = 0.5,
    approximate: bool = False,
) -> DataFrame:
    """Keep the best ``keep_frac`` of each source by quality rank — the
    quantile form of quality filtering (fixed thresholds drift as the
    corpus mix changes; "top X% per source" stays meaningful).

    Quality signal: stopword ratio ascending (the cheap junk-text
    signal from :func:`basenine_spark.ops.text.quality_score`), tie-broken by
    doc_id so ranks are total and engine-portable.  ``percent_rank``
    over a per-source window = one hash shuffle on ``source``; the rank
    state never leaves the executor.  This exact form is the
    oracle-checkable baseline.

    ``approximate=True`` is the 100 TB path for skewed sources: the
    per-source keep-threshold comes from a ``percentile_approx`` sketch
    (one partial-agg pass, source-cardinality-sized result broadcast
    back) and the filter is then MAP-ONLY — no per-source window sort,
    no rank state, at the cost of the sketch's rank error at the
    boundary (kept fraction ≈ keep_frac, not exact).
    """
    from pyspark.sql import Window

    from .text import STOPWORDS

    # Null/empty text scores as NULL q_ratio; Spark windows sort NULLs
    # FIRST (ranking contentless docs as best quality) while most SQL
    # engines sort them LAST — filter them out before scoring so the
    # semantics are engine-portable and contentless docs never win a
    # quality race.
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & (F.col("text") != "")
    )
    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    stop_cnt = F.expr(
        f"size(filter(split(text, ' '), x -> x IN ({stop_list})))"
    )
    n = F.size(F.split(F.col("text"), " "))
    ratio = stable_round(stop_cnt.cast("double") / n.cast("double"), 6)
    scored = docs.select("doc_id", "source", ratio.alias("q_ratio"))
    if approximate:
        thresholds = scored.groupBy("source").agg(
            F.expr(
                f"percentile_approx(q_ratio, {keep_frac}, 10000)"
            ).alias("q_cut")
        )
        return (
            scored.join(F.broadcast(thresholds), "source")
            .filter(F.col("q_ratio") <= F.col("q_cut"))
            .select("doc_id", "source", "q_ratio")
        )
    w = Window.partitionBy("source").orderBy(
        F.col("q_ratio").asc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("pr", F.percent_rank().over(w))
        .filter(F.col("pr") <= keep_frac)
        .select("doc_id", "source", "q_ratio")
    )


def token_mixture_sample(
    spark: SparkSession,
    sf_dir: str,
    weights: dict[str, float] | None = None,
    default_weight: float = 0.0625,
    token_budget: int = 20_000,
    salt: str = "tokmix",
) -> DataFrame:
    """Token-weighted mixture sampling: size each source's contribution
    by TOKENS, not documents — the unit training mixtures are actually
    specified in (a 10 % "web" share means 10 % of the tokens, and
    sources with long documents must contribute fewer of them).

    Mechanics mirror :func:`mixture_filter`: per-source token totals →
    keep-rate ``token_budget·w_s / tokens_s`` → content-stable md5
    threshold, so the expected token share matches the target while
    selection stays reproducible across engines and re-runs.  One
    16-group aggregate broadcast back; the document scan is map-only.
    """
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    docs = docs.select(
        "doc_id",
        "source",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_tokens"),
    )
    weights = weights or {"src0": 0.5, "src1": 0.25, "src2": 0.125}
    totals = docs.groupBy("source").agg(
        F.sum("n_tokens").alias("t_src")
    )
    target = F.lit(float(token_budget) * default_weight)
    for source, w in sorted(weights.items()):
        target = F.when(
            F.col("source") == source, F.lit(float(token_budget) * w)
        ).otherwise(target)
    rate = target / F.col("t_src").cast("double")
    thr = F.when(rate >= 1.0, F.lit("g")).otherwise(
        F.format_string(
            "%08x", F.floor(rate * F.lit(4294967296.0)).cast("bigint")
        )
    )
    thresholds = totals.select("source", thr.alias("mix_thr"))
    return (
        docs.join(F.broadcast(thresholds), "source")
        .filter(_bucket(salt, F.col("doc_id")) < F.col("mix_thr"))
        .drop("mix_thr")
        .select("doc_id", "source", "n_tokens")
    )


def source_cap(
    spark: SparkSession,
    sf_dir: str,
    cap: int = 50,
    salt: str = "cap",
    docs: DataFrame | None = None,
) -> DataFrame:
    """Per-source document cap — the domain-balancing guard a web-scale
    corpus needs so no single domain floods the mixture (the per-domain
    cap step of C4/RefinedWeb-style pipelines). Keeps exactly
    ``min(cap, |source|)`` documents per source, chosen by a
    content-stable hash rank (ties broken by doc_id), so the kept set
    is reproducible on any engine and stable under re-runs.

    Plan: one hash (map-only) + one window rank keyed on ``source`` —
    a single shuffle whose per-task sort is bounded by the source's own
    row count. At 100 TB with mega-domains, the refinement is a
    two-phase exact top-cap: pre-filter each source to ~2 x cap rows
    via a count-derived hash threshold (map-only after a broadcast
    count agg), rank only the survivors, and fall back per-source on
    the rare under-fill — same output, sort state O(cap) instead of
    O(|source|). The single-window form here IS the reference
    semantics the refinement must reproduce.

    Output: (doc_id, source, cap_rank), cap_rank in [1, cap].
    """
    from pyspark.sql import Window

    if docs is None:
        docs = load_table(spark, sf_dir, "documents")
    h = _bucket(salt, F.col("doc_id"))
    w = Window.partitionBy("source").orderBy(
        F.col("h").asc(), F.col("doc_id").asc()
    )
    return (
        docs.select("doc_id", "source", h.alias("h"))
        .withColumn("cap_rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("cap_rank") <= cap)
        .select("doc_id", "source", "cap_rank")
    )


def source_cap_twophase(
    spark: SparkSession,
    sf_dir: str,
    cap: int = 50,
    salt: str = "cap",
    margin: float = 4.0,
    docs: DataFrame | None = None,
) -> DataFrame:
    """The mega-domain-safe form of :func:`source_cap` — IDENTICAL
    output, O(margin x cap) window state per source instead of
    O(|source|).

    Because the ranking key is a uniform hash, the top-``cap`` rows of
    a source are exactly its ``cap`` smallest hashes, and the set
    ``{h < t}`` is downward-closed in the ranking order (ties break by
    doc_id but the filter is on the hash alone). So:

    1. count rows per source (one partial-aggregated shuffle, tiny
       result broadcast back);
    2. map-only pre-filter: keep ``h < t`` where ``t`` targets
       ``margin x cap`` expected survivors (sources smaller than
       ``margin x cap`` keep everything — exact by construction);
    3. rank only the survivors (window state ~``margin x cap``);
    4. detect under-fill — a source whose kept count fell short of
       ``min(cap, |source|)`` because the pre-filter was unlucky
       (probability ~exp(-Θ(margin)), i.e. rare at margin 4) — and
       re-rank JUST those sources without the pre-filter.

    The equality with the single-window form is pinned in pytest at an
    adversarial margin that forces the fallback path.
    """
    from pyspark.sql import Window

    if docs is None:
        docs = load_table(spark, sf_dir, "documents")
    # NULL-source safety (round-8 docs-fuzz catch): the single-window
    # form groups NULL sources into one window partition, but an
    # equi-JOIN on `source` never matches NULL — the two-phase joins
    # silently dropped every NULL-source document. All join/group keys
    # below therefore use `_sk`, a non-null surrogate (NULL → "\\x00",
    # a value no real source name contains); `source` itself passes
    # through to the output untouched.
    sk = F.coalesce(F.col("source").cast("string"), F.lit("\x00"))
    base = (
        docs.select("doc_id", "source")
        .withColumn("h", _bucket(salt, F.col("doc_id")))
        .withColumn("_sk", sk)
    )
    counts = base.groupBy("_sk").agg(F.count(F.lit(1)).alias("n_src"))
    want = float(margin) * cap
    thr = F.when(F.col("n_src") <= want, F.lit("g")).otherwise(
        F.format_string(
            "%08x",
            (F.lit(want) / F.col("n_src") * F.lit(4294967296.0)).cast(
                "bigint"
            ),
        )
    )
    with_thr = base.join(
        F.broadcast(counts.select("_sk", "n_src", thr.alias("thr"))),
        "_sk",
    )
    w = Window.partitionBy("_sk").orderBy(
        F.col("h").asc(), F.col("doc_id").asc()
    )
    kept = (
        with_thr.filter(F.col("h") < F.col("thr"))
        .withColumn("cap_rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("cap_rank") <= cap)
    )
    # shortfall detection anchors on `counts` (every source), not on
    # `kept`: a source whose pre-filter kept ZERO rows is absent from
    # kept entirely and must still trigger the exact re-rank — the
    # left join + coalesce(n_kept, 0) makes the zero-kept case visible
    shortfall = (
        counts.join(
            kept.groupBy("_sk").agg(F.count(F.lit(1)).alias("n_kept")),
            "_sk",
            "left",
        )
        .filter(
            F.coalesce(F.col("n_kept"), F.lit(0))
            < F.least(F.lit(cap), F.col("n_src"))
        )
        .select("_sk")
    )
    exact_refill = (
        base.join(F.broadcast(shortfall), "_sk", "left_semi")
        .withColumn("cap_rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("cap_rank") <= cap)
    )
    good = kept.join(F.broadcast(shortfall), "_sk", "left_anti")
    return good.select("doc_id", "source", "cap_rank").unionByName(
        exact_refill.select("doc_id", "source", "cap_rank")
    )


def split_assign(
    spark: SparkSession,
    sf_dir: str,
    ratios: dict[str, float] | None = None,
    salt: str = "split",
) -> DataFrame:
    """Content-stable train/validation/test split: every document gets
    exactly one split label from disjoint md5-bucket ranges — the
    release-time assignment that must be reproducible (any engine,
    any re-run), leak-proof (a document can never migrate between
    splits when the corpus grows), and exhaustive (labels partition
    the corpus).

    Cumulative thresholds are folded driver-side from the ratio dict
    (insertion order = precedence), so the plan is MAP-ONLY: one hash,
    one chained CASE, no shuffle anywhere.  The same two expressions in
    ANSI SQL reproduce the assignment bit-for-bit.
    """
    ratios = ratios or {"train": 0.9, "val": 0.05, "test": 0.05}
    import math

    bounds: list[tuple[str, str]] = []
    acc = 0.0
    for name, r in ratios.items():
        acc += r
        hi = (
            "g" * 8
            if acc >= 1.0
            else "%08x" % math.floor(acc * 4294967296.0)
        )
        bounds.append((name, hi))
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    bucket = _bucket(salt, F.col("doc_id"))
    label = F.lit(None).cast("string")
    for name, hi in reversed(bounds):
        label = F.when(bucket < F.lit(hi), F.lit(name)).otherwise(label)
    return docs.select("doc_id", "source", label.alias("split"))


def exact_n_sample(
    spark: SparkSession,
    sf_dir: str,
    n: int = 100,
    salt: str = "exn",
    docs: DataFrame | None = None,
) -> DataFrame:
    """Exactly-``n`` deterministic global sample: the ``n`` documents
    with the smallest content-stable hash (ties by doc_id) — the
    fixed-SIZE counterpart of the rate-based samplers (an eval set is
    "1000 documents", not "0.1%"). Reproducible on any engine; like
    any competitive selection, membership shifts as the corpus grows
    (the rate-based samplers are the growth-stable family).

    Plan: map-only hash + ``TakeOrderedAndProject`` (per-partition
    top-n heaps merged on the driver, n bounded) — no global sort, no
    full shuffle.

    Output: (doc_id, source, sample_rank 1..n).
    """
    from pyspark.sql import Window

    if docs is None:
        docs = load_table(spark, sf_dir, "documents")
    h = _bucket(salt, F.col("doc_id"))
    ranked = (
        docs.select("doc_id", "source", h.alias("h"))
        .orderBy(F.col("h").asc(), F.col("doc_id").asc())
        .limit(n)
    )
    w = Window.orderBy(F.col("h").asc(), F.col("doc_id").asc())
    return ranked.select(
        "doc_id",
        "source",
        F.row_number().over(w).cast("bigint").alias("sample_rank"),
    )


def exact_stratified_sample(
    spark: SparkSession,
    sf_dir: str,
    total_n: int = 100,
    salt: str = "strat",
    docs: DataFrame | None = None,
) -> DataFrame:
    """EXACTLY-``total_n`` stratified sample with largest-remainder
    apportionment: each source's quota is its proportional share of
    ``total_n``, floored, with the leftover seats handed to the largest
    fractional remainders (ties by source name) — the Hamilton method,
    the standard way to build a fixed-size eval set whose composition
    mirrors the corpus.  Rate-based stratified sampling
    (:func:`stratified_sample`) only hits the target IN EXPECTATION;
    eval sets need the count exact.

    Everything is INTEGER arithmetic (``(total_n * n_k) div/mod
    n_total``) so the apportionment is engine-stable bit-for-bit, and
    within each source the quota picks the smallest content-stable
    hashes (ties by doc_id) — reproducible on any engine, stable under
    re-runs.

    Plan: one tiny count aggregate (|sources| rows — the remainder
    window runs on that table, not the corpus), broadcast of the quota
    table, one source-keyed rank window over the corpus.  Same shuffle
    budget as :func:`source_cap`; the two-phase O(quota)-state
    refinement documented there applies verbatim for mega-sources.

    Requires ``total_n <= |corpus|``; per-source quotas are capped at
    the stratum size for safety.  Output: (doc_id, source, strat_rank),
    exactly ``total_n`` rows, strat_rank in [1, quota_source].
    """
    from pyspark.sql import Window

    if docs is None:
        docs = load_table(spark, sf_dir, "documents")
    base = docs.select("doc_id", "source")
    counts = base.groupBy("source").agg(F.count(F.lit(1)).alias("n_src"))
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    # integer apportionment over the |sources|-row table
    sized = counts.select(
        "source",
        "n_src",
        F.sum("n_src").over(w_all).alias("n_total"),
    ).select(
        "source",
        "n_src",
        # integer div/mod keep the apportionment bit-exact — a double
        # quotient could truncate 2.9999999999999996 to 2
        F.expr(f"({total_n} * n_src) div n_total").alias("floor_q"),
        F.expr(f"({total_n} * n_src) % n_total").alias("rem"),
    )
    w_rem = Window.orderBy(F.col("rem").desc(), F.col("source").asc())
    w_seats = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    quotas = sized.select(
        "source",
        "n_src",
        "floor_q",
        F.row_number().over(w_rem).alias("rem_rank"),
        (F.lit(total_n) - F.sum("floor_q").over(w_seats)).alias("seats"),
    ).select(
        "source",
        F.least(
            F.col("floor_q")
            + F.when(F.col("rem_rank") <= F.col("seats"), 1).otherwise(0),
            F.col("n_src"),
        ).alias("quota"),
    )
    h = _bucket(salt, F.col("doc_id"))
    w_rank = Window.partitionBy("source").orderBy(
        F.col("h").asc(), F.col("doc_id").asc()
    )
    return (
        base.select("doc_id", "source", h.alias("h"))
        .withColumn("strat_rank", F.row_number().over(w_rank).cast("bigint"))
        .join(F.broadcast(quotas), "source")
        .filter(F.col("strat_rank") <= F.col("quota"))
        .select("doc_id", "source", "strat_rank")
    )


def quality_percentile_by_source(
    spark: SparkSession,
    sf_dir: str,
) -> DataFrame:
    """Cross-source quality calibration: each document's quality signal
    (stopword ratio) re-expressed as its PERCENT RANK within its own
    source — the normalization that makes "top 30% of each source"
    mean the same thing for a clean wiki dump and a noisy crawl, where
    a single global threshold would keep almost everything from one
    and almost nothing from the other.

    One source-keyed window; ``percent_rank`` over (ratio, doc_id) is
    deterministic incl. ties, and the [0, 1] output is an exact
    (rank-1)/(n-1) rational — engine-stable without rounding tricks
    except the final display rounding.

    Output: (doc_id, source, stop_ratio, q_pct), q_pct rounded 6.
    """
    from pyspark.sql import Window

    from .text import quality_score

    q = quality_score(spark, sf_dir).filter(F.col("n_tokens") > 0)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    w = Window.partitionBy("source").orderBy(
        F.col("stop_ratio").asc(), F.col("doc_id").asc()
    )
    return (
        q.join(docs, "doc_id")
        .select(
            "doc_id",
            "source",
            "stop_ratio",
            stable_round(F.percent_rank().over(w), 6).alias("q_pct"),
        )
    )


def effective_token_mass(
    spark: SparkSession,
    sf_dir: str,
    docs: DataFrame | None = None,
) -> DataFrame:
    """Dedup-aware token accounting per source — the number mixture
    weights should actually target: raw token mass counts every copy
    of a duplicated document, so a dup-heavy source silently overstates
    its contribution and the sampled mixture under-delivers unique
    content.  EFFECTIVE mass counts only exact-dedup survivors
    (min-doc_id canonical per content hash, corpus-wide — a mirror
    duplicated across sources credits only the source holding the
    canonical copy, exactly how a dedup-then-sample pipeline behaves).

    Plan: one map-only (source, tokens, md5) derivation; the survivor
    set is the same (hash, min_id) partial-agg shuffle as
    ``exact_dedup``; one broadcast-friendly semi join back; one
    source-keyed rollup.  The efficiency ratio uses the engine-stable
    floor rounding.

    Output: (source, n_docs, tokens_raw, tokens_effective,
    efficiency = effective/raw, rounded to 6).
    """
    if docs is None:
        docs = load_table(spark, sf_dir, "documents")
    base = docs.filter(F.col("text").isNotNull()).select(
        "doc_id",
        "source",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_toks"),
        F.md5("text").alias("h"),
    )
    survivors = base.groupBy("h").agg(F.min("doc_id").alias("doc_id"))
    eff = base.join(survivors, ["h", "doc_id"], "left_semi")
    raw = base.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_toks").alias("tokens_raw"),
    )
    kept = eff.groupBy("source").agg(
        F.sum("n_toks").alias("tokens_effective")
    )
    return (
        raw.join(kept, "source", "left")
        .select(
            "source",
            "n_docs",
            "tokens_raw",
            F.coalesce("tokens_effective", F.lit(0)).alias(
                "tokens_effective"
            ),
            (
                F.floor(
                    F.coalesce("tokens_effective", F.lit(0))
                    / F.col("tokens_raw").cast("double")
                    * 1e6
                    + F.lit(0.5)
                )
                / 1e6
            ).alias("efficiency"),
        )
    )


def dsir_select(
    spark: SparkSession,
    sf_dir: str,
    target_lang: str = "fr",
    k: int = 200,
    alpha: float = 0.5,
    n_buckets: int | None = None,
) -> DataFrame:
    """DSIR-style data selection (Data Selection via Importance
    Resampling, Xie et al. 2023, arXiv:2302.03169): score every
    document in the raw pool by how target-like its token distribution
    is — the per-token mean log importance ratio under two smoothed
    unigram models, one fit on the target slice and one on the rest —
    then keep the top-k.  This is the standard "select pretraining
    data that looks like my target domain" primitive; here the target
    slice is ``lang == target_lang`` (any predicate works — the model
    only needs a boolean split of the corpus).

    weight(d) = (1/|d|) * sum_{w in d} [ ln p_t(w) - ln p_r(w) ],
    p(w) = (c(w) + alpha) / (T + alpha * V) with V the JOINT vocabulary
    (so the raw pool never sees an OOV token: every raw token is in V
    by construction).

    Shape (scale-first):
      * one explode → (token, is_target) partial-agg shuffle builds
        BOTH count tables in a single vocabulary-sized aggregate
        (conditional sums, not two passes);
      * T_t / T_r / V are one scalar reduction; the log-ratio table is
        vocabulary-sized and joins back onto the token stream (AQE
        broadcasts it when it fits);
      * scoring is one doc-keyed partial agg; the top-k is a
        TakeOrdered (per-partition heaps), never a global sort.

    **The hashed-feature form is the documented 100 TB default** —
    DSIR's own design hashes n-grams into a FIXED number of buckets so
    the model size is independent of vocabulary (a crawl-scale vocab
    does not fit an executor; 2^20 bucket counts always do).  Pass
    ``n_buckets`` to replace the token key with
    ``xxhash64(token) mod n_buckets``: the ratio table becomes a
    bounded broadcast and the scoring join goes map-only (collisions
    blur individual token ratios but preserve the distributional
    signal — the pytest gate pins >=80% top-k overlap vs the exact
    form at 2^16 buckets).  The exact form (``n_buckets=None``) is the
    oracle-verified baseline.

    Weights are floor-rounded to 4 decimals BEFORE ranking (both
    engines floor identically, so the rank/tie order is engine-stable;
    ties break by doc_id).  Output: (doc_id, source, lang,
    dsir_weight, n_tokens, rank) for the k selected pool documents.
    """
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    toks = docs.select(
        "doc_id",
        (F.col("lang") == target_lang).alias("is_t"),
        F.explode(F.split(F.col("text"), " ")).alias("token"),
    ).filter(F.col("token") != "")
    if n_buckets is not None:
        toks = toks.withColumn(
            "token",
            F.pmod(F.xxhash64("token"), F.lit(n_buckets)).cast("string"),
        )
    vocab = toks.groupBy("token").agg(
        F.sum(F.when(F.col("is_t"), 1).otherwise(0)).alias("ct"),
        F.sum(F.when(F.col("is_t"), 0).otherwise(1)).alias("cr"),
    )
    stats = vocab.agg(
        F.sum("ct").alias("tt"),
        F.sum("cr").alias("tr"),
        F.count(F.lit(1)).alias("v"),
    ).collect()[0]
    tt, tr, v = float(stats["tt"]), float(stats["tr"]), float(stats["v"])
    ratio = vocab.select(
        "token",
        (
            F.log((F.col("ct") + F.lit(alpha)) / F.lit(tt + alpha * v))
            - F.log((F.col("cr") + F.lit(alpha)) / F.lit(tr + alpha * v))
        ).alias("lw"),
    )
    if n_buckets is not None:
        ratio = F.broadcast(ratio)
    scored = (
        toks.filter(~F.col("is_t"))
        .join(ratio, "token")
        .groupBy("doc_id")
        .agg(
            (F.floor(F.avg("lw") * 1e4 + F.lit(0.5)) / 1e4).alias(
                "dsir_weight"
            ),
            F.count(F.lit(1)).alias("n_tokens"),
        )
    )
    w = Window.orderBy(F.col("dsir_weight").desc(), F.col("doc_id").asc())
    return (
        scored.join(docs.select("doc_id", "source", "lang"), "doc_id")
        .orderBy(F.col("dsir_weight").desc(), F.col("doc_id").asc())
        .limit(k)
        .select(
            "doc_id",
            "source",
            "lang",
            "dsir_weight",
            "n_tokens",
            F.row_number().over(w).cast("bigint").alias("rank"),
        )
    )


def select_token_budget(
    spark: SparkSession,
    sf_dir: str,
    budget: int = 10_000,
) -> DataFrame:
    """Greedy quality-first selection under a GLOBAL token budget — the
    fixed-compute data-selection primitive: training FLOPs buy a fixed
    number of tokens, so take documents in quality order until the
    budget is spent.  Prefix semantics (take while the running total
    fits; the first overflowing document and everything after it are
    dropped) — deterministic and engine-exact, unlike knapsack-skip
    variants whose tie handling is solver-dependent.

    Quality here is the repo's stopword-ratio signal (exact integer
    ratio, bit-identical across engines); order is (stop_ratio DESC,
    doc_id ASC).  Any score column slots in unchanged.

    The running total is a DISTRIBUTED prefix sum — the cumulative
    window never sees the corpus in one task (the naive
    ``sum().over(Window.orderBy(...))`` puts 100 TB through a single
    partition):

    1. ``repartitionByRange`` on the quality order puts disjoint,
       ordered score ranges in separate partitions (pinned once via
       lazy ``localCheckpoint`` — the range sampler is seeded per RDD,
       so both branches must read the SAME boundaries);
    2. each task prefix-sums only its own range (window partitioned on
       ``spark_partition_id()``);
    3. per-partition token totals (a P-row aggregate) become prefix
       offsets via a window over those P rows — the only
       single-partition exchange holds one row per task;
    4. global running total = offset + local prefix; keep rows with
       total ≤ budget.

    Output: (doc_id, stop_ratio, n_tokens, cum_tokens, sel_rank),
    the selected prefix in quality order.
    """
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    stop_list = ", ".join(f"'{s}'" for s in ("a", "the"))
    n = F.size(F.split(F.col("text"), " "))
    stop_cnt = F.expr(
        f"size(filter(split(text, ' '), x -> x IN ({stop_list})))"
    )
    scored = docs.select(
        "doc_id",
        stable_round(stop_cnt.cast("double") / n.cast("double"), 6).alias(
            "stop_ratio"
        ),
        n.cast("bigint").alias("n_tokens"),
    ).filter(F.col("n_tokens") > 0)
    num_parts = max(spark.sparkContext.defaultParallelism, 2)
    ranged = scored.repartitionByRange(
        num_parts, F.col("stop_ratio").desc(), F.col("doc_id").asc()
    )
    with_pid = ranged.withColumn(
        "pid", F.spark_partition_id()
    ).localCheckpoint(eager=False)
    w_local = (
        Window.partitionBy("pid")
        .orderBy(F.col("stop_ratio").desc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = with_pid.withColumn(
        "cum_local", F.sum("n_tokens").over(w_local)
    ).withColumn(
        "rn_local",
        F.row_number()
        .over(
            Window.partitionBy("pid").orderBy(
                F.col("stop_ratio").desc(), F.col("doc_id").asc()
            )
        )
        .cast("bigint"),
    )
    sums = with_pid.groupBy("pid").agg(
        F.sum("n_tokens").alias("toks"), F.count(F.lit(1)).alias("cnt")
    )
    w_off = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = sums.select(
        "pid",
        F.coalesce(F.sum("toks").over(w_off), F.lit(0)).alias("tok_off"),
        F.coalesce(F.sum("cnt").over(w_off), F.lit(0)).alias("rn_off"),
    )
    return (
        local.join(F.broadcast(offsets), "pid")
        .select(
            "doc_id",
            "stop_ratio",
            "n_tokens",
            (F.col("tok_off") + F.col("cum_local")).alias("cum_tokens"),
            (F.col("rn_off") + F.col("rn_local")).alias("sel_rank"),
        )
        .filter(F.col("cum_tokens") <= budget)
    )


def temperature_mixture(
    spark: SparkSession,
    sf_dir: str,
    alpha: float = 0.3,
    budget: int = 10_000,
) -> DataFrame:
    """Temperature-based mixture reweighting (the multilingual sampling
    scheme of XLM-R / mT5: raise each source's mass share to
    ``alpha`` < 1 and renormalize) — flattens the head and boosts the
    tail so low-resource sources are not drowned, without hand-tuned
    per-source weights.  ``alpha=1`` reproduces proportional sampling;
    ``alpha=0`` is uniform.

    For each source: raw token mass, raw share ``p_s``, tempered
    weight ``w_s = p_s^alpha / sum p_t^alpha``, the token allocation
    ``floor(budget * w_s)``, and the implied per-source sampling rate
    ``min(1, alloc / mass)`` — the number that feeds straight into
    :func:`stratified_sample` / :func:`token_mixture_sample` as the
    per-source rate (rate > 1 would mean the source must repeat —
    surfaced as rate 1.0 plus the allocation so the caller sees the
    epoch multiplier).

    Shape: one map-only token-count scan + one |S|-row source
    aggregate; the normalizing sum rides a 1-row broadcast join back
    (zero driver actions).  All ratios use the engine-stable floor
    rounding.  Output ordered by source.
    """
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    mass = docs.select(
        "source",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_toks"),
    ).groupBy("source").agg(F.sum("n_toks").alias("mass"))
    totals = mass.agg(
        F.sum("mass").alias("total_mass"),
        F.sum(F.pow(F.col("mass").cast("double"), F.lit(alpha))).alias(
            "z"
        ),
    )
    p = F.col("mass").cast("double") / F.col("total_mass")
    w = F.pow(F.col("mass").cast("double"), F.lit(alpha)) / F.col("z")
    alloc = F.floor(F.lit(float(budget)) * w).cast("bigint")
    return (
        mass.join(F.broadcast(totals))
        .select(
            "source",
            "mass",
            (F.floor(p * 1e6 + F.lit(0.5)) / 1e6).alias("p_raw"),
            (F.floor(w * 1e6 + F.lit(0.5)) / 1e6).alias("w_temp"),
            alloc.alias("alloc_tokens"),
            F.least(
                F.lit(1.0),
                F.floor(
                    alloc / F.col("mass").cast("double") * 1e6 + F.lit(0.5)
                )
                / 1e6,
            ).alias("sample_rate"),
        )
        .orderBy("source")
    )


def leakage_safe_splits(
    spark: SparkSession,
    sf_dir: str,
    ratios: dict[str, float] | None = None,
    n: int = 3,
    threshold: float = 0.4,
    salt: str = "lsplit",
) -> DataFrame:
    """Leakage-safe train/validation/test assignment: split by
    NEAR-DUP CLUSTER, not by document.  A per-document split
    (:func:`split_assign`) lets two near-duplicates straddle train and
    test — the classic eval-contamination leak (Lee et al. 2022
    measure the inflation this causes); assigning every member of a
    near-dup component the SAME split closes it by construction.

    Composition of two already-verified pieces: the exact n-gram
    Jaccard cluster labels (PPJoin pairs → min-label connected
    components, :func:`..ops.dedup.duplicate_clusters`) and the
    content-stable md5-threshold assignment of :func:`split_assign`,
    keyed on the CLUSTER label (singletons key on their own doc_id —
    identical semantics, a singleton is its own component).

    Shape: the cluster stage is the PPJoin + label-propagation plan
    (gram-keyed, never all-pairs); the assignment is one left join
    (cluster side is the clustered subset — small; AQE broadcasts it)
    plus a map-only hash CASE.  At crawl scale swap
    ``duplicate_clusters_lsh`` in for the exact pair stage — the
    assignment side is unchanged.

    Output: (doc_id, source, cluster_id, split) for every document;
    docs sharing a component share the split, bit-for-bit
    reproducible on any engine.
    """
    import math

    from .dedup import duplicate_clusters

    ratios = ratios or {"train": 0.9, "val": 0.05, "test": 0.05}
    bounds: list[tuple[str, str]] = []
    acc = 0.0
    for name, r in ratios.items():
        acc += r
        hi = (
            "g" * 8
            if acc >= 1.0
            else "%08x" % math.floor(acc * 4294967296.0)
        )
        bounds.append((name, hi))
    clusters = duplicate_clusters(spark, sf_dir, n=n, threshold=threshold)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    labeled = docs.join(clusters, "doc_id", "left").select(
        "doc_id",
        "source",
        F.coalesce("cluster_id", "doc_id").alias("cluster_id"),
    )
    bucket = _bucket(salt, F.col("cluster_id"))
    label = F.lit(None).cast("string")
    for name, hi in reversed(bounds):
        label = F.when(bucket < F.lit(hi), F.lit(name)).otherwise(label)
    return labeled.select(
        "doc_id", "source", "cluster_id", label.alias("split")
    )


def weighted_sample(
    spark: SparkSession,
    sf_dir: str,
    k: int = 100,
    salt: str = "wres",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, content-stable
    (Efraimidis & Spirakis 2006, the exponential-clocks formulation):
    each document draws a deterministic uniform u from its hash and
    enters the race with key ``-ln(u) / w`` — the k SMALLEST keys win,
    and inclusion probability is proportional to the weight ``w``
    (token count here: sampling documents proportional to their token
    mass is how a token-weighted eval slice or a mixture audit draws).
    Unlike rate-threshold samplers the output size is EXACTLY k, and
    unlike ``exact_n_sample`` the draw is weighted.

    Determinism/portability: u = (hex64(md5(salt||doc_id)[:8]) + 0.5)
    / 2^32 — both engines parse the same 8 hex chars to the same
    integer, so u, the key, and therefore the selected set are
    bit-for-bit reproducible anywhere; keys are floor-rounded to 10
    decimals BEFORE ranking so the rank order is engine-stable (ties
    break by doc_id).

    Shape: map-only key derivation (one hash + one log per row), then
    a TakeOrdered top-k (per-partition heaps) — no global sort, no
    shuffle beyond the k-row gather.  At 100 TB this is the cheapest
    possible exact-size weighted draw: one scan, k rows moved.

    Output: (doc_id, source, n_tokens, key, draw_rank).
    """
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    sized = docs.select(
        "doc_id",
        "source",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_tokens"),
    ).filter(F.col("n_tokens") > 0)
    hexv = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.col("doc_id").cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    u = (hexv.cast("double") + F.lit(0.5)) / F.lit(4294967296.0)
    key = (
        F.floor(-F.log(u) / F.col("n_tokens").cast("double") * 1e10 + F.lit(0.5))
        / 1e10
    )
    w = Window.orderBy(F.col("key").asc(), F.col("doc_id").asc())
    return (
        sized.withColumn("key", key)
        .orderBy(F.col("key").asc(), F.col("doc_id").asc())
        .limit(k)
        .withColumn("draw_rank", F.row_number().over(w).cast("bigint"))
    )
