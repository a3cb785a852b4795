"""Text-analysis operators for training-data pipelines.

All hot-path expressions are built-in ``pyspark.sql.functions`` (JVM-side,
whole-stage codegen) — no Python UDFs anywhere in this module. Documents
are the driver's ``documents`` table (doc_id, text, lang, source,
n_chars).

Scale notes: every operator is a map-only projection or a partial-agg
groupBy — no shuffle except the final aggregate; nothing collects to the
driver.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf resolves stringified hints
                     # (PEP 563 is active in this file) via module globals

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .util import release_checkpoint, stable_round

# tiny built-in stopword list used by the quality heuristics (kept short
# so the SQL oracle twin stays readable; swap for a real list in prod)
STOPWORDS = ("a", "the")


def tokens(col: Column) -> Column:
    """Whitespace tokenization (the corpus is space-joined words)."""
    return F.split(col, " ")


def token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token counts: total, unique. Int counts cast to
    bigint to match ANSI ``len()``'s type."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    return docs.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_unique"),
    )


def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length / stopword-ratio quality signals.

    ``stop_ratio`` = stopword tokens / total tokens — the classic cheap
    junk-text signal. The ratio divides two exact integers, so the
    double is bit-identical across engines; the display rounding uses
    the engine-stable floor idiom (exact half-way doubles like 1/128
    round differently under Spark round() vs DuckDB round()).
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    stop_cnt = F.expr(f"size(filter(split(text, ' '), x -> x IN ({stop_list})))")
    n = F.size(toks)
    return docs.select(
        "doc_id",
        n.cast("bigint").alias("n_tokens"),
        stop_cnt.cast("bigint").alias("stop_cnt"),
        stable_round(stop_cnt.cast("double") / n.cast("double"), 6).alias(
            "stop_ratio"
        ),
        F.col("n_chars").alias("n_chars"),
    )


def fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic document fingerprint: md5 over the normalized
    (lowercased, whitespace-collapsed) text. Join-able dedup key."""
    docs = load_table(spark, sf_dir, "documents")
    normalized = F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")
    return docs.select("doc_id", F.md5(normalized).alias("fp"))


def winnow_fingerprints(
    spark: SparkSession, sf_dir: str, k: int = 3, w: int = 4
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
    SIGMOD'03 — the rolling-hash fingerprint scheme): hash every word
    ``k``-gram, slide a window of ``w`` consecutive gram hashes, keep
    the minimum of each window, emit the distinct minima as the
    document's fingerprint set. Two documents sharing any sufficiently
    long run share fingerprints — the join key for plagiarism-style
    overlap detection at corpus scale.

    Hashes are md5 hex strings (lexicographic min), identical across
    engines. All JVM-side: transform/slice/array_min higher-order
    functions, one generated column, no shuffle until the consumer joins
    on ``fp``.
    """
    docs = load_table(spark, sf_dir, "documents")
    gram = ", ".join(f"element_at(toks, win + o + {j})" for j in range(k))
    expr = f"""
    array_distinct(CASE WHEN size(toks) >= {k + w - 1} THEN
      transform(
        sequence(1, size(toks) - {k + w - 2}),
        win -> array_min(transform(sequence(0, {w - 1}),
                 o -> md5(concat_ws(' ', {gram}))))
      )
    ELSE array() END)
    """
    return (
        docs.select("doc_id", F.split(F.col("text"), " ").alias("toks"))
        .select("doc_id", F.expr(expr).alias("fps"))
        .select("doc_id", F.explode("fps").alias("fp"))
    )


def lang_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus language distribution with average length."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("doc_cnt"),
        stable_round(F.avg("n_chars"), 2).alias("avg_chars"),
    )


def langid_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-token language-ID heuristic (plumbing for a real n-gram
    model): score = count of per-language marker tokens; argmax wins,
    'unk' when no marker hits. Deterministic, expressible in ANSI SQL,
    and entirely JVM-side in Spark.
    """
    docs = load_table(spark, sf_dir, "documents")
    en = F.expr("size(filter(split(text, ' '), x -> x IN ('the', 'a', 'of')))")
    data = F.expr("size(filter(split(text, ' '), x -> x IN ('table', 'row', 'column')))")
    pred = (
        F.when((en >= data) & (en > 0), F.lit("en"))
        .when(data > 0, F.lit("data"))
        .otherwise(F.lit("unk"))
    )
    return docs.select("doc_id", pred.alias("pred_lang"))


BPEISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def regex_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token counting: alpha runs, digit runs, and single
    punctuation marks each count as one token (the cheap stand-in for a
    real BPE vocab; plug a tokenizer UDF in for exact counts)."""
    docs = load_table(spark, sf_dir, "documents")
    # pattern passed as a Column literal — F.expr would run the SQL
    # string-escape pass and corrupt the \s class
    toks = F.regexp_extract_all(F.col("text"), F.lit(BPEISH_PATTERN), F.lit(0))
    return docs.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_bpeish"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_bpeish_unique"),
    )


def token_count_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level token accounting per source — the "how many tokens
    does this source contribute" question every training pipeline asks."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.sum(F.size(tokens(F.col("text"))).cast("bigint")).alias("total_tokens"),
        F.count(F.lit(1)).alias("doc_cnt"),
    )


def _gram_expr(n: int) -> str:
    """SQL expression producing the order-preserving (non-distinct)
    word-``n``-gram list of a ``toks`` array column — repeats kept, so
    downstream counts measure repetition."""
    gram = ", ".join(f"element_at(toks, i + {j})" for j in range(n))
    return (
        "CASE WHEN size(toks) >= {n} THEN "
        "transform(sequence(1, size(toks) - {nm1}), i -> concat_ws(' ', {gram})) "
        "ELSE array() END"
    ).format(n=n, nm1=n - 1, gram=gram)


def repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style within-document repetition signals over word
    bigrams: ``top_ratio`` = occurrences of the most frequent bigram /
    total bigrams, ``dup_ratio`` = fraction of bigram instances that
    are repeats of an earlier one.  High values flag boilerplate /
    looping text that a training pipeline drops.

    Scale shape: explode + two keyed aggregations, both with map-side
    partial agg; the (doc_id, bigram) shuffle is the only wide stage
    and is keyed fine-grained enough to never skew.  Documents with
    fewer than two tokens have no bigrams and drop out (same semantics
    both engines).
    """
    docs = load_table(spark, sf_dir, "documents")
    bg = docs.select(
        "doc_id", tokens(F.col("text")).alias("toks")
    ).select("doc_id", F.explode(F.expr(_gram_expr(2))).alias("bg"))
    cnt = bg.groupBy("doc_id", "bg").agg(F.count(F.lit(1)).alias("cnt"))
    total = F.sum("cnt").cast("double")
    return cnt.groupBy("doc_id").agg(
        F.max("cnt").cast("bigint").alias("top_cnt"),
        F.sum("cnt").cast("bigint").alias("n_bigrams"),
        stable_round(F.max("cnt").cast("double") / total, 6).alias("top_ratio"),
        stable_round(
            F.lit(1.0) - F.count(F.lit(1)).cast("double") / total, 6
        ).alias("dup_ratio"),
    )


# (label, RE2-safe pattern, replacement) applied in order; replacements
# contain no digits/@ so later patterns never re-match scrubbed spans
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("number", r"\d+", "<NUM>"),
)


def pii_scrub(df: DataFrame, col: str, id_col: str) -> DataFrame:
    """Deterministic PII scrubbing: per-pattern match counts plus the
    scrubbed text.  Patterns apply sequentially (counts taken on the
    partially-scrubbed text so a span is attributed to exactly one
    pattern).  Map-only projection, JVM regex, no shuffle — at 100 TB
    this is a pure scan-transform-write pass.
    """
    cur = F.col(col)
    out = []
    for label, pat, repl in PII_PATTERNS:
        out.append(
            F.regexp_count(cur, F.lit(pat)).cast("bigint").alias(f"n_{label}")
        )
        cur = F.regexp_replace(cur, F.lit(pat), F.lit(repl))
    return df.select(F.col(id_col), *out, cur.alias("scrubbed"))


def pii_scrub_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub over the events ``props`` payload (the only column in
    the driver testdata with digit runs to hit)."""
    events = load_table(spark, sf_dir, "events")
    return pii_scrub(events, "props", "event_id")


def contamination(
    spark: SparkSession,
    sf_dir: str,
    benchmark_source: str = "src0",
    n: int = 3,
) -> DataFrame:
    """Benchmark-contamination check: for every document outside the
    benchmark set (``source == benchmark_source`` stands in for an eval
    suite), the fraction of its distinct word-``n``-grams that appear
    anywhere in the benchmark set.  The decontamination primitive every
    training pipeline runs before shipping data.

    Scale shape: the benchmark n-gram universe is tiny relative to the
    corpus, so it is broadcast — the corpus side never shuffles; the
    per-doc aggregate is keyed on doc_id with map-side combine.
    """
    from .dedup import _shingle_expr

    docs = load_table(spark, sf_dir, "documents")
    grams = docs.select(
        "doc_id", "source", tokens(F.col("text")).alias("toks")
    ).select("doc_id", "source", F.explode(F.expr(_shingle_expr(n))).alias("g"))
    bench = (
        grams.filter(F.col("source") == benchmark_source)
        .select("g")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    rest = grams.filter(F.col("source") != benchmark_source)
    joined = rest.join(F.broadcast(bench), "g", "left")
    n_overlap = F.coalesce(F.sum("hit"), F.lit(0)).cast("bigint")
    return joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_grams"),
        n_overlap.alias("n_overlap"),
        stable_round(
            n_overlap.cast("double") / F.count(F.lit(1)).cast("double"), 6
        ).alias("contamination"),
    )


def quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/Gopher-style boolean quality rules, one column per rule plus
    the conjunction — the rule-bundle form of quality filtering (each
    rule cheap, JVM-only, auditable separately in the funnel).

    Rules (all map-only expressions over the scanned text):
    ``ok_len``       30 ≤ whitespace tokens ≤ 1000 (Gopher doc-length);
    ``ok_word_len``  3 ≤ mean token length ≤ 12 (Gopher);
    ``ok_symbol``    < 10% of characters are '#' or '…' -ish symbols
                     (C4 symbol-to-word screen, simplified to a
                     portable character class);
    ``ok_upper``     < 30% of alpha characters are uppercase
                     (shouting/boilerplate screen).
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n_tokens = F.size(toks)
    mean_word = F.octet_length(F.regexp_replace("text", " ", "")) / n_tokens
    n_chars = F.octet_length("text")
    n_symbols = n_chars - F.octet_length(
        F.regexp_replace("text", r"[#*=_~|>{}\[\]]", "")
    )
    n_alpha = n_chars - F.octet_length(F.regexp_replace("text", r"[A-Za-z]", ""))
    n_upper = n_chars - F.octet_length(F.regexp_replace("text", r"[A-Z]", ""))
    ok_len = (n_tokens >= 30) & (n_tokens <= 1000)
    ok_word_len = (mean_word >= 3.0) & (mean_word <= 12.0)
    ok_symbol = n_symbols.cast("double") < 0.1 * n_chars.cast("double")
    ok_upper = (n_alpha == 0) | (
        n_upper.cast("double") < 0.3 * n_alpha.cast("double")
    )
    return docs.select(
        "doc_id",
        ok_len.alias("ok_len"),
        ok_word_len.alias("ok_word_len"),
        ok_symbol.alias("ok_symbol"),
        ok_upper.alias("ok_upper"),
        (ok_len & ok_word_len & ok_symbol & ok_upper).alias("ok_all"),
    )


def vocab_topk(spark: SparkSession, sf_dir: str, k: int = 100) -> DataFrame:
    """Corpus vocabulary: the ``k`` most frequent whitespace tokens with
    counts and ranks — the seed step of tokenizer/vocab training and
    the quick drift check between corpus versions.

    Shape: explode → hash-agg (map-side partial on (token) carries one
    row per distinct token per partition) → global top-k via
    ``orderBy().limit()`` (TakeOrdered: per-partition heaps + driver
    merge of k rows, never a full sort). Ties rank deterministically by
    token string, so the output is engine-stable.
    """
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # the global window runs AFTER limit(k): k rows on one task, not a
    # corpus-wide single-partition sort
    w = Window.orderBy(F.col("cnt").desc(), F.col("token").asc())
    return (
        counts.orderBy(F.col("cnt").desc(), F.col("token").asc())
        .limit(k)
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
    )


BM25_QUERY_TERMS = ("spark", "hash", "window", "sort")
BM25_K1 = 1.2
BM25_B = 0.75


def bm25_topk(
    spark: SparkSession,
    sf_dir: str,
    terms: tuple = BM25_QUERY_TERMS,
    k: int = 50,
) -> DataFrame:
    """BM25 relevance ranking of the corpus against a fixed term set —
    the retrieval/quality-weighting primitive of a training-data
    pipeline (e.g. select documents relevant to a target domain before
    mixing).  Okapi BM25 with the standard smoothed idf
    ``ln(1 + (N - df + 0.5)/(df + 0.5))``.

    Shape (scale-first):
      * one explode → filter-to-query-terms **before** the aggregate, so
        the shuffle carries only (doc_id, term) pairs for the |Q| query
        terms, never the full token stream;
      * per-term document frequencies and corpus stats (N, avgdl) are
        tiny aggregates collected to scalars/a |Q|-row broadcast — the
        corpus is scanned twice (tf pass + doclen pass) but shuffled
        only on the filtered pairs;
      * scores are rounded **before** ranking (same determinism contract
        as ``ann_topk``: two engines agree on the rounded value, so the
        rank/tie order is engine-stable — ties break by doc_id).

    At 100 TB: the tf aggregate is the only corpus-sized shuffle and it
    is pre-filtered to query terms (|shuffle| ≈ docs × |Q| hit rate);
    df/avgdl are scalar reductions; the final top-k is a TakeOrdered
    (per-partition heaps), not a global sort.
    """
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    term_lit = list(terms)
    # per-doc length (in whitespace tokens) + corpus scalars
    lens = docs.select(
        F.col("doc_id"),
        F.size(F.split(F.col("text"), " ")).alias("dl"),
    )
    n_avg = lens.agg(
        F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    n_docs, avgdl = int(n_avg["n"]), float(n_avg["avgdl"])
    # tf: explode, keep only query terms (the filter reaches the
    # generator output before the shuffle), count per (doc, term)
    tf = (
        docs.select(
            "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
        )
        .filter(F.col("term").isin(term_lit))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # document frequency per term: |Q| rows — broadcast back
    df_stats = tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("df")
    )
    idf = df_stats.select(
        "term",
        F.log(
            F.lit(1.0)
            + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
            / (F.col("df") + F.lit(0.5))
        ).alias("idf"),
    )
    scored = (
        tf.join(F.broadcast(idf), "term")
        .join(lens, "doc_id")
        .select(
            "doc_id",
            (
                F.col("idf")
                * (F.col("tf") * F.lit(BM25_K1 + 1.0))
                / (
                    F.col("tf")
                    + F.lit(BM25_K1)
                    * (
                        F.lit(1.0 - BM25_B)
                        + F.lit(BM25_B) * F.col("dl") / F.lit(avgdl)
                    )
                )
            ).alias("term_score"),
        )
        .groupBy("doc_id")
        .agg(stable_round(F.sum("term_score"), 4).alias("bm25"))
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
    return (
        scored.orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
        .limit(k)
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
    )


def unigram_surprisal(
    spark: SparkSession,
    sf_dir: str,
    k: int = 100,
    min_count: int = 1,
    top_v: int | None = None,
) -> DataFrame:
    """Corpus-relative unigram surprisal: per-document mean negative
    log-probability of its tokens under the corpus's own unigram
    distribution — the LM-perplexity quality signal (CCNet-style) in
    its simplest exactly-reproducible form.  High surprisal = dense in
    corpus-rare tokens (jargon, noise, other-language fragments); the
    top-k most surprising documents are the review/filter queue.

    Shape: one explode → (token) hash-agg builds the unigram table (the
    same partial-agg shuffle as ``vocab_topk``); the per-doc pass joins
    exploded tokens against it on the token key and averages ``-ln p``.
    The unigram table is vocabulary-sized, not corpus-sized — Spark
    broadcasts it when it fits (AQE decides), else the join shuffles on
    the token key with partial aggregation on both sides.  Surprisal is
    rounded before the top-k ranking (engine-stable rank order, ties by
    doc_id), and the top-k itself is a TakeOrdered.

    **The bounded+broadcast form is the documented 100 TB default.**
    ``min_count`` (count floor) and/or ``top_v`` (vocabulary-size cap,
    rarest-dropped-first) bound the probability table, which is then
    EXPLICITLY ``F.broadcast`` into the scoring join — the corpus side
    stays map-only (broadcast hash join, no token-keyed shuffle of the
    token stream; the only stream shuffle left is the doc-keyed partial
    aggregation).  OOV pricing is CALIBRATED, not a floor heuristic:
    under ``top_v`` every out-of-vocabulary token scores the MEAN
    probability of the dropped tail (the dropped mass shared uniformly
    over the dropped types — exact when the tail is one token or
    uniform, e.g. crawl singletons), still relative to the UNCAPPED
    total mass; under ``min_count`` alone the classic ``min_count−0.5``
    price applies.  Rare-token-dense documents therefore keep both
    their ranking AND approximately their exact scores.  The exact form
    (``min_count=1, top_v=None``) shuffles the stream on the token key
    against the unbounded vocab — it exists as the oracle-verified
    baseline the bounded form is differentially gated against (>=95 %
    top-k agreement in pytest), not as the form to run at crawl scale.
    """
    import math

    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    toks = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token")
    ).filter(F.col("token") != "")
    uni = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.orderBy(F.col("surprisal").desc(), F.col("doc_id").asc())
    if min_count > 1 or top_v is not None:
        # total mass BEFORE the cap (probabilities stay calibrated),
        # vocabulary AFTER it (the head table that ships to executors)
        pre = uni.agg(
            F.sum("cnt").alias("t"), F.count(F.lit(1)).alias("n")
        ).collect()[0]
        total, vocab_n = pre["t"], pre["n"]
        if min_count > 1:
            uni = uni.filter(F.col("cnt") >= min_count)
        if top_v is not None:
            uni = uni.orderBy(
                F.col("cnt").desc(), F.col("token").asc()
            ).limit(top_v)
            kept = uni.agg(
                F.coalesce(F.sum("cnt"), F.lit(0)).alias("m"),
                F.count(F.lit(1)).alias("n"),
            ).collect()[0]
            dropped_mass = total - kept["m"]
            dropped_n = vocab_n - kept["n"]
            if dropped_n > 0:
                # mean dropped-token probability — calibrated OOV price
                oov_cnt = dropped_mass / float(dropped_n)
            else:
                oov_cnt = max(min_count - 0.5, 0.5)  # OOV never fires
        else:
            oov_cnt = min_count - 0.5
        oov = -math.log(oov_cnt / float(total))
        scored = (
            toks.join(F.broadcast(uni), "token", "left")
            .groupBy("doc_id")
            .agg(
                stable_round(
                    F.avg(
                        F.when(
                            F.col("cnt").isNull(), F.lit(oov)
                        ).otherwise(
                            -F.log(F.col("cnt") / F.lit(float(total)))
                        )
                    ),
                    4,
                ).alias("surprisal"),
                F.count(F.lit(1)).alias("n_tokens"),
            )
        )
        return (
            scored.orderBy(F.col("surprisal").desc(), F.col("doc_id").asc())
            .limit(k)
            .withColumn("rank", F.row_number().over(w).cast("bigint"))
        )
    total = uni.agg(F.sum("cnt").alias("t")).collect()[0]["t"]
    scored = (
        toks.join(uni, "token")
        .groupBy("doc_id")
        .agg(
            stable_round(
                F.avg(-F.log(F.col("cnt") / F.lit(float(total)))), 4
            ).alias("surprisal"),
            F.count(F.lit(1)).alias("n_tokens"),
        )
    )
    return (
        scored.orderBy(F.col("surprisal").desc(), F.col("doc_id").asc())
        .limit(k)
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
    )


def bigram_surprisal(
    spark: SparkSession, sf_dir: str, k: int = 100, top_v: int | None = None
) -> DataFrame:
    """Bigram conditional surprisal: per-document mean of
    ``-ln p(w_i | w_{i-1})`` under the corpus's own bigram counts
    (``p = c(w_{i-1} w_i) / c(w_{i-1} ·)``) — the next step up from
    :func:`unigram_surprisal`: a document built from common words in
    *implausible order* (shuffled/generated junk) scores high here
    while the unigram signal cannot see it.

    Shape: adjacency comes from one per-document window (``lag`` over
    token position — shuffle keyed on doc_id, each task orders only its
    own documents); the bigram and context tables are partial-agg
    shuffles keyed on the pair/context token; the scoring join
    broadcasts when the tables fit (AQE decides) and the top-k is a
    TakeOrdered.  Scores are rounded before ranking; documents with
    fewer than two tokens have no bigrams and drop out.

    **The ``top_v`` class-LM form is the documented 100 TB default**:
    every token outside the top-``top_v`` unigram vocabulary maps to a
    single ``<unk>`` class via a BROADCAST membership join (map-only —
    the token stream is never shuffled on the token key), and the
    bigram LM is computed EXACTLY over the mapped stream.  The bigram
    and context tables are then bounded by (V+1)^2 / (V+1) instead of
    the open vocabulary, which is what makes the pair-keyed scoring
    join broadcastable at crawl scale.  This is the standard
    class-based LM construction — calibrated (probabilities sum to 1
    over the mapped alphabet), not a heuristic OOV patch.  The exact
    form (``top_v=None``) is the oracle-verified baseline the bounded
    form is differentially gated against in pytest.
    """
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.col("text"), " ")).alias("pos", "token"),
    )
    if top_v is not None:
        vocab = (
            toks.filter(F.col("token") != "")
            .groupBy("token")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("token").asc())
            .limit(top_v)
            .select("token", F.lit(True).alias("in_v"))
        )
        toks = toks.join(F.broadcast(vocab), "token", "left").select(
            "doc_id",
            "pos",
            F.when(F.col("in_v"), F.col("token"))
            .otherwise(F.lit("\x00unk"))
            .alias("token"),
        )
    w = Window.partitionBy("doc_id").orderBy("pos")
    pairs = (
        toks.withColumn("prev", F.lag("token").over(w))
        .filter(F.col("prev").isNotNull())
        .select("doc_id", "prev", F.col("token").alias("cur"))
    )
    big = pairs.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("c2"))
    ctx = big.groupBy("prev").agg(F.sum("c2").alias("c1"))
    scored = (
        pairs.join(big, ["prev", "cur"])
        .join(ctx, "prev")
        .groupBy("doc_id")
        .agg(
            stable_round(
                F.avg(-F.log(F.col("c2") / F.col("c1").cast("double"))), 4
            ).alias("surprisal"),
            F.count(F.lit(1)).alias("n_bigrams"),
        )
    )
    w2 = Window.orderBy(F.col("surprisal").desc(), F.col("doc_id").asc())
    return (
        scored.orderBy(F.col("surprisal").desc(), F.col("doc_id").asc())
        .limit(k)
        .withColumn("rank", F.row_number().over(w2).cast("bigint"))
    )


def boilerplate_ratio(
    spark: SparkSession,
    sf_dir: str,
    n: int = 5,
    min_df: int = 2,
    docs: DataFrame | None = None,
) -> DataFrame:
    """Within-corpus boilerplate mass per document: the fraction of a
    document's positional ``n``-gram occurrences whose gram appears in
    at least ``min_df`` places corpus-wide — navigation chrome, cookie
    banners, license headers, and template scaffolding light up here
    long before they qualify as document-level near-dups.  This is the
    WITHIN-corpus complement of :func:`contamination` (which probes an
    external benchmark set): C4 drops lines this signal flags, and a
    per-source average of it is the classic scraped-site triage stat.

    Plan shape: positional grams are a map-only explode (~1 row per
    corpus token, the same volume as the substring-dedup gram pass),
    immediately ``xxhash64``-folded so the df shuffle moves 8-byte
    keys, not 5-token strings (the substring-dedup trick — a 64-bit
    collision would merge two grams, with the driver's DuckDB
    string-gram oracle as the fidelity pin); the df table is one
    partial-agg shuffle on the hash, the flag join is hash-keyed, and
    the per-doc rollup is a doc-keyed partial agg.  At crawl scale the
    refinement (same shape as the surprisal default) is to TakeOrdered
    the top-K boilerplate grams (df >= min_df is a tiny head at real
    min_df values like 100+) and broadcast-probe them, keeping the
    corpus side map-only; the exact form here is the oracle baseline.

    Output: (doc_id, n_grams, n_boiler, boiler_ratio) for every doc
    with at least ``n`` tokens; ratio rounded to 6.
    """
    if docs is None:
        docs = load_table(spark, sf_dir, "documents")
    docs = docs.filter(F.col("text").isNotNull())
    toks = F.split(F.col("text"), " ")
    grams = docs.select(
        "doc_id",
        F.explode(
            F.when(
                F.size(toks) >= n,
                F.transform(
                    F.sequence(F.lit(1), F.size(toks) - n + 1),
                    lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i, n))),
                ),
            ).otherwise(F.array().cast("array<bigint>"))
        ).alias("gram"),
    )
    dfreq = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("df"))
    return (
        grams.join(dfreq, "gram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(
                F.when(F.col("df") >= min_df, F.lit(1)).otherwise(F.lit(0))
            ).alias("n_boiler"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_boiler",
            stable_round(
                F.col("n_boiler") / F.col("n_grams").cast("double"), 6
            ).alias("boiler_ratio"),
        )
    )


def normalize_nfkc(
    df: DataFrame,
    col: str = "text",
    out_col: str = "text_norm",
    casefold: bool = True,
) -> DataFrame:
    """Unicode NFKC normalization (+ optional casefold): full-width
    forms, ligatures, compatibility characters, and combining-mark
    compositions collapse to canonical text — the preprocessing step
    that makes hash-based dedup see "Ｈｅｌｌｏ" and "Hello", or "ﬁle"
    and "file", as the same bytes. Scrapers emit these constantly;
    without normalization every hash-keyed operator silently treats
    them as distinct content.

    Arrow-batched pandas UDF over stdlib ``unicodedata`` (Spark has no
    built-in NFKC); map-only, order-free, safe to push below any
    dedup/fingerprint stage. NULL passes through as NULL.
    """
    import unicodedata

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def nfkc(texts: pd.Series) -> pd.Series:
        def norm(t):
            if t is None:
                return None
            out = unicodedata.normalize("NFKC", t)
            return out.casefold() if casefold else out

        return texts.map(norm, na_action="ignore")

    return df.withColumn(out_col, nfkc(F.col(col)))


def normalized_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup over NFKC+casefold normalized text — catches the
    unicode-confusable duplicates byte-exact dedup misses. Same
    (hash, min_id) group-by shape as ``exact_dedup``; the normalize
    pass is the only Python stage and it is map-only."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    normed = normalize_nfkc(docs)
    return (
        normed.groupBy(F.md5("text_norm").alias("norm_hash"))
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.count(F.lit(1)).alias("dup_cnt"),
        )
    )


def phrase_search(
    spark: SparkSession,
    sf_dir: str,
    phrase: str = "the quick brown",
    docs: DataFrame | None = None,
) -> DataFrame:
    """Exact token-phrase retrieval: every (doc_id, pos) where the
    whitespace-token sequence of ``phrase`` occurs — grep over the
    corpus, but as ONE keyed probe instead of a substring scan: the
    phrase's rolling hash (same ``xxhash64`` chain as the substring-
    dedup grams, computed driver-side in the plan as a literal) is
    joined against the corpus's positional gram hashes, then candidates
    are verified with an exact token-slice comparison (hash collisions
    can't produce false positives).

    Scale shape: the corpus side is the same positional-gram map-only
    explode the dedup family uses; the probe is a single-value filter
    on an 8-byte hash — pushdown-friendly, no shuffle at all (filter,
    not join), and the verify touches only hash-matching rows.

    Output: (doc_id, pos) of every occurrence, 1-based.
    """
    from .dedup import _gram_positions

    toks = [t for t in phrase.split(" ") if t]
    if not toks:
        raise ValueError("empty phrase")
    n = len(toks)
    if docs is None:
        docs = load_table(spark, sf_dir, "documents")
    docs = docs.filter(F.col("text").isNotNull())
    # the phrase's rolling hash, evaluated once by the engine on a
    # literal array — bit-identical to the corpus-side chain
    lit_toks = ", ".join("'%s'" % t.replace("'", "''") for t in toks)
    roll = "slice(toks, 1, size(toks) - {nm1})".format(nm1=n - 1)
    for j in range(1, n):
        roll = (
            f"zip_with({roll}, slice(toks, {j + 1}, size(toks) - {n - 1}), "
            f"(x, y) -> xxhash64(x, y))"
        )
    probe = (
        spark.range(1)
        .select(
            F.expr(
                f"transform(array({lit_toks}), t -> xxhash64(t))"
            ).alias("toks")
        )
        .select(F.expr(f"element_at({roll}, 1)").alias("h"))
        .collect()[0]["h"]
    )
    grams = _gram_positions(docs, n)
    cands = grams.filter(F.col("gram") == probe).select("doc_id", "pos")
    # exact verify: token slice equality (collision-proof)
    slices = docs.select("doc_id", F.split(F.col("text"), " ").alias("toks"))
    return (
        cands.join(slices, "doc_id")
        .filter(
            F.expr(
                f"slice(toks, pos, {n}) = array({lit_toks})"
            )
        )
        .select("doc_id", "pos")
    )


def winnow_overlap_pairs(
    spark: SparkSession,
    sf_dir: str,
    k: int = 3,
    w: int = 4,
    min_shared: int = 2,
) -> DataFrame:
    """Plagiarism-candidate pairs from winnowing fingerprints
    (Schleimer et al., SIGMOD'03 — the MOSS scheme): documents sharing
    at least ``min_shared`` winnow fingerprints, with the shared count
    as the overlap evidence. Winnowing guarantees any sufficiently
    long shared run yields a shared fingerprint, so this is the
    recall-bearing candidate stage of a plagiarism pipeline; the
    substring-span operators are its precise localizer.

    Plan: the fingerprint sets are the already-verified
    :func:`winnow_fingerprints` explode; candidates come from a join
    keyed on the fingerprint hash (never all-pairs) with a partial-agg
    count per pair. Ultra-common fingerprints (boilerplate) fan out as
    df² on their key alone — cap df exactly like the PPJoin stop-
    shingle note if a crawl shows hot spots.

    Output: (doc_a, doc_b, shared_fps), doc_a < doc_b.
    """
    fps = winnow_fingerprints(spark, sf_dir, k=k, w=w)
    a = fps.select(F.col("doc_id").alias("doc_a"), "fp")
    b = fps.select(F.col("doc_id").alias("doc_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("shared_fps"))
        .filter(F.col("shared_fps") >= min_shared)
    )


def lexical_diversity(
    spark: SparkSession,
    sf_dir: str,
    zipf_top_v: int = 100,
) -> DataFrame:
    """Per-source lexical-diversity diagnostics — the standard corpus
    health checks run before mixing a source into a training set:

      * **type-token ratio** (distinct unigrams / total tokens): low
        TTR flags template/boilerplate-heavy or degenerate-repetition
        sources;
      * **distinct-bigram ratio** (the distinct-n diversity metric of
        Li et al. 2016): catches sources whose unigrams look fine but
        whose phrasing is copy-pasted;
      * **Zipf slope**: the least-squares slope of ln(count) over
        ln(rank) for the source's ``zipf_top_v`` most frequent tokens.
        Natural text sits near −1 (Zipf's law); spam/synthetic text
        drifts shallow or steep, so the deviation is a quality signal.

    Shape (scale-first): ONE (source, token)-keyed partial-agg shuffle
    builds the unigram table; totals/types/TTR fold out of it by
    source.  Bigrams are built map-side from the token array
    (``transform`` over index pairs — no self-join, no window over the
    token stream) and take one (source, gram) partial agg.  The Zipf
    rank is a per-source window over the top slice of the unigram
    table only (vocabulary-sized input, never the corpus), and the
    slope is the closed-form covariance ratio — plain aggregates, no
    fitting loop.  At 100 TB the two gram aggregates are the only
    corpus-sized shuffles, both with map-side partial aggregation;
    hash the gram keys (xxhash64) to fixed-width ints if string keys
    dominate shuffle volume (same trade documented for
    ``boilerplate_ratio``).

    All ratios use the engine-stable floor rounding.  Output: one row
    per source, ordered by source.
    """
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    arr = docs.select(
        "source",
        F.filter(F.split(F.col("text"), " "), lambda x: x != "").alias("a"),
    )
    uni = (
        arr.select("source", F.explode("a").alias("token"))
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    uni_stats = uni.groupBy("source").agg(
        F.sum("cnt").cast("bigint").alias("tokens_total"),
        F.count(F.lit(1)).cast("bigint").alias("types"),
    )
    bi = (
        arr.select(
            "source",
            F.explode(
                F.when(
                    F.size("a") >= 2,
                    F.expr(
                        "transform(sequence(0, size(a)-2),"
                        " i -> concat(a[i], ' ', a[i+1]))"
                    ),
                ).otherwise(F.array().cast("array<string>"))
            ).alias("gram"),
        )
        .groupBy("source", "gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    bi_stats = bi.groupBy("source").agg(
        F.sum("cnt").cast("bigint").alias("bigrams_total"),
        F.count(F.lit(1)).cast("bigint").alias("bigrams_distinct"),
    )
    w = Window.partitionBy("source").orderBy(
        F.col("cnt").desc(), F.col("token").asc()
    )
    ranked = uni.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= zipf_top_v
    )
    xy = ranked.select(
        "source",
        F.log(F.col("rank").cast("double")).alias("x"),
        F.log(F.col("cnt").cast("double")).alias("y"),
    )
    # single-rank sources have zero x-variance: slope is undefined →
    # NULL (try_divide), matching the oracle's NULL on 0/0
    zipf = xy.groupBy("source").agg(
        (
            F.floor(
                F.try_divide(
                    F.sum(F.col("x") * F.col("y"))
                    - F.count(F.lit(1)) * F.avg("x") * F.avg("y"),
                    F.sum(F.col("x") * F.col("x"))
                    - F.count(F.lit(1)) * F.avg("x") * F.avg("x"),
                )
                * 1e4
                + F.lit(0.5)
            )
            / 1e4
        ).alias("zipf_slope"),
    )
    # LEFT joins (ADVICE r7): a source whose documents all have <2
    # tokens has no bigram rows — it must still appear in the report
    # (0 bigrams, NULL ratio), not silently vanish from a diagnostics
    # table. zipf is left-joined for symmetry (any source with >=1
    # token has a rank-1 row, so it can't actually be absent).
    bt = F.coalesce(F.col("bigrams_total"), F.lit(0)).cast("bigint")
    bd = F.coalesce(F.col("bigrams_distinct"), F.lit(0)).cast("bigint")
    return (
        uni_stats.join(bi_stats, "source", "left")
        .join(zipf, "source", "left")
        .select(
            "source",
            "tokens_total",
            "types",
            (F.floor(F.col("types") / F.col("tokens_total").cast("double")
                     * 1e6 + F.lit(0.5)) / 1e6).alias("ttr"),
            bt.alias("bigrams_total"),
            bd.alias("bigrams_distinct"),
            F.when(
                bt > 0,
                F.floor(bd / bt.cast("double") * 1e6 + F.lit(0.5)) / 1e6,
            ).alias("bigram_distinct_ratio"),
            "zipf_slope",
        )
        .orderBy("source")
    )


# -- sentence-level dedup (C4-style) -----------------------------------------


def _sentence_array(col: Column) -> Column:
    """text → array of trimmed, whitespace-collapsed, non-empty
    sentences, split on runs of ``.!?``. The split/trim/collapse chain
    is chosen to be expressible identically in DuckDB
    (``regexp_split_to_array`` + ``list_transform`` + ``list_filter``)
    so the sentence boundary is engine-exact — no lookbehind (RE2
    lacks it), no locale-aware segmentation."""
    arr = F.split(col, r"[.!?]+")
    arr = F.transform(arr, lambda s: F.trim(F.regexp_replace(s, r"\s+", " ")))
    return F.filter(arr, lambda s: s != "")


def _exploded_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    return docs.select(
        "doc_id",
        F.posexplode(_sentence_array(F.col("text"))).alias(
            "sent_idx", "sentence"
        ),
    ).withColumn("sent_idx", F.col("sent_idx").cast("bigint"))


def dup_sentence_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicate-sentence diagnostics — the signal behind
    C4-style sentence/span-level dedup (Raffel et al. 2020 dedupe
    repeated spans; Lee et al. 2022 'Deduplicating Training Data Makes
    Language Models Better' measure exactly this ratio before scrubbing):
    for each document, how many of its sentences also occur elsewhere
    in the corpus (case-folded match), and the resulting ratio.

    A sentence is *duplicated* when its case-folded form occurs ≥ 2
    times corpus-wide (counting occurrences, not distinct documents —
    a doc repeating its own boilerplate line scores as duplicated,
    which is the curation-relevant behavior for templated text).

    Scale shape: one sentence-keyed shuffle (window count over the
    case-folded key — partial state is one count per key) + one
    doc-keyed partial agg. At crawl scale fold the key to ``xxhash64``
    before the shuffle (8-byte keys vs full sentence strings; the
    oracle baseline uses the exact string). Documents whose text
    yields zero sentences (empty after splitting) have no rows here —
    anchor on the documents table if a 0-sentence row is needed.

    Output: (doc_id, n_sentences, n_dup_sentences, dup_sentence_ratio
    floor-rounded 6), one row per document with ≥1 sentence.
    """
    from pyspark.sql import Window

    s = _exploded_sentences(spark, sf_dir)
    occ = F.count(F.lit(1)).over(
        Window.partitionBy(F.lower(F.col("sentence")))
    )
    flagged = s.withColumn("is_dup", (occ >= 2).cast("int"))
    n_sent = F.count(F.lit(1)).cast("bigint")
    n_dup = F.sum("is_dup").cast("bigint")
    return flagged.groupBy("doc_id").agg(
        n_sent.alias("n_sentences"),
        n_dup.alias("n_dup_sentences"),
        stable_round(
            F.sum("is_dup").cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("dup_sentence_ratio"),
    )


def scrub_dup_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-first sentence-level scrub — the ACTION form of
    :func:`dup_sentence_stats` (the C4 pipeline removes later
    occurrences of duplicated spans; Lee et al. 2022 keep one): the
    globally FIRST occurrence of every distinct case-folded sentence
    survives (first = smallest (doc_id, sent_idx)), every later
    occurrence is dropped, singletons pass through untouched.

    Deterministic and engine-exact: survivor choice is a
    ``row_number`` over the case-folded key ordered by (doc_id,
    sent_idx) — one sentence-keyed shuffle, state bounded per key by
    that key's occurrence count. The caller reassembles clean text by
    grouping on doc_id ordered by sent_idx (kept as columns here so
    the scrub itself stays relational and oracle-checkable).

    Output: (doc_id, sent_idx, sentence) — the KEPT sentences with
    their original in-document positions.
    """
    from pyspark.sql import Window

    s = _exploded_sentences(spark, sf_dir)
    w = Window.partitionBy(F.lower(F.col("sentence"))).orderBy(
        F.col("doc_id").asc(), F.col("sent_idx").asc()
    )
    return (
        s.withColumn("occ_rank", F.row_number().over(w))
        .filter(F.col("occ_rank") == 1)
        .select("doc_id", "sent_idx", "sentence")
    )


def normalized_dedup_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-verified contract for :func:`normalized_dedup` (never
    driver-checked in rounds 1-11; no DuckDB twin exists — DuckDB has
    no NFKC). Three deterministic guarantees:

    * IDEMPOTENCE: applying the NFKC+casefold pass to its own output
      changes nothing — ``normalize(normalize(t)) == normalize(t)``
      for every document (a real Unicode property of NFKC∘casefold on
      its image, and the property the dedup key depends on):
      ``n_idempotence_violations`` = 0.
    * GROUPING EQUIVALENCE: the (md5-hash keyed) dedup groups must
      equal a direct string-keyed group-by on the normalized text —
      same (survivor, count) per group, which pins both the md5
      keying (collision-freedom on this corpus) and the group-by
      machinery through a different plan: ``n_group_mismatch`` = 0.
    * COVERAGE: group counts sum back to the document total:
      ``n_coverage_delta`` = 0.

    Ballast: ``n_docs`` (non-NULL text).
    """
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    n_docs = docs.count()
    normed = normalize_nfkc(docs).localCheckpoint(eager=True)
    again = normalize_nfkc(normed, col="text_norm", out_col="text_norm2")
    n_idem = again.filter(
        ~F.col("text_norm2").eqNullSafe(F.col("text_norm"))
    ).count()

    hashed = normalized_dedup(spark, sf_dir).select(
        "norm_hash", "doc_id", "dup_cnt"
    )
    direct = (
        normed.groupBy("text_norm")
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.count(F.lit(1)).alias("dup_cnt"),
        )
        .select(F.md5("text_norm").alias("norm_hash"), "doc_id", "dup_cnt")
    )
    # presence markers: a name-list full_outer join COALESCES the join
    # columns, so one-sided rows are detected by the marker being
    # null, never by the (always-populated) key columns
    n_group = (
        hashed.withColumn("h_p", F.lit(1))
        .join(
            direct.withColumn("d_p", F.lit(1)),
            ["norm_hash", "doc_id", "dup_cnt"],
            "full_outer",
        )
        .filter(F.col("h_p").isNull() | F.col("d_p").isNull())
        .count()
    )
    total = hashed.agg(F.coalesce(F.sum("dup_cnt"), F.lit(0))).collect()[0][0]
    n_cover = abs(int(total) - int(n_docs))
    release_checkpoint(normed)
    return spark.createDataFrame(
        [(int(n_docs), int(n_idem), int(n_group), int(n_cover))],
        "n_docs bigint, n_idempotence_violations bigint,"
        " n_group_mismatch bigint, n_coverage_delta bigint",
    )
