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

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table

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
    double result (and its rounding) is bit-identical across engines.
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
        F.round(stop_cnt.cast("double") / n.cast("double"), 6).alias("stop_ratio"),
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
        F.round(F.avg("n_chars"), 2).alias("avg_chars"),
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
