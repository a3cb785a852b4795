"""Per-source lexical-diversity diagnostics (TTR / distinct-bigram
ratio / Zipf slope).

Exact values are pinned by the driver oracle (`text_lexical_diversity`);
here we pin planted-corpus semantics (hand-computable counts, the
Zipf-slope sign and a closed-form golden) and the plan shape.
"""

import math

import pytest

from basenine_spark.ops import text

SF = "/root/testdata/sf0.01"


@pytest.fixture()
def planted(spark, tmp_path):
    """srcR repeats one token (degenerate); srcD is all-distinct.
      * srcR: 'x x x x'  → 4 tokens, 1 type, bigrams {'x x': 3} → 1 distinct
      * srcD: 'a b c d'  → 4 tokens, 4 types, 3 distinct bigrams
    """
    out = str(tmp_path / "lex_sf")
    rows = [
        (0, "x x x x", "en", "srcR", 7),
        (1, "a b c d", "en", "srcD", 7),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int"
    ).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    return out


def test_planted_counts(spark, planted):
    got = {r["source"]: r for r in text.lexical_diversity(spark, planted).collect()}
    r, d = got["srcR"], got["srcD"]
    assert r["tokens_total"] == 4 and r["types"] == 1 and r["ttr"] == 0.25
    assert r["bigrams_total"] == 3 and r["bigrams_distinct"] == 1
    assert d["tokens_total"] == 4 and d["types"] == 4 and d["ttr"] == 1.0
    assert d["bigrams_total"] == 3 and d["bigrams_distinct"] == 3
    assert d["bigram_distinct_ratio"] == 1.0
    # uniform-frequency source: slope of ln(cnt)=const over ln(rank) is 0
    assert d["zipf_slope"] == 0.0
    # single-type source: one point, slope is 0/0 → NULL, not a crash
    assert r["zipf_slope"] is None


def test_zipf_slope_golden(spark, tmp_path):
    """Two tokens with counts 4 and 2 at ranks 1 and 2: the two-point
    least-squares slope is (ln 2 - ln 4) / (ln 2 - ln 1) = -1."""
    out = str(tmp_path / "zipf_sf")
    rows = [(0, "h h h h t t", "en", "srcZ", 11)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int"
    ).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    got = text.lexical_diversity(spark, out).collect()[0]
    assert got["zipf_slope"] == -1.0


def test_real_corpus_sanity(spark):
    rows = text.lexical_diversity(spark, SF).collect()
    assert len(rows) == 20  # one per source
    for r in rows:
        assert 0.0 < r["ttr"] <= 1.0
        assert 0.0 < r["bigram_distinct_ratio"] <= 1.0
        assert r["zipf_slope"] < 0.0  # frequencies decay with rank


def test_plan_shape(spark):
    plan = (
        text.lexical_diversity(spark, SF)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan

def test_bigramless_source_survives(spark, tmp_path):
    # ADVICE r7: a source whose documents all have <2 tokens used to
    # vanish from the report via the inner bi_stats join — it must now
    # surface with 0 bigrams and a NULL ratio (mirrored in the oracle).
    out = str(tmp_path / "lex_short_sf")
    rows = [
        (0, "solo", "en", "srcONE", 4),
        (1, "a b c d", "en", "srcD", 7),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int"
    ).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    got = {r["source"]: r for r in text.lexical_diversity(spark, out).collect()}
    assert "srcONE" in got, "bigram-less source dropped from diagnostics"
    one = got["srcONE"]
    assert one["tokens_total"] == 1 and one["types"] == 1
    assert one["bigrams_total"] == 0 and one["bigrams_distinct"] == 0
    assert one["bigram_distinct_ratio"] is None
    # single-rank vocabulary → zero x-variance → NULL slope
    assert one["zipf_slope"] is None
