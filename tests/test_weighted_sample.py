"""Efraimidis-Spirakis weighted draw: exact size, weight bias,
determinism.

Exact values are pinned by the driver oracle (`sample_weighted_draw`).
"""

import pytest

from basenine_spark.ops import sampling

SF = "/root/testdata/sf0.01"


@pytest.fixture()
def planted(spark, tmp_path):
    """Five heavy docs (4000 tokens) and five light docs (2 tokens):
    with keys -ln(u)/w, the heavy keys are ~2000x smaller for any u,
    so a k=5 draw takes all five heavy docs (u spans only [0.5/2^32,
    1), bounding -ln(u) to (0, ~22.2] — a factor-2000 weight gap
    cannot be overcome)."""
    out = str(tmp_path / "wres_sf")
    rows = [
        (i, " ".join(["h"] * 4000), "en", "heavy", 8000) for i in range(5)
    ]
    rows += [(10 + i, "x y", "en", "light", 3) for i in range(5)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int"
    ).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    return out


def test_heavy_docs_win(spark, planted):
    got = sampling.weighted_sample(spark, planted, k=5).collect()
    assert len(got) == 5
    assert all(r["source"] == "heavy" for r in got)
    assert sorted(r["draw_rank"] for r in got) == [1, 2, 3, 4, 5]


def test_exact_size_and_determinism(spark):
    a = sampling.weighted_sample(spark, SF, k=100).collect()
    b = sampling.weighted_sample(spark, SF, k=100).collect()
    assert len(a) == len(b) == 100
    assert sorted((r["doc_id"], r["key"]) for r in a) == sorted(
        (r["doc_id"], r["key"]) for r in b
    )


def test_salt_changes_draw(spark):
    a = {r["doc_id"] for r in sampling.weighted_sample(spark, SF, k=100).collect()}
    b = {
        r["doc_id"]
        for r in sampling.weighted_sample(spark, SF, k=100, salt="other").collect()
    }
    assert a != b


def test_token_mass_bias_on_corpus(spark):
    """The selected set's mean token count should exceed the corpus
    mean — the draw is proportional to token mass."""
    sel = sampling.weighted_sample(spark, SF, k=100).collect()
    sel_mean = sum(r["n_tokens"] for r in sel) / len(sel)
    from basenine_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    corpus_mean = (
        load_table(spark, SF, "documents")
        .filter(F.col("text").isNotNull())
        .select(F.avg(F.size(F.split("text", " "))).alias("m"))
        .collect()[0]["m"]
    )
    assert sel_mean > corpus_mean
