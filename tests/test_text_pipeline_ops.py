"""Unit + plan-shape coverage for the round-3 text-pipeline additions:
repetition stats, PII scrubbing, benchmark-contamination overlap."""

from pyspark.sql import Row

from basenine_spark.ops import text

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# -- repetition -------------------------------------------------------------

def test_repetition_invariants(spark):
    out = text.repetition_stats(spark, SF).collect()
    assert out
    for r in out:
        assert 1 <= r.top_cnt <= r.n_bigrams
        assert 0 < r.top_ratio <= 1.0
        assert 0 <= r.dup_ratio < 1.0
        # top bigram repeats ⇒ some bigram instance is a duplicate
        if r.top_cnt > 1:
            assert r.dup_ratio > 0


def test_repetition_known_document(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="a b a b a")]  # bigrams: ab ba ab ba → top 2/4
    )
    out = (
        docs.select("doc_id", text.tokens(text.F.col("text")).alias("toks"))
        .select("doc_id", text.F.explode(text.F.expr(text._gram_expr(2))).alias("bg"))
        .groupBy("doc_id", "bg")
        .count()
        .collect()
    )
    counts = {r.bg: r["count"] for r in out}
    assert counts == {"a b": 2, "b a": 2}


# -- PII scrub --------------------------------------------------------------

def test_pii_scrub_patterns(spark):
    df = spark.createDataFrame(
        [
            Row(id=1, t="mail bob@example.com from 10.0.0.1 port 8080"),
            Row(id=2, t="no pii here"),
            Row(id=3, t="x 123 y 4567"),
        ]
    )
    rows = {r.id: r for r in text.pii_scrub(df, "t", "id").collect()}
    assert rows[1].n_email == 1 and rows[1].n_ipv4 == 1 and rows[1].n_number == 1
    assert rows[1].scrubbed == "mail <EMAIL> from <IP> port <NUM>"
    assert rows[2].n_email == rows[2].n_ipv4 == rows[2].n_number == 0
    assert rows[2].scrubbed == "no pii here"
    assert rows[3].n_number == 2 and rows[3].scrubbed == "x <NUM> y <NUM>"


def test_pii_scrub_is_map_only(spark):
    plan = _plan(text.pii_scrub_events(spark, SF))
    assert "Exchange" not in plan, plan  # pure scan→project, no shuffle


# -- contamination ----------------------------------------------------------

def test_contamination_excludes_benchmark_and_bounds(spark):
    from basenine_spark.sources.tables import load_table

    out = text.contamination(spark, SF).collect()
    assert out
    bench_ids = {
        r.doc_id
        for r in load_table(spark, SF, "documents")
        .filter("source = 'src0'")
        .select("doc_id")
        .collect()
    }
    for r in out:
        assert r.doc_id not in bench_ids
        assert 0 <= r.n_overlap <= r.n_grams
        assert 0.0 <= r.contamination <= 1.0


def test_contamination_broadcasts_benchmark(spark):
    plan = _plan(text.contamination(spark, SF))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_quality_flags_reference_values(spark):
    """Pin the rule bundle against a pure-Python reimplementation on a
    sample — rules must be independently auditable."""
    import re as _re

    from basenine_spark.ops import text as text_ops
    from basenine_spark.sources.tables import load_table as _lt

    sf = "/root/testdata/sf0.001"
    got = {r["doc_id"]: r for r in text_ops.quality_flags(spark, sf).collect()}
    for r in _lt(spark, sf, "documents").limit(50).collect():
        t = r["text"]
        toks = t.split(" ")
        n_tokens = len(toks)
        n_chars = len(t.encode())
        mean_word = len(t.replace(" ", "").encode()) / n_tokens
        n_sym = n_chars - len(_re.sub(r"[#*=_~|>{}\[\]]", "", t).encode())
        n_alpha = n_chars - len(_re.sub(r"[A-Za-z]", "", t).encode())
        n_upper = n_chars - len(_re.sub(r"[A-Z]", "", t).encode())
        g = got[r["doc_id"]]
        assert g["ok_len"] == (30 <= n_tokens <= 1000)
        assert g["ok_word_len"] == (3.0 <= mean_word <= 12.0)
        assert g["ok_symbol"] == (n_sym < 0.1 * n_chars)
        assert g["ok_upper"] == (n_alpha == 0 or n_upper < 0.3 * n_alpha)
        assert g["ok_all"] == (
            g["ok_len"] and g["ok_word_len"] and g["ok_symbol"] and g["ok_upper"]
        )


def test_write_training_shards_matches_manifest(spark, tmp_path):
    """The physical shard layout and the manifest derive from the same
    expression — per-directory counts must equal the manifest."""
    from pyspark.sql import functions as F

    from basenine_spark.ops import pipeline as pl

    sf = "/root/testdata/sf0.001"
    dest = str(tmp_path / "shards")
    pl.write_training_shards(spark, sf, dest)
    written = spark.read.parquet(dest)
    per_dir = {
        r["shard_id"]: r["n"]
        for r in written.groupBy("shard_id").agg(F.count("*").alias("n")).collect()
    }
    manifest = {
        r["shard_id"]: r["n_docs"]
        for r in pl.shard_manifest(spark, sf).collect()
    }
    assert per_dir == manifest
