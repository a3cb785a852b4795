"""Round-10 new capabilities: k-anonymity release ladder, LOSO
ablation, and the GK/HLL sketch-contract verified twins.

The driver oracle (sf0.01 DuckDB hash compare) is the primary gate for
all four; these tests pin the SEMANTICS on tiny hand-built corpora
where the expected output is computable by eye — ladder level
selection, sentinel handling, exclusion arithmetic, and the
contract-violation counters staying zero.
"""

import json

import pytest
from pyspark.sql import functions as F

from basenine_spark.ops import pipeline, privacy, relational

SF = "/root/testdata/sf0.001"


def _write_events(spark, tmp_path, rows):
    out = str(tmp_path / "evstore")
    spark.createDataFrame(
        rows,
        "event_id long, ts_ms long, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(f"{out}/events.parquet")
    return out


def test_k_anonymity_ladder_levels(spark, tmp_path):
    """25 identical-QI rows release at level 1; a 5-row QI group falls
    through to whatever coarser level first reaches k=20; a type rarer
    than k in total is suppressed."""
    t0 = (3 * 3600 + 1800) * 1000  # hour-of-day 3
    rows = []
    # group A: 25 rows, et=click, hour 3, value 5.0 (b10=0) -> level 1
    for i in range(25):
        rows.append((i, t0, 1, "click", 5.0, "{}"))
    # group B: 5 rows, et=click, hour 2 (same 4h block 0), value 15.0
    # (b10=1, b20=0): level-1 n=5 < 20; level 2 block holds 25+5=30
    # rows >= 20 -> level 2
    t1 = 2 * 3600 * 1000  # hour-of-day 2
    for i in range(25, 30):
        rows.append((i, t1, 1, "click", 15.0, "{}"))
    # group C: rare type, 3 rows total -> level 4 (suppressed)
    for i in range(30, 33):
        rows.append((i, t0, 1, "rare", 5.0, "{}"))
    out = _write_events(spark, tmp_path, rows)
    got = {
        r["event_id"]: r
        for r in privacy.k_anonymize_events(spark, out, k=20).collect()
    }
    a = got[0]
    assert (a["anon_level"], a["qi_type"], a["qi_hour"], a["qi_band"], a["group_n"]) == (1, "click", 3, 0, 25)
    b = got[25]
    assert (b["anon_level"], b["qi_type"], b["qi_hour"], b["qi_band"], b["group_n"]) == (2, "click", 0, 0, 30)
    c = got[30]
    assert (c["anon_level"], c["qi_type"], c["qi_hour"], c["qi_band"], c["group_n"]) == (4, "(suppressed)", -1, -1, 0)


def test_k_anonymity_null_qi_sentinels(spark, tmp_path):
    """NULL event_type / ts / value coalesce to sentinels BEFORE
    grouping — they form their own groups and never hit a NULL join
    key."""
    rows = [(i, None, 1, None, None, "{}") for i in range(21)]
    # ts_ms / event_type / value all NULL
    out = _write_events(spark, tmp_path, rows)
    got = privacy.k_anonymize_events(spark, out, k=20).collect()
    assert len(got) == 21
    r = got[0]
    # 21 identical sentinel-QI rows -> level 1 at the sentinel QI
    assert (r["anon_level"], r["qi_type"], r["qi_hour"], r["qi_band"], r["group_n"]) == (1, "(null)", -1, -1, 21)


def test_k_anonymity_every_row_released_once(spark):
    df = privacy.k_anonymize_events(spark, SF)
    n_events = spark.read.parquet(f"{SF}/events.parquet").count()
    rows = df.collect()
    assert len(rows) == n_events
    assert len({r["event_id"] for r in rows}) == n_events
    # k respected: every non-suppressed group_n >= k
    assert all(r["group_n"] >= 20 for r in rows if r["anon_level"] < 4)


def _write_docs(spark, tmp_path, rows):
    out = str(tmp_path / "docstore")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    return out


def test_loso_ablation_arithmetic(spark, tmp_path):
    rows = [
        (0, "a b c", "en", "web", 5),
        (1, "d e", "en", "web", 3),
        (2, "f g h i", "de", "books", 7),
        (3, "j", "fr", "books", 1),
        (4, "k l", "fr", "web", 2),
    ]
    out = _write_docs(spark, tmp_path, rows)
    got = {r["source"]: r for r in pipeline.loso_ablation(spark, out).collect()}
    web = got["web"]
    # without web: docs 2,3 -> 2 docs, 5 tokens, 8 chars, langs {de,fr}
    assert (web["n_docs_excl"], web["n_tokens_excl"], web["n_chars_excl"]) == (2, 5, 8)
    assert web["n_langs_excl"] == 2  # en dies with web
    assert web["avg_chars_excl"] == pytest.approx(4.0)
    books = got["books"]
    # without books: docs 0,1,4 -> 3 docs, 7 tokens, 10 chars,
    # langs {en, fr} (de dies with books)
    assert (books["n_docs_excl"], books["n_tokens_excl"], books["n_chars_excl"]) == (3, 7, 10)
    assert books["n_langs_excl"] == 2


def test_loso_single_source_null_division(spark, tmp_path):
    rows = [(0, "a b", "en", "only", 3), (1, "c", "en", "only", 1)]
    out = _write_docs(spark, tmp_path, rows)
    (r,) = pipeline.loso_ablation(spark, out).collect()
    assert r["n_docs_excl"] == 0 and r["avg_chars_excl"] is None
    assert r["n_langs_excl"] == 0


def test_quantiles_verified_zero_violations(spark):
    rows = relational.quantiles_verified(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["viol50"] == 0 and r["viol95"] == 0 and r["viol99"] == 0
        assert r["tol_rows"] >= 1


def test_hll_verified_zero_violations(spark):
    rows = relational.hll_distinct_verified(spark, SF).collect()
    assert rows
    assert all(r["n_violations"] == 0 for r in rows)
    assert all(r["exact_users"] <= r["cnt"] for r in rows)


def test_l_diversity_blocks_single_user_group(spark, tmp_path):
    """A group with >= k rows but ONE user must NOT release at level 1
    (homogeneity attack); it generalizes until the diversity bound
    holds or suppresses."""
    t0 = (3 * 3600 + 1800) * 1000
    rows = []
    # group A: 25 rows, all user 7 -> k ok, diversity 1 < 5
    for i in range(25):
        rows.append((i, t0, 7, "click", 5.0, "{}"))
    # same-type same-4h-block group with 6 distinct users, 30 rows: level 2
    # holds 55 rows and 7 users -> A releases at level 2
    t1 = 2 * 3600 * 1000
    for i in range(25, 55):
        rows.append((i, t1, 100 + (i % 6), "click", 15.0, "{}"))
    out = _write_events(spark, tmp_path, rows)
    got = {
        r["event_id"]: r
        for r in privacy.l_diversify_events(spark, out, k=20, l_div=5).collect()
    }
    a = got[0]
    assert a["anon_level"] == 2
    assert a["group_n"] == 55 and a["group_users"] == 7
    b = got[30]
    # B's own level-1 group: 30 rows, 6 users -> releases at level 1
    assert b["anon_level"] == 1 and b["group_users"] == 6


def test_l_diversity_driver_shape(spark):
    df = privacy.l_diversify_events(spark, SF)
    n_events = spark.read.parquet(f"{SF}/events.parquet").count()
    rows = df.collect()
    assert len(rows) == n_events
    for r in rows:
        if r["anon_level"] < 4:
            assert r["group_n"] >= 20 and r["group_users"] >= 5
