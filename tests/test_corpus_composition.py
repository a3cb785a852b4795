"""Corpus-composition analytics: source novelty curve + overlap matrix.

Exact-values checks live in the driver oracles (`pipeline_novelty_curve`
/ `pipeline_source_overlap`); here we pin planted-corpus semantics and
the scale-shape invariants (gram-keyed postings join, df-cap behavior).
"""

import pytest
from pyspark.sql import functions as F

from basenine_spark.ops import pipeline

SF = "/root/testdata/sf0.01"


@pytest.fixture()
def planted(spark, tmp_path):
    """Three sources with known gram relations:
      * srcA: 'a b c d'      → grams {abc, bcd}
      * srcB: 'a b c e'      → grams {abc, bce}  (shares abc with A)
      * srcC: 'x y z w'      → grams {xyz, yzw}  (disjoint)
    Lexicographic walk A→B→C: A novel 2/2, B novel 1/2 (bce), C 2/2.
    """
    out = str(tmp_path / "comp_sf")
    rows = [
        (0, "a b c d", "srcA", 7),
        (1, "a b c e", "srcB", 7),
        (2, "x y z w", "srcC", 7),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, source string, n_chars int"
    ).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    return out


def test_novelty_curve_planted(spark, planted):
    got = {
        r["source"]: r
        for r in pipeline.source_novelty_curve(spark, planted).collect()
    }
    assert got["srcA"]["total_grams"] == 2 and got["srcA"]["novel_grams"] == 2
    assert got["srcB"]["total_grams"] == 2 and got["srcB"]["novel_grams"] == 1
    assert got["srcC"]["total_grams"] == 2 and got["srcC"]["novel_grams"] == 2
    assert got["srcB"]["novelty_ratio"] == 0.5


def test_novelty_mass_conserved(spark):
    """Σ novel_grams == |corpus gram universe| — every gram is credited
    to exactly one source."""
    rows = pipeline.source_novelty_curve(spark, SF).collect()
    total_novel = sum(r["novel_grams"] for r in rows)
    universe = pipeline._source_grams(spark, SF, 3).select("gram").distinct().count()
    assert total_novel == universe


def test_overlap_planted(spark, planted):
    got = {
        (r["source_a"], r["source_b"]): r
        for r in pipeline.source_overlap_matrix(spark, planted).collect()
    }
    # A∩B = {abc} → J = 1/3; C disjoint from both → absent
    assert set(got) == {("srcA", "srcB")}
    ab = got[("srcA", "srcB")]
    assert ab["inter"] == 1 and ab["jaccard"] == round(1 / 3, 6)


def test_overlap_symmetric_bound(spark):
    rows = pipeline.source_overlap_matrix(spark, SF).collect()
    assert rows, "sf0.01 sources share grams"
    for r in rows:
        assert r["source_a"] < r["source_b"]
        assert 0.0 < r["jaccard"] <= 1.0


def test_overlap_max_holders_cap_drops_universal_grams(spark, tmp_path):
    """A gram held by every source disappears under max_holders — the
    capped crawl-scale mode keeps only discriminative grams."""
    out = str(tmp_path / "cap_sf")
    rows = [
        (0, "u v w a b c", "s0", 11),
        (1, "u v w d e f", "s1", 11),
        (2, "u v w g h i", "s2", 11),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, source string, n_chars int"
    ).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    exact = pipeline.source_overlap_matrix(spark, out).collect()
    # uvw is shared 3 ways → 3 pairs
    assert len(exact) == 3
    capped = pipeline.source_overlap_matrix(spark, out, max_holders=2).collect()
    assert capped == []  # only the universal gram intersected


def test_plan_no_python_no_cartesian(spark):
    for df in (
        pipeline.source_novelty_curve(spark, SF),
        pipeline.source_overlap_matrix(spark, SF),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        assert "CartesianProduct" not in plan
