"""Token-budget greedy selection: prefix semantics at the budget
boundary, and the distributed prefix-sum plan shape.

Exact values are pinned by the driver oracle (`sample_token_budget`).
"""

import pytest

from basenine_spark.ops import sampling

SF = "/root/testdata/sf0.01"


@pytest.fixture()
def planted(spark, tmp_path):
    """Quality order (stop_ratio desc, doc_id): doc0 (ratio 1.0, 4
    toks), doc1 (0.5, 4 toks), doc2 (0.25, 4 toks), doc3 (0.0, 4
    toks).  Budget 9: doc0 (cum 4) and doc1 (cum 8) fit; doc2 would
    hit 12 > 9 → dropped, and so is everything after."""
    out = str(tmp_path / "budget_sf")
    rows = [
        (0, "a the a the", "en", "s", 11),
        (1, "a the x y", "en", "s", 9),
        (2, "a x y z", "en", "s", 7),
        (3, "w x y z", "en", "s", 7),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int"
    ).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    return out


def test_prefix_semantics(spark, planted):
    got = sorted(
        sampling.select_token_budget(spark, planted, budget=9).collect(),
        key=lambda r: r["sel_rank"],
    )
    assert [r["doc_id"] for r in got] == [0, 1]
    assert [r["cum_tokens"] for r in got] == [4, 8]
    assert [r["sel_rank"] for r in got] == [1, 2]


def test_exact_boundary_included(spark, planted):
    got = sampling.select_token_budget(spark, planted, budget=12).collect()
    assert {r["doc_id"] for r in got} == {0, 1, 2}  # cum 12 == budget kept


def test_zero_budget_empty(spark, planted):
    assert sampling.select_token_budget(spark, planted, budget=0).count() == 0


def test_monotone_in_budget(spark):
    small = {
        r["doc_id"]
        for r in sampling.select_token_budget(spark, SF, budget=5000).collect()
    }
    big = {
        r["doc_id"]
        for r in sampling.select_token_budget(spark, SF, budget=10000).collect()
    }
    assert small < big  # strictly grows on this corpus


def test_plan_distributed_prefix_sum(spark):
    plan = (
        sampling.select_token_budget(spark, SF)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the corpus-side window is partitioned on the range-partition id
    # (two-pass construction) — the whole-corpus single-partition sort
    # never appears (the lazy localCheckpoint pins the range exchange
    # upstream of the visible plan, exactly like equi_depth_histogram)
    assert "hashpartitioning(pid" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
