"""DSIR-style importance selection (Xie et al. 2023).

Exact values are pinned by the driver oracle (`sample_dsir_select`);
here we pin planted-corpus semantics, the hashed-feature scale mode's
agreement with the exact form, and the plan shape.
"""

import pytest
from pyspark.sql import functions as F

from basenine_spark.ops import sampling

SF = "/root/testdata/sf0.01"


@pytest.fixture()
def planted(spark, tmp_path):
    """Target slice (lang='tt') speaks {alpha, beta}; the pool has one
    target-like doc (doc 10), one mixed doc (doc 11), and one doc of
    never-in-target tokens (doc 12)."""
    out = str(tmp_path / "dsir_sf")
    rows = [
        (0, "alpha beta alpha beta", "tt", "srcT", 21),
        (1, "beta alpha beta alpha", "tt", "srcT", 21),
        (10, "alpha beta alpha beta", "xx", "srcP", 21),
        (11, "alpha noise noise noise", "xx", "srcP", 23),
        (12, "junk junk junk junk", "xx", "srcP", 19),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int"
    ).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    return out


def test_planted_ranking(spark, planted):
    got = sampling.dsir_select(spark, planted, target_lang="tt", k=10).collect()
    by_id = {r["doc_id"]: r for r in got}
    # only pool docs are selectable
    assert set(by_id) == {10, 11, 12}
    assert all(r["lang"] != "tt" for r in got)
    # target-like > mixed > junk, and the signs are right
    assert by_id[10]["rank"] == 1 and by_id[12]["rank"] == 3
    assert by_id[10]["dsir_weight"] > by_id[11]["dsir_weight"]
    assert by_id[11]["dsir_weight"] > by_id[12]["dsir_weight"]
    assert by_id[10]["dsir_weight"] > 0 > by_id[12]["dsir_weight"]
    assert by_id[10]["n_tokens"] == 4


def test_hashed_mode_agrees_with_exact(spark):
    """DSIR's own design hashes features into fixed buckets; at 2^16
    buckets on this vocab the top-50 selection should substantially
    agree with the exact form (collisions blur individual ratios but
    preserve the distributional signal)."""
    exact = {
        r["doc_id"]
        for r in sampling.dsir_select(spark, SF, k=50).collect()
    }
    hashed = {
        r["doc_id"]
        for r in sampling.dsir_select(
            spark, SF, k=50, n_buckets=1 << 16
        ).collect()
    }
    overlap = len(exact & hashed) / 50.0
    assert overlap >= 0.8, f"top-50 overlap {overlap}"


def test_plan_shape(spark):
    # hashed scale mode: ratio table is explicitly broadcast, no
    # Python stages, no cartesian anywhere
    plan = (
        sampling.dsir_select(spark, SF, n_buckets=1 << 16)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastExchange" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    # exact oracle form is JVM-only too
    plan = (
        sampling.dsir_select(spark, SF)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
