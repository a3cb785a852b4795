"""Temperature-based mixture reweighting (XLM-R / mT5 alpha sampling):
limit cases, tail-boosting, and allocation conservation.

Exact values are pinned by the driver oracle
(`sample_temperature_mixture`)."""

import pytest

from basenine_spark.ops import sampling

SF = "/root/testdata/sf0.01"


@pytest.fixture()
def skewed(spark, tmp_path):
    """srcBig holds 90% of the token mass, srcSmall 10%."""
    out = str(tmp_path / "temp_sf")
    rows = [(i, " ".join(["w"] * 90), "en", "srcBig", 179) for i in range(10)]
    rows += [(100, " ".join(["v"] * 100), "en", "srcSmall", 199)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int"
    ).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    return out


def test_alpha_limits(spark, skewed):
    # alpha=1 → proportional: w_temp == p_raw
    prop = {
        r["source"]: r
        for r in sampling.temperature_mixture(spark, skewed, alpha=1.0).collect()
    }
    for r in prop.values():
        assert r["w_temp"] == r["p_raw"]
    # alpha=0 → uniform: every source gets 1/|S|
    unif = {
        r["source"]: r
        for r in sampling.temperature_mixture(spark, skewed, alpha=0.0).collect()
    }
    assert all(r["w_temp"] == 0.5 for r in unif.values())


def test_tail_boosted_head_flattened(spark, skewed):
    got = {
        r["source"]: r
        for r in sampling.temperature_mixture(spark, skewed, alpha=0.3).collect()
    }
    big, small = got["srcBig"], got["srcSmall"]
    assert big["p_raw"] == 0.9 and small["p_raw"] == 0.1
    assert small["w_temp"] > small["p_raw"]  # tail boosted
    assert big["w_temp"] < big["p_raw"]  # head flattened
    assert big["w_temp"] > small["w_temp"]  # order preserved for alpha>0


def test_allocation_conserved_and_rates_capped(spark):
    rows = sampling.temperature_mixture(spark, SF, budget=10_000).collect()
    total_alloc = sum(r["alloc_tokens"] for r in rows)
    # floor() per source loses < 1 token per source
    assert 10_000 - len(rows) <= total_alloc <= 10_000
    for r in rows:
        assert 0.0 < r["sample_rate"] <= 1.0


def test_plan_shape(spark):
    plan = (
        sampling.temperature_mixture(spark, SF)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastExchange" in plan  # 1-row totals ride a broadcast
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
