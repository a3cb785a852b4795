"""Cluster density/transitivity diagnostics: planted triangle vs
chain, and the orientation's exactness.

Exact values are pinned by the driver oracle (`dedup_cluster_density`).
"""

import pytest

from basenine_spark.ops import dedup

SF = "/root/testdata/sf0.01"


@pytest.fixture()
def planted(spark, tmp_path):
    """One triangle community (docs 0/1/2 mutually high trigram
    Jaccard) and one chain (10~11 and 11~12 at J≈0.27 — above the
    test's 0.25 threshold — while 10 and 12 share zero grams)."""
    out = str(tmp_path / "dens_sf")
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (0, base, "en", "s", len(base)),
        (1, base + " mu", "en", "s", len(base) + 3),
        (2, base + " nu", "en", "s", len(base) + 3),
        # chain: B shares half its grams with A and half with C
        (10, "p1 p2 p3 p4 p5 p6 p7 p8", "en", "s", 23),
        (11, "p1 p2 p3 p4 p5 q4 q5 q6 q7 q8", "en", "s", 29),
        (12, "q4 q5 q6 q7 q8 q9 qa qb", "en", "s", 23),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int"
    ).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    return out


def test_triangle_vs_chain(spark, planted):
    got = {
        r["cluster_id"]: r
        for r in dedup.cluster_density_stats(
            spark, planted, threshold=0.25
        ).collect()
    }
    tri = got[0]
    assert tri["n_nodes"] == 3 and tri["n_edges"] == 3
    assert tri["n_wedges"] == 3 and tri["n_triangles"] == 1
    assert tri["transitivity"] == 1.0
    chain = got[10]
    assert chain["n_nodes"] == 3 and chain["n_edges"] == 2
    assert chain["n_wedges"] == 1 and chain["n_triangles"] == 0
    assert chain["transitivity"] == 0.0


def test_real_corpus_invariants(spark):
    rows = dedup.cluster_density_stats(spark, SF).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["n_nodes"] >= 2
        # connected: at least a spanning tree
        assert r["n_edges"] >= r["n_nodes"] - 1
        # triangles bounded by wedge closures
        assert 3 * r["n_triangles"] <= max(r["n_wedges"], 0) or (
            r["n_wedges"] == 0 and r["n_triangles"] == 0
        )
        if r["transitivity"] is not None:
            assert 0.0 <= r["transitivity"] <= 1.0


def test_plan_no_python_no_cartesian(spark):
    plan = (
        dedup.cluster_density_stats(spark, SF)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
