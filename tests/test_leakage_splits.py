"""Leakage-safe split assignment: near-dup components never straddle
splits, singletons reproduce the per-document assignment, and the
ratios hold.

Exact values are pinned by the driver oracle
(`sample_leakage_safe_splits`)."""

import pytest

from basenine_spark.ops import sampling

SF = "/root/testdata/sf0.01"


@pytest.fixture()
def planted(spark, tmp_path):
    """Docs 0/1/2 form one near-dup chain (0~1 and 1~2 share >40%
    trigrams); docs 10..29 are mutually unrelated singletons."""
    out = str(tmp_path / "leak_sf")
    base = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (0, base, "en", "s", len(base)),
        (1, base + " iota", "en", "s", len(base) + 5),
        (2, base + " iota kappa", "en", "s", len(base) + 11),
    ]
    for i in range(10, 30):
        text = f"u{i}a u{i}b u{i}c u{i}d u{i}e u{i}f"
        rows.append((i, text, "en", "s", len(text)))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int"
    ).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    return out


def test_component_shares_one_split(spark, planted):
    got = {r["doc_id"]: r for r in sampling.leakage_safe_splits(spark, planted).collect()}
    assert len(got) == 23  # every doc assigned
    # the planted chain is one component labeled by its min doc_id...
    assert got[0]["cluster_id"] == got[1]["cluster_id"] == got[2]["cluster_id"] == 0
    # ...and therefore shares one split
    assert got[0]["split"] == got[1]["split"] == got[2]["split"]
    # singletons keep their own id as the cluster key
    for i in range(10, 30):
        assert got[i]["cluster_id"] == i


def test_singletons_match_per_doc_assignment(spark, planted):
    """On a corpus with no near-dups at all, the cluster-keyed split
    must equal split_assign with the same salt (a singleton is its own
    component)."""
    leak = {
        r["doc_id"]: r["split"]
        for r in sampling.leakage_safe_splits(spark, planted, salt="split").collect()
        if r["doc_id"] >= 10
    }
    plain = {
        r["doc_id"]: r["split"]
        for r in sampling.split_assign(spark, planted).collect()
        if r["doc_id"] >= 10
    }
    assert leak == plain


def test_real_corpus_invariant_and_coverage(spark):
    rows = sampling.leakage_safe_splits(spark, SF).collect()
    assert len(rows) == 500
    by_cluster: dict = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_cluster.values())
    counts = {}
    for r in rows:
        counts[r["split"]] = counts.get(r["split"], 0) + 1
    # 90/5/5 target with hash noise: train strictly dominates
    assert counts["train"] > 400 and set(counts) == {"train", "val", "test"}
