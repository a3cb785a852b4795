"""Deterministic sampling + duplicate clustering (round-3 extension ops)."""

from basenine_spark.ops import dedup, sampling

SF = "/root/testdata/sf0.01"


def test_deterministic_sample_is_stable(spark):
    a = sorted(
        r["doc_id"] for r in sampling.stratified_sample(spark, SF).collect()
    )
    b = sorted(
        r["doc_id"] for r in sampling.stratified_sample(spark, SF).collect()
    )
    assert a == b and len(a) > 0


def test_stratified_rates_hold(spark):
    rows = sampling.stratified_sample(spark, SF).collect()
    by_src = {}
    for r in rows:
        by_src[r["source"]] = by_src.get(r["source"], 0) + 1
    # 25 docs per source at sf0.01; hash sampling is Bernoulli so allow
    # wide tolerance but the ordering of configured rates must show
    assert by_src.get("src0", 0) > by_src.get("src1", 0)  # 0.8 vs 0.25
    assert by_src.get("src0", 0) >= by_src.get("src2", 0)  # 0.8 vs 0.5


def test_rate_edges():
    assert sampling.rate_to_hex_threshold(0.0) == "00000000"
    assert sampling.rate_to_hex_threshold(1.0) == "g"  # above all hex


def test_duplicate_clusters_match_union_find(spark):
    pairs = [
        (r["doc_a"], r["doc_b"])
        for r in dedup.ngram_jaccard_pairs(spark, SF, n=3, threshold=0.4)
        .select("doc_a", "doc_b")
        .collect()
    ]
    assert pairs  # planted near-dups exist at sf0.01

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {}
    for node in parent:
        root = find(node)
        expected[node] = min(expected.get(root, root), root)
        # min label == root because union always keeps the smaller id
    expected = {n: find(n) for n in parent}

    got = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.duplicate_clusters(spark, SF).collect()
    }
    assert got == expected
