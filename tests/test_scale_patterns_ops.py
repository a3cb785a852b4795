"""Round-4 scale-pattern operators: skew-salted join, shard-export
manifest, mixture sampling.

The driver oracle pins sf0.01 end-to-end values (`join_salted_skew`,
`pipeline_shards`, `sample_mixture`); these tests pin the semantic
invariants the oracle can't see — salting changes no result, shard
assignment is a partition of the corpus, mixture rates clamp — plus
the plan shapes that carry the 100 TB story.
"""

import pytest
from pyspark.sql import functions as F

from basenine_spark.ops import pipeline, relational, sampling
from basenine_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# -- salted join ------------------------------------------------------------


def test_salted_join_matches_plain_join(spark):
    """Salting must be result-invariant: every fact row joins exactly
    once (its own salt), every dim row exists at every salt."""
    salted = {
        r["o_orderstatus"]: (r["revenue"], r["n_items"])
        for r in relational.salted_revenue_by_status(spark, SF).collect()
    }
    lineitem = load_table(spark, SF, "lineitem")
    orders = load_table(spark, SF, "orders")
    plain = {
        r["o_orderstatus"]: (r["revenue"], r["n_items"])
        for r in lineitem.join(
            orders, lineitem["l_orderkey"] == orders["o_orderkey"]
        )
        .groupBy("o_orderstatus")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .collect()
    }
    assert salted == plain


def test_salted_join_spreads_keys(spark):
    """The join key is (key, salt): a single hot orderkey's rows hash
    to up to B distinct reducer keys."""
    lineitem = load_table(spark, SF, "lineitem")
    b = 8
    salts = (
        lineitem.select(
            "l_orderkey",
            F.pmod(F.col("l_linenumber"), F.lit(b)).alias("salt"),
        )
        .groupBy("l_orderkey")
        .agg(F.countDistinct("salt").alias("n_salts"))
        .agg(F.max("n_salts").alias("mx"))
        .head()["mx"]
    )
    assert salts > 1  # multi-line orders really do fan out over salts


def test_salted_join_no_cartesian(spark):
    plan = _plan(relational.salted_revenue_by_status(spark, SF))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


# -- shard manifest ---------------------------------------------------------


def test_shard_manifest_is_a_partition(spark):
    docs = load_table(spark, SF, "documents")
    total = docs.count()
    m = pipeline.shard_manifest(spark, SF).collect()
    assert sum(r["n_docs"] for r in m) == total
    assert {r["shard_id"] for r in m} <= set(range(16))
    for r in m:
        assert r["min_doc_id"] <= r["max_doc_id"]


def test_shard_assignment_stable_under_appends(spark):
    """Adding documents never moves existing ones: assignment depends
    only on doc_id, so a half-corpus run and a full-corpus run agree
    on the overlap (the manifest invariant that makes incremental
    export possible)."""
    docs = load_table(spark, SF, "documents")
    shard_expr = F.expr(
        "instr('0123456789abcdef',"
        " substring(md5(concat('shard:', cast(doc_id as string))), 1, 1)) - 1"
    )
    full = {
        r["doc_id"]: r["s"]
        for r in docs.select("doc_id", shard_expr.alias("s")).collect()
    }
    half = {
        r["doc_id"]: r["s"]
        for r in docs.filter(F.col("doc_id") % 2 == 0)
        .select("doc_id", shard_expr.alias("s"))
        .collect()
    }
    assert all(full[k] == v for k, v in half.items())


# -- mixture sampling -------------------------------------------------------


def test_mixture_clamps_and_deterministic(spark):
    got = sampling.mixture_sample(spark, SF).collect()
    again = sampling.mixture_sample(spark, SF).collect()
    assert sorted(r["doc_id"] for r in got) == sorted(
        r["doc_id"] for r in again
    )
    docs = load_table(spark, SF, "documents")
    n_src0 = docs.filter(F.col("source") == "src0").count()
    kept_src0 = sum(1 for r in got if r["source"] == "src0")
    # target 50 > n_src0 at sf0.001 → rate clamps to 1, keep all
    assert kept_src0 == n_src0


def test_mixture_rate_tracks_target(spark):
    """An unclamped source keeps ≈ rate * n docs (hash thresholding is
    Bernoulli per doc; tolerance is loose on a tiny table)."""
    docs = load_table(spark, SF, "documents")
    weights = {"src0": 0.25}
    budget = 40  # target 10 of src0's 25+ docs → rate < 1
    n_src0 = docs.filter(F.col("source") == "src0").count()
    rate = min(1.0, (budget * 0.25) / n_src0)
    if rate >= 1:
        pytest.skip("sf too small for an unclamped rate")
    kept = (
        sampling.mixture_sample(spark, SF, weights=weights, budget=budget)
        .filter(F.col("source") == "src0")
        .count()
    )
    assert kept <= n_src0
    # binomial(n, rate): allow ±4σ
    import math

    sigma = math.sqrt(n_src0 * rate * (1 - rate))
    assert abs(kept - n_src0 * rate) <= 4 * sigma + 1


def test_mixture_fact_scan_is_map_only(spark):
    """Static-weight mixture must be join-free and shuffle-free: the
    thresholds fold driver-side into a literal CASE, so the fact scan
    is one map-only stage (the r4→r5 plan restoration)."""
    plan = _plan(sampling.mixture_sample(spark, SF))
    assert "Join" not in plan, plan
    assert "Exchange" not in plan, plan


def test_mixture_static_and_dynamic_paths_agree(spark):
    """The folded-CASE static path and the lazy broadcast-join dynamic
    path must pick exactly the same rows (identical IEEE threshold
    arithmetic)."""
    docs = load_table(spark, SF, "documents")
    dynamic = {
        (r["doc_id"], r["source"])
        for r in sampling.mixture_filter(
            docs, None, 0.03125, 200, "mix"
        ).select("doc_id", "source").collect()
    }
    static = {
        (r["doc_id"], r["source"])
        for r in sampling.mixture_sample(spark, SF).collect()
    }
    assert static == dynamic and static


# -- quality-quantile filter ------------------------------------------------


def test_quality_topk_keeps_best_half_per_source(spark):
    docs = load_table(spark, SF, "documents")
    kept = sampling.quality_quantile_filter(spark, SF).collect()
    per_source_total = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    from collections import Counter

    per_source_kept = Counter(r["source"] for r in kept)
    for src, n in per_source_total.items():
        # percent_rank <= 0.5 keeps ceil((n-1)*0.5)+1 rows of n
        assert per_source_kept[src] == (n - 1) // 2 + 1
    # kept docs have the lowest stopword ratios of their source
    worst_kept = max(r["q_ratio"] for r in kept)
    assert worst_kept <= 1.0


def test_quality_topk_single_shuffle(spark):
    plan = sampling.quality_quantile_filter(
        spark, SF
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan


# -- LSH clustering ---------------------------------------------------------


def test_lsh_clusters_agree_with_exact_on_found_components(spark):
    """LSH clustering may miss edges (recall), but any cluster it does
    form must be a subset-consistent view of the exact clustering:
    two docs the LSH path groups together are near-dups in the exact
    graph's transitive closure too (no false merges beyond verify)."""
    from basenine_spark.ops import dedup

    exact = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.duplicate_clusters(spark, SF, threshold=0.5).collect()
    }
    lsh = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.duplicate_clusters_lsh(
            spark, SF, threshold=0.5
        ).collect()
    }
    by_cluster = {}
    for doc, c in lsh.items():
        by_cluster.setdefault(c, []).append(doc)
    for members in by_cluster.values():
        exact_labels = {exact.get(d) for d in members}
        # all members exist in the exact clustering and share one label
        assert None not in exact_labels and len(exact_labels) == 1


# -- table profiler ---------------------------------------------------------


def test_profile_exact_counts(spark):
    rows = {
        r["column_name"]: r
        for r in relational.profile_table(spark, SF, "orders").collect()
    }
    orders = load_table(spark, SF, "orders")
    n = orders.count()
    assert set(rows) == set(orders.columns)
    for r in rows.values():
        assert r["n_rows"] == n and r["n_nulls"] == 0
    assert rows["o_orderkey"]["n_distinct"] == n  # primary key
    assert rows["o_orderstatus"]["n_distinct"] <= 3


def test_profile_hll_within_error(spark):
    exact = {
        r["column_name"]: r["n_distinct"]
        for r in relational.profile_table(spark, SF, "orders").collect()
    }
    approx = {
        r["column_name"]: r["n_distinct"]
        for r in relational.profile_table(
            spark, SF, "orders", exact=False
        ).collect()
    }
    for c, d in exact.items():
        assert abs(approx[c] - d) <= max(2, 0.1 * d), (c, approx[c], d)


# -- bucketed co-located join -----------------------------------------------


def test_bucketed_join_has_no_shuffle_below_join(spark):
    """Both sides bucketed on the join key: the SortMergeJoin consumes
    bucket files directly — zero Exchange below the join; the only
    exchange left is the final aggregation."""
    try:
        df = relational.bucketed_revenue_join(spark, SF)
        plan = _plan(df)
        m = plan.find("SortMergeJoin")
        assert m != -1, plan
        # no Exchange anywhere below the join node in the plan text
        below = plan[m:]
        assert "Exchange hashpartitioning" not in below, below
        # and the values equal the salted/plain join's
        got = {r["o_orderstatus"]: (r["revenue"], r["n_items"]) for r in df.collect()}
        plain = {
            r["o_orderstatus"]: (r["revenue"], r["n_items"])
            for r in relational.salted_revenue_by_status(spark, SF).collect()
        }
        assert got == plain
    finally:
        import os

        pid = os.getpid()
        spark.sql(f"DROP TABLE IF EXISTS bn_bkt_orders_p{pid}")
        spark.sql(f"DROP TABLE IF EXISTS bn_bkt_lineitem_p{pid}")


def test_quality_topk_approximate_tracks_exact(spark):
    """The sketch-threshold path keeps ≈ the same set as the exact rank
    path (boundary rank error only) and its plan has NO per-source
    window sort."""
    exact = {
        r["doc_id"]
        for r in sampling.quality_quantile_filter(spark, SF).collect()
    }
    approx = {
        r["doc_id"]
        for r in sampling.quality_quantile_filter(
            spark, SF, approximate=True
        ).collect()
    }
    overlap = len(exact & approx) / max(len(exact), 1)
    assert overlap >= 0.9, overlap
    plan = _plan(
        sampling.quality_quantile_filter(spark, SF, approximate=True)
    )
    assert "Window" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


# -- sampling nestedness (the incremental-release property) -----------------


def test_deterministic_sample_nested_across_rates(spark):
    """Hash-threshold selection is monotone: raising the rate only ADDs
    documents — a release sampled at 20% is a strict subset of the same
    corpus sampled at 40%. This is the property that makes growing a
    dataset release incremental instead of a reshuffle."""
    docs = load_table(spark, SF, "documents")
    small = {
        r["doc_id"]
        for r in sampling.deterministic_sample(docs, "doc_id", 0.2).collect()
    }
    big = {
        r["doc_id"]
        for r in sampling.deterministic_sample(docs, "doc_id", 0.4).collect()
    }
    assert small <= big and len(small) < len(big)


def test_mixture_sample_nested_across_budgets(spark):
    """Same monotonicity through the mixture path: a bigger budget
    raises every per-source rate, so the smaller release is contained
    in the larger."""
    a = {
        r["doc_id"]
        for r in sampling.mixture_sample(spark, SF, budget=100).collect()
    }
    b = {
        r["doc_id"]
        for r in sampling.mixture_sample(spark, SF, budget=300).collect()
    }
    assert a <= b


def test_rate_threshold_monotone_property():
    """Pure property (no Spark): the hex threshold is monotone in the
    rate and stays an 8-char lowercase-hex string below 1.0 — the
    invariants every sampling op's portability rests on."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from basenine_spark.ops.sampling import rate_to_hex_threshold

    @settings(max_examples=300, deadline=None)
    @given(
        st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
        st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
    )
    def check(a, b):
        ta, tb = rate_to_hex_threshold(a), rate_to_hex_threshold(b)
        if a <= b:
            assert ta <= tb
        if a < 1.0:
            assert len(ta) == 8 and all(c in "0123456789abcdef" for c in ta)
        else:
            assert ta == "g"

    check()


# -- PPJoin exactness on adversarial boilerplate ----------------------------


def test_ppjoin_exact_on_boilerplate_corpus(spark, tmp_path):
    """Crawl-regime adversary: many documents share a long boilerplate
    prefix (ultra-frequent shingles) but only some pairs cross the
    Jaccard threshold. PPJoin's prefix filter must keep EXACTLY the
    brute-force pair set — rare-shingle indexing prunes candidates, not
    results."""
    import itertools

    import pyarrow as pa
    import pyarrow.parquet as pq

    from basenine_spark.ops import dedup

    boiler = " ".join(f"b{i}" for i in range(30))
    texts = []
    for g in range(6):  # 6 groups × 5 near-identical docs
        base = " ".join(f"g{g}w{i}" for i in range(20))
        for v in range(5):
            texts.append(f"{boiler} {base} v{v}")
    for j in range(30):  # 30 boilerplate-only docs, mutually dissimilar tails
        tail = " ".join(f"u{j}x{i}" for i in range(40))
        texts.append(f"{boiler} {tail}")
    table = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts), pa.string()),
            "source": pa.array(["s"] * len(texts), pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(table, str(tmp_path / "documents.parquet"))

    n, thr = 3, 0.4

    def shingles(t):
        toks = t.split(" ")
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    sets = [shingles(t) for t in texts]
    expect = set()
    for a, b in itertools.combinations(range(len(texts)), 2):
        inter = len(sets[a] & sets[b])
        if inter / (len(sets[a]) + len(sets[b]) - inter) >= thr:
            expect.add((a, b))
    assert expect  # the within-group pairs really exist

    got = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.ngram_jaccard_pairs(
            spark, str(tmp_path), n=n, threshold=thr
        ).collect()
    }
    assert got == expect


def test_connected_components_chain_topology(spark):
    """A linear chain a-b-c-…-j (only adjacent pairs connected) must
    collapse to ONE component labeled by the minimum id — the
    propagation loop really iterates to the fixpoint instead of
    stopping after one hop."""
    from basenine_spark.ops.dedup import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], "doc_a long, doc_b long"
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(edges, max_iter=20).collect()
    }
    assert got == {i: 0 for i in range(11)}


def test_connected_components_two_components(spark):
    from basenine_spark.ops.dedup import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long"
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_connected_components_paths_agree(spark):
    """The driver union-find fast path (small counted graphs) and the
    distributed min-label loop must emit identical components; the
    distributed path is forced with driver_max_edges=0."""
    from basenine_spark.ops.dedup import connected_components

    edge_list = (
        [(i, i + 1) for i in range(0, 12)]  # chain
        + [(100, 103), (101, 103), (102, 103)]  # star, min inside
        + [(200, 201)]
    )
    edges = spark.createDataFrame(edge_list, "doc_a long, doc_b long")
    fast = {
        (r["doc_id"], r["cluster_id"])
        for r in connected_components(edges, max_iter=20).collect()
    }
    dist = {
        (r["doc_id"], r["cluster_id"])
        for r in connected_components(
            edges, max_iter=20, driver_max_edges=0
        ).collect()
    }
    assert fast == dist and fast


def test_connected_components_random_graphs_paths_agree(spark):
    """Round 13 (pointer jump landed): seeded-random graphs — mixed
    chains, stars, cliques, isolated pairs — must produce identical
    components on the driver union-find and the forced-distributed
    prop+jump path."""
    import random

    from basenine_spark.ops.dedup import connected_components

    for seed in (7, 23, 91):
        rng = random.Random(seed)
        n = 120
        edges_list = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(150)
        ]
        edges_list = [(a, b) for a, b in edges_list if a != b]
        edges = spark.createDataFrame(
            edges_list, "doc_a long, doc_b long"
        )
        fast = {
            (r["doc_id"], r["cluster_id"])
            for r in connected_components(edges, max_iter=20).collect()
        }
        dist = {
            (r["doc_id"], r["cluster_id"])
            for r in connected_components(
                edges, max_iter=20, driver_max_edges=0
            ).collect()
        }
        assert fast == dist and fast, f"seed {seed}"


def test_connected_components_pointer_jump_log_rounds(spark):
    """Round 13: pointer jumping makes the distributed path converge
    in O(log diameter) rounds — a 512-node chain (diameter 511, the
    worst case for pure propagation, which would need 511 rounds and
    here would exhaust max_iter) must collapse to one component
    within ~log2(512)+slack rounds."""
    from basenine_spark.ops.dedup import connected_components

    n = 512
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    stats: dict = {}
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(
            edges, max_iter=14, driver_max_edges=0, stats=stats
        ).collect()
    }
    assert got == {i: 0 for i in range(n)}
    # prop+jump reach grows ~2.4x/round (1 hop + doubling); 9 rounds
    # of pure doubling cover 512 — allow slack but pin the order
    assert 1 <= stats["rounds"] <= 12, stats


def test_exact_dedup_excludes_null_text(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from basenine_spark.ops import dedup

    table = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(["same", "same", None, None], pa.string()),
            "lang": pa.array(["en"] * 4, pa.string()),
            "source": pa.array(["s"] * 4, pa.string()),
            "n_chars": pa.array([4, 4, 0, 0], pa.int64()),
        }
    )
    pq.write_table(table, str(tmp_path / "documents.parquet"))
    rows = dedup.exact_dedup(spark, str(tmp_path)).collect()
    # one group for "same"; null-text docs are NOT merged into a group
    assert len(rows) == 1 and rows[0]["doc_id"] == 0 and rows[0]["dup_cnt"] == 2


# -- sessionize gap-boundary edges ------------------------------------------


def test_sessionize_gap_boundary_and_ties(spark, tmp_path):
    """Exactly-at-gap stays in the session (break requires STRICTLY
    greater than the gap, matching the oracle's `> 1800000`);
    simultaneous events share a session regardless of event_id order."""
    import json as _json

    import pyarrow as pa
    import pyarrow.parquet as pq

    gap_ms = 30 * 60_000
    rows = [
        # user 1: e0, e1 exactly gap apart (same session), e2 gap+1 later (new)
        (0, 0, 1),
        (1, gap_ms, 1),
        (2, 2 * gap_ms + 1, 1),
        # user 2: three simultaneous events → one session of 3
        (3, 500, 2),
        (4, 500, 2),
        (5, 500, 2),
    ]
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] * 1000 for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array(["click"] * len(rows), pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array([_json.dumps({})] * len(rows), pa.string()),
        }
    )
    pq.write_table(table, str(tmp_path / "events.parquet"))
    got = {
        (r["user_id"], r["session_no"]): (
            r["session_start_ms"],
            r["session_end_ms"],
            r["n_events"],
        )
        for r in relational.sessionize(spark, str(tmp_path)).collect()
    }
    assert got[(1, 0)] == (0, gap_ms, 2)  # boundary event stayed
    assert got[(1, 1)] == (2 * gap_ms + 1, 2 * gap_ms + 1, 1)
    assert got[(2, 0)] == (500, 500, 3)
    assert len(got) == 3
