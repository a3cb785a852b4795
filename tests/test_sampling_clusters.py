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


def test_token_mixture_matches_duckdb_and_hits_token_targets(spark):
    """Token-weighted mixture: the selection hash-matches a DuckDB
    replay of the same expression sequence (the pytest stand-in for a
    driver oracle), and each source's sampled token mass lands near its
    target share."""
    import duckdb

    from basenine_spark.ops.sampling import token_mixture_sample

    sf = "/root/testdata/sf0.01"
    out = token_mixture_sample(spark, sf).collect()
    got = sorted((r["doc_id"], r["source"], r["n_tokens"]) for r in out)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    rows = con.execute(
        """
        WITH d AS (
          SELECT doc_id, source,
                 len(string_split(text, ' '))::BIGINT AS n_tokens
          FROM documents WHERE text IS NOT NULL
        ), t AS (
          SELECT source, CAST(sum(n_tokens) AS DOUBLE) AS t_src FROM d GROUP BY source
        ), thr AS (
          SELECT source,
                 CASE WHEN CAST(CASE source
                        WHEN 'src0' THEN 10000.0
                        WHEN 'src1' THEN 5000.0
                        WHEN 'src2' THEN 2500.0
                        ELSE 1250.0 END AS DOUBLE) / t_src >= 1 THEN 'g'
                      ELSE printf('%08x', CAST(floor(
                        CAST(CASE source
                          WHEN 'src0' THEN 10000.0
                          WHEN 'src1' THEN 5000.0
                          WHEN 'src2' THEN 2500.0
                          ELSE 1250.0 END AS DOUBLE) / t_src
                        * CAST(4294967296.0 AS DOUBLE)) AS BIGINT))
                 END AS mix_thr
          FROM t
        )
        SELECT d.doc_id, d.source, d.n_tokens
        FROM d JOIN thr USING (source)
        WHERE substring(md5('tokmix' || CAST(d.doc_id AS VARCHAR)), 1, 8)
              < thr.mix_thr
        ORDER BY d.doc_id
        """
    ).fetchall()
    con.close()
    assert got == sorted((int(a), b, int(c)) for a, b, c in rows)

    # token-mass sanity: each sampled source lands within 50% of
    # min(target, available) — a source with fewer total tokens than
    # its target clamps at rate 1 and contributes everything it has
    # (Bernoulli variance at sf0.01 is wide; the driver-scale check is
    # the cross-engine identity above)
    from collections import defaultdict

    mass = defaultdict(int)
    avail = defaultdict(int)
    for r in spark.read.parquet(f"{sf}/documents.parquet").collect():
        if r["text"] is not None:
            avail[r["source"]] += len(r["text"].split(" "))
    for _, src, n in got:
        mass[src] += n
    targets = {"src0": 10000, "src1": 5000, "src2": 2500}
    for src, target in targets.items():
        expected = min(target, avail[src])
        assert 0.5 * expected < mass[src] <= 1.5 * expected


def test_split_assign_disjoint_exhaustive_and_engine_stable(spark):
    """Train/val/test assignment: exhaustive (every doc labeled),
    ratio-plausible, stable when the corpus grows (sf0.001 ⊂ sf0.01
    label agreement on shared ids is what makes splits leak-proof),
    and identical to the DuckDB replay."""
    import duckdb

    from basenine_spark.ops.sampling import split_assign

    out = split_assign(spark, "/root/testdata/sf0.01").collect()
    labels = {r["doc_id"]: r["split"] for r in out}
    assert len(labels) == 500 and all(v is not None for v in labels.values())
    from collections import Counter

    c = Counter(labels.values())
    assert 0.8 < c["train"] / 500 < 0.97
    assert c["val"] > 0 and c["test"] > 0

    # growth stability: the sf0.001 corpus is the same id space — every
    # shared id keeps its label
    small = {
        r["doc_id"]: r["split"]
        for r in split_assign(spark, "/root/testdata/sf0.001").collect()
    }
    assert all(labels[k] == v for k, v in small.items())

    con = duckdb.connect()
    rows = con.execute(
        """
        SELECT doc_id,
               CASE
                 WHEN substring(md5('split' || CAST(doc_id AS VARCHAR)), 1, 8)
                      < printf('%08x', CAST(floor(0.9 * 4294967296.0) AS BIGINT))
                   THEN 'train'
                 WHEN substring(md5('split' || CAST(doc_id AS VARCHAR)), 1, 8)
                      < printf('%08x', CAST(floor(0.95 * 4294967296.0) AS BIGINT))
                   THEN 'val'
                 ELSE 'test'
               END AS split
        FROM '/root/testdata/sf0.01/documents.parquet'
        """
    ).fetchall()
    con.close()
    assert {int(a): b for a, b in rows} == labels
