"""k-NN graph: recall vs numpy brute force, degree/rank invariants,
mutual-flag correctness, determinism."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from basenine_spark.ops import similarity

SF = "/root/testdata/sf0.001"
K = 5


@pytest.fixture(scope="module")
def graph(spark):
    return similarity.knn_graph(spark, SF, k=K).collect()


@pytest.fixture(scope="module")
def exact_topk():
    t = pq.read_table(f"{SF}/embeddings.parquet")
    ids = t["vec_id"].to_numpy()
    mat = np.stack(t["embedding"].to_numpy()).astype(np.float64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0.0] = 1.0
    unit = mat / norms[:, None]
    sims = np.round(unit @ unit.T, 4)
    out = {}
    for i, vid in enumerate(ids):
        order = sorted(
            (int(ids[j]) for j in range(len(ids)) if j != i),
            key=lambda d: (-sims[i, np.where(ids == d)[0][0]], d),
        )
        out[int(vid)] = order[:K]
    return out


def test_degree_and_rank_invariants(graph):
    by_src: dict = {}
    for r in graph:
        by_src.setdefault(r["src"], []).append(r["rank"])
    for src, ranks in by_src.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= K


def test_recall_vs_brute_force(graph, exact_topk):
    approx: dict = {}
    for r in graph:
        approx.setdefault(r["src"], set()).add(r["dst"])
    hits = total = 0
    for src, exact in exact_topk.items():
        got = approx.get(src, set())
        hits += len(got & set(exact))
        total += len(exact)
    assert total > 0
    recall = hits / total
    assert recall >= 0.7, f"knn_graph recall {recall:.3f} < 0.7"


def test_mutual_flag_is_reverse_edge_membership(graph):
    edges = {(r["src"], r["dst"]) for r in graph}
    for r in graph:
        assert r["mutual"] == ((r["dst"], r["src"]) in edges)


def test_mutual_edges_exist_both_ways(graph):
    mut = [(r["src"], r["dst"]) for r in graph if r["mutual"]]
    assert mut, "expected at least one mutual edge on the label corpus"
    edges = {(r["src"], r["dst"]) for r in graph}
    for s, d in mut:
        assert (d, s) in edges


def test_deterministic(spark, graph):
    again = similarity.knn_graph(spark, SF, k=K).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, graph))


def test_gemm_scorer_equals_hof_scorer(spark):
    """The round-14 BLAS scorer must reproduce the round-10 HOF
    pair-join plan EXACTLY — every (src, dst, rank, mutual) edge and
    every stable-rounded sim bit-for-bit. The HOF plan sums dots in
    the same sequential order as the DuckDB oracle, so this
    differential IS the guard that BLAS pairwise summation (≤3.4e-16
    divergence) stays inside the ≥2.7e-12 margin to the nearest
    4-decimal rounding boundary on this corpus."""
    gemm = sorted(
        map(tuple, similarity.knn_graph_exact(spark, SF, k=K).collect())
    )
    hof = sorted(
        map(
            tuple,
            similarity.knn_graph_exact(
                spark, SF, k=K, scorer="hof"
            ).collect(),
        )
    )
    assert gemm == hof


def test_exact_twin_matches_numpy_ground_truth(spark, exact_topk):
    """knn_graph_exact (round 10, full driver oracle) must equal the
    numpy brute-force ground truth EXACTLY — same neighbors, same
    ranks — and its mutual flag must be reverse-edge membership."""
    rows = similarity.knn_graph_exact(spark, SF, k=K).collect()
    got = {}
    for r in rows:
        got.setdefault(r["src"], []).append((r["rank"], r["dst"]))
    for src, pairs in got.items():
        ordered = [d for _, d in sorted(pairs)]
        assert ordered == exact_topk[src], f"src {src}"
    edge_set = {(r["src"], r["dst"]) for r in rows}
    for r in rows:
        assert r["mutual"] == ((r["dst"], r["src"]) in edge_set)


def test_lsh_recall_vs_exact_twin(spark, graph):
    """The approximate path's recall floor, measured against the
    driver-verified exact twin instead of ad-hoc numpy."""
    exact = similarity.knn_graph_exact(spark, SF, k=K).collect()
    truth = {}
    for r in exact:
        truth.setdefault(r["src"], set()).add(r["dst"])
    hits = total = 0
    for src, dsts in truth.items():
        got = {r["dst"] for r in graph if r["src"] == src}
        hits += len(got & dsts)
        total += len(dsts)
    assert hits / total >= 0.8


def test_occupancy_bits_default_rule():
    """Round-14 (VERDICT r13 #3): the production default is
    occupancy-constant — bits grow with the corpus so the bucketed
    candidate join stays ~linear. The rule must (a) reproduce the
    long-pinned bits=5 at every test SF, keeping fingerprints and
    recall floors comparable, and (b) grow +log2 with N above the
    target-occupancy knee."""
    f = similarity._occupancy_bits
    # every fixed test corpus lands on the historical default
    for n in (500, 500, 2000):  # sf0.001 / sf0.01 / sf0.1 embeddings
        assert f(n) == 5, n
    # knee at target_occupancy * 2^5 = 2048; +1 bit per doubling after
    assert f(2048) == 5
    assert f(2049) == 6
    assert f(20_000) == 9  # the emb10 probe corpus
    assert f(200_000) == 12
    assert f(2_000_000) == 15
    assert f(0) == 5 and f(-1) == 5  # degenerate corpora stay at floor


def test_knn_graph_default_equals_explicit_bits5_at_dev_scale(spark):
    """The auto default must be BEHAVIOR-IDENTICAL to the historical
    bits=5 at dev scale (2000 vectors and below) — this is what keeps
    every committed fingerprint/recall pin valid under the new
    default."""
    auto = similarity.knn_graph(spark, SF, k=K).collect()
    fixed = similarity.knn_graph(spark, SF, k=K, bits=5).collect()
    key = lambda r: (r["src"], r["rank"])
    assert sorted(map(tuple, auto), key=lambda t: (t[0], t[3])) == sorted(
        map(tuple, fixed), key=lambda t: (t[0], t[3])
    )
