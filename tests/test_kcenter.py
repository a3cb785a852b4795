"""Greedy k-center (farthest-point-first) coreset selection: planted
cluster coverage, determinism, non-increasing selection distances, and
the map-only per-round plan shape."""

from basenine_spark.ops import similarity

SF = "/root/testdata/sf0.001"


def _planted(spark, tmp_path):
    """Three tight, mutually-far clusters on orthogonal axes + the
    seed's cluster: greedy k=3 must pick one point from each cluster."""
    out = str(tmp_path / "kc_sf")
    rows = []
    # cluster A around e0 (contains the seed vec_id 0)
    for i in range(4):
        rows.append((i, [1.0, 0.01 * i, 0.0, 0.0], 0))
    # cluster B around e1
    for i in range(4):
        rows.append((10 + i, [0.01 * i, 1.0, 0.0, 0.0], 1))
    # cluster C around e2
    for i in range(4):
        rows.append((20 + i, [0.0, 0.01 * i, 1.0, 0.0], 2))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(f"{out}/embeddings.parquet")
    return out


def test_covers_planted_clusters(spark, tmp_path):
    sf = _planted(spark, tmp_path)
    sel = similarity.kcenter_coreset(spark, sf, k=3).collect()
    assert [r["sel_rank"] for r in sel] == [1, 2, 3]
    picked = {r["vec_id"] for r in sel}
    assert 0 in picked  # deterministic seed = min vec_id
    clusters = {v // 10 for v in picked}
    assert clusters == {0, 1, 2}, f"one center per cluster, got {picked}"


def test_selection_distances_non_increasing(spark):
    sel = similarity.kcenter_coreset(spark, SF, k=8).collect()
    dists = [r["sel_dist"] for r in sel if r["sel_dist"] is not None]
    assert all(a >= b for a, b in zip(dists, dists[1:])), dists
    assert all(d >= 0.0 for d in dists)


def test_deterministic_across_runs(spark):
    a = [tuple(r) for r in similarity.kcenter_coreset(spark, SF, k=6).collect()]
    b = [tuple(r) for r in similarity.kcenter_coreset(spark, SF, k=6).collect()]
    assert a == b


def test_k_exceeding_corpus_truncates(spark, tmp_path):
    sf = _planted(spark, tmp_path)
    sel = similarity.kcenter_coreset(spark, sf, k=100).collect()
    assert len(sel) == 12  # every point selected once, then stops
    assert len({r["vec_id"] for r in sel}) == 12
