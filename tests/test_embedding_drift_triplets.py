"""Embedding drift (DuckDB differential + planted-shift golden) and
contrastive triplet mining (determinism, exclusion rules, margin)."""

import json

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from basenine_spark.ops import similarity

SF = "/root/testdata/sf0.001"
SF_BIG = "/root/testdata/sf0.01"


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(json.dumps([repr(row[i]) for i in order]) for row in rows)


def test_drift_matches_duckdb(spark):
    import duckdb

    sdf = similarity.embedding_drift(spark, SF, SF_BIG)
    srows = [tuple(r) for r in sdf.collect()]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW ref AS SELECT * FROM '{SF}/embeddings.parquet'")
    con.execute(
        f"CREATE VIEW cur AS SELECT * FROM '{SF_BIG}/embeddings.parquet'"
    )
    cur = con.execute(
        """
        WITH rstats AS (
          SELECT dim, FLOOR(avg(val) * 10000.0 + 0.5) / 10000.0 AS mean_ref,
                 FLOOR(stddev_pop(val) * 10000.0 + 0.5) / 10000.0 AS std_ref
          FROM (
            SELECT unnest(generate_series(1, len(embedding))) - 1 AS dim,
                   unnest(embedding) AS val
            FROM ref
          ) GROUP BY dim
        ), cstats AS (
          SELECT dim, FLOOR(avg(val) * 10000.0 + 0.5) / 10000.0 AS mean_cur,
                 FLOOR(stddev_pop(val) * 10000.0 + 0.5) / 10000.0 AS std_cur
          FROM (
            SELECT unnest(generate_series(1, len(embedding))) - 1 AS dim,
                   unnest(embedding) AS val
            FROM cur
          ) GROUP BY dim
        )
        SELECT dim, mean_ref, mean_cur,
               FLOOR((mean_cur - mean_ref) * 10000.0 + 0.5) / 10000.0 AS mean_delta,
               std_ref, std_cur
        FROM rstats JOIN cstats USING (dim)
        """
    )
    dcols = [d[0] for d in cur.description]
    drows = cur.fetchall()
    con.close()
    assert sorted(sdf.columns) == sorted(dcols)
    assert len(srows) == len(drows) == 64
    assert _canon(srows, sdf.columns) == _canon(drows, dcols)


def test_drift_detects_planted_shift(spark, tmp_path):
    rng = np.random.default_rng(3)
    base = rng.normal(0, 1, (200, 8)).astype(np.float32)
    shifted = base.copy()
    shifted[:, 2] += 5.0  # plant a mean shift in dim 2
    for name, mat in (("a", base), ("b", shifted)):
        d = tmp_path / name
        d.mkdir()
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array(range(len(mat)), pa.int64()),
                    "embedding": pa.array(
                        [list(map(float, v)) for v in mat],
                        pa.list_(pa.float32()),
                    ),
                    "label": pa.array([0] * len(mat), pa.int32()),
                }
            ),
            d / "embeddings.parquet",
        )
    rows = {
        r["dim"]: r
        for r in similarity.embedding_drift(
            spark, str(tmp_path / "a"), str(tmp_path / "b")
        ).collect()
    }
    assert rows[2]["mean_delta"] == pytest.approx(5.0, abs=0.01)
    for d in range(8):
        if d != 2:
            assert abs(rows[d]["mean_delta"]) < 0.01


@pytest.fixture(scope="module")
def triplets(spark):
    return similarity.contrastive_triplets(spark, SF).collect()


def test_triplets_deterministic(spark, triplets):
    again = similarity.contrastive_triplets(spark, SF).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, triplets))


def test_triplet_exclusion_rules(spark, triplets):
    edges = {
        (r["src"], r["dst"])
        for r in similarity.knn_graph(spark, SF, k=3).collect()
    }
    assert len(triplets) > 100
    for t in triplets:
        assert t["negative"] != t["anchor"]
        assert t["negative"] != t["positive"]
        assert (t["anchor"], t["negative"]) not in edges


def test_triplet_exclusion_includes_below_floor_neighbors(spark):
    # regression (r12): the exclusion anti-join must use the FULL k-NN
    # neighbor list, not just edges above sim_floor — with a high
    # floor most edges are below it, so a hash-drawn negative equal
    # to a below-floor neighbor would previously have slipped through
    high_floor = 0.9
    trips = similarity.contrastive_triplets(
        spark, SF, sim_floor=high_floor
    ).collect()
    edges = [
        (r["src"], r["dst"], r["sim"])
        for r in similarity.knn_graph(spark, SF, k=3).collect()
    ]
    below = {(s, d) for s, d, sim in edges if sim < high_floor}
    assert below, "floor too low to exercise the below-floor class"
    all_edges = {(s, d) for s, d, _ in edges}
    for t in trips:
        assert (t["anchor"], t["negative"]) not in all_edges
    # and the positives themselves still respect the floor
    for t in trips:
        assert t["pos_sim"] >= high_floor


def test_triplet_margin(triplets):
    # on the label-clustered corpus a hash-random negative should lose
    # to the mined positive almost always
    wins = sum(1 for t in triplets if t["pos_sim"] > t["neg_sim"])
    assert wins / len(triplets) >= 0.9
