"""Degenerate-embeddings differential gate (round-8 extension of the
nulls-fuzz / docs-fuzz discipline to the embeddings table).

Replays the embedding-derived oracle entries against a twin of the
sf0.001 testdata with NULL embeddings, ALL-ZERO vectors, NULL labels,
and exact-duplicate vectors (``tools/driver_sim.make_emb_fuzz_dir``,
the generator behind ``driver_sim.py --emb-fuzz``), and crash-checks
the rows-only ANN/cluster family.

First catches (all fixed in round 8):

* one zero-norm vector KILLED every cosine consumer under Spark 4's
  ANSI mode (DIVIDE_BY_ZERO task failure — at 100 TB one corrupt row
  aborts the job); ``cosine`` is now ``try_divide`` (NULL, matching
  DuckDB's float /0 -> NULL, where plain NaN would have sorted ABOVE
  every real similarity in desc rankings);
* NULL embeddings crashed numpy ``np.stack``/k-means sampling in the
  LSH/IVF/PQ paths, and DuckDB's ``list_dot_product`` rejects
  parquet-read NULL lists — ``similarity.load_embeddings`` now drops
  NULL/empty vectors at the source for every consumer.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.driver_sim import TABLES, make_emb_fuzz_dir, value_hash  # noqa: E402

SRC_DIR = "/root/testdata/sf0.001"

ORACLE_ENTRIES = [
    "ann_topk",
    "search_hybrid_rrf",
    "embedding_quantize",
    "bfl_wildcard_existential",
    "bfl_index_select",
]

ROWS_ONLY_ENTRIES = [
    "ann_topk_lsh",
    "ann_topk_ivf",
    "ann_topk_pq",
    "embedding_near_dup",
    "embed_clusters",
    "dedup_semantic",
    "knn_graph",
    "sample_kcenter_coreset",
    "embedding_triplets",
]


@pytest.fixture(scope="module")
def fuzz_dir(tmp_path_factory):
    dest = tmp_path_factory.mktemp("emb_fuzz") / "sf"
    return make_emb_fuzz_dir(SRC_DIR, str(dest))


@pytest.fixture(scope="module")
def duck(fuzz_dir):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{fuzz_dir}/{t}.parquet'"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", ORACLE_ENTRIES)
def test_entry_matches_oracle_under_degenerate_embeddings(
    spark, fuzz_dir, duck, name
):
    from basenine_spark.registry import ORACLES, SPARK_QUERIES

    sql = ORACLES[name]
    assert sql is not None, f"{name} lost its oracle"
    sdf = SPARK_QUERIES[name](spark, fuzz_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    # Arrow fetch, mirroring tools/driver_sim.py: fetchall() silently
    # coerces HUGEINT/DECIMAL to int, which hid the r6/r7 decimal-hash
    # divergence class — this gate must see the driver's representation.
    atbl = duck.sql(sql).arrow()
    ocols = atbl.column_names
    orows = [tuple(d.values()) for d in atbl.to_pylist()]
    assert len(srows) == len(orows), (
        f"{name}: {len(srows)} spark rows vs {len(orows)} oracle rows"
    )
    assert sorted(scols) == sorted(ocols)
    assert value_hash(srows, scols) == value_hash(orows, ocols), (
        f"{name}: value divergence under degenerate embeddings"
    )


@pytest.mark.parametrize("name", ROWS_ONLY_ENTRIES)
def test_rows_only_entry_survives_degenerate_embeddings(
    spark, fuzz_dir, name
):
    from basenine_spark.registry import SPARK_QUERIES

    rows = SPARK_QUERIES[name](spark, fuzz_dir).collect()
    assert rows is not None  # no task crash; emptiness is acceptable


def test_fuzz_dir_actually_degrades(fuzz_dir):
    """Guard the guard: the generator must keep injecting."""
    import duckdb

    con = duckdb.connect()
    row = con.execute(
        f"""
        SELECT
          count(*) FILTER (embedding IS NULL),
          count(*) FILTER (embedding IS NOT NULL AND len(embedding) > 0 AND
                           len(list_filter(embedding, x -> x != 0)) = 0),
          count(*) FILTER (label IS NULL),
          count(*) FILTER (embedding IS NOT NULL AND len(embedding) = 0)
        FROM '{fuzz_dir}/embeddings.parquet'
        """
    ).fetchone()
    n_null, n_zero, n_null_label, n_empty = row
    assert n_null > 0 and n_zero > 0 and n_null_label > 0 and n_empty > 0
    # The kcenter seed (min vec_id) must be one of the zero-norm plants.
    seed = con.execute(
        f"""
        SELECT len(list_filter(embedding, x -> x != 0)) = 0
        FROM '{fuzz_dir}/embeddings.parquet'
        WHERE embedding IS NOT NULL AND len(embedding) > 0
        ORDER BY vec_id LIMIT 1
        """
    ).fetchone()
    assert seed is not None and seed[0]
