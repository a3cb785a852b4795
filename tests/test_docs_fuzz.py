"""Degenerate-documents differential gate (round-7 extension of the
round-6 nulls-fuzz discipline to the documents table).

Replays a representative subset of doc-derived oracle entries against
a deterministically degraded twin of the sf0.001 testdata
(``tools/driver_sim.make_docs_fuzz_dir`` — the same generator behind
``driver_sim.py --docs-fuzz``): NULL text, empty text, doubled
spaces (so '' tokens appear in splits), trailing spaces, non-ASCII
bytes through the md5/xxhash/token paths, NULL lang/source, and
exact-duplicate rows under fresh ids.  The full-registry sweep at
sf0.01 stays in ``driver_sim.py --docs-fuzz``; this is the fast
always-on subset covering each doc-op family.  First catch:
``sample_mixture`` crashed sorting a NULL source key (fixed in
``mixture_filter`` — NULL sources are skipped, matching the oracle's
CASE drop).
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.driver_sim import TABLES, make_docs_fuzz_dir, value_hash  # noqa: E402

SRC_DIR = "/root/testdata/sf0.001"

# one or two entries per doc-op family: token aggregates, gram/dedup
# machinery, hashing/sampling thresholds, composition funnels, and the
# round-7 additions
ENTRIES = [
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_canonical",
    "text_quality_flags",
    "text_unigram_surprisal",
    "text_lexical_diversity",
    "sample_mixture",
    "sample_splits",
    "sample_dsir_select",
    "sample_token_budget",
    "sample_temperature_mixture",
    "sample_weighted_draw",
    "sample_leakage_safe_splits",
    "sample_effective_mass",
    "pipeline_datasheet",
    "pipeline_novelty_curve",
    "dedup_cluster_density",
]


@pytest.fixture(scope="module")
def fuzz_dir(tmp_path_factory):
    dest = tmp_path_factory.mktemp("docs_fuzz") / "sf"
    return make_docs_fuzz_dir(SRC_DIR, str(dest))


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


@pytest.mark.parametrize("name", ENTRIES)
def test_entry_matches_oracle_under_degenerate_docs(
    spark, fuzz_dir, duck, name
):
    from basenine_spark.registry import ORACLES, SPARK_QUERIES

    sql = ORACLES[name]
    assert sql is not None, f"{name} lost its oracle"
    sdf = SPARK_QUERIES[name](spark, fuzz_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    cur = duck.execute(sql)
    ocols = [d[0] for d in cur.description]
    orows = cur.fetchall()
    assert len(srows) == len(orows), (
        f"{name}: {len(srows)} spark rows vs {len(orows)} oracle rows"
    )
    assert sorted(scols) == sorted(ocols)
    assert value_hash(srows, scols) == value_hash(orows, ocols), (
        f"{name}: value divergence under degenerate documents"
    )


def test_fuzz_dir_actually_degrades(fuzz_dir):
    """Guard the guard: the generator must keep injecting."""
    import duckdb

    con = duckdb.connect()
    row = con.execute(
        f"""
        SELECT
          count(*) FILTER (text IS NULL),
          count(*) FILTER (text = ''),
          count(*) FILTER (text LIKE '%  %'),
          count(*) FILTER (source IS NULL),
          (SELECT count(*) FROM (
             SELECT text FROM '{fuzz_dir}/documents.parquet'
             WHERE text IS NOT NULL AND text <> ''
             GROUP BY text HAVING count(*) > 1))
        FROM '{fuzz_dir}/documents.parquet'
        """
    ).fetchone()
    n_null, n_empty, n_dspace, n_null_src, n_dups = row
    assert n_null > 0 and n_empty > 0 and n_dspace > 0
    assert n_null_src > 0 and n_dups > 0
