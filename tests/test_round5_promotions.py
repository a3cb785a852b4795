"""Pytest twins of the driver oracle for the four round-5 promotions.

Round 4 registered ``dedup_incremental``, ``text_vocab_topk``,
``text_quality_flags`` and ``join_asof_tolerance`` below the driver's
50-row verification cut, so their DuckDB oracles never ran (VERDICT r4
"What's wrong" #1, ADVICE r4).  Round 5 promotes them into the window;
these tests additionally run the same differential in-repo at sf0.001
so the comparison is pinned by pytest, not only by the per-round
driver, and pin the NULL-text / tolerance semantics the sf data can't
exercise.
"""

import json

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from basenine_spark.ops import dedup, sampling, timeseries
from basenine_spark.registry import ORACLES, SPARK_QUERIES

SF = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

PROMOTED = [
    "dedup_incremental",
    "text_vocab_topk",
    "text_quality_flags",
    "join_asof_tolerance",
]


@pytest.fixture(scope="module")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'"
        )
    yield con
    con.close()


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(json.dumps([repr(row[i]) for i in order]) for row in rows)


@pytest.mark.parametrize("name", PROMOTED)
def test_matches_duckdb_oracle(spark, duck, name):
    sdf = SPARK_QUERIES[name](spark, SF)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    cur = duck.execute(ORACLES[name])
    ocols = [d[0] for d in cur.description]
    orows = cur.fetchall()
    assert sorted(scols) == sorted(ocols)
    assert len(srows) == len(orows)
    assert _canon(srows, scols) == _canon(orows, ocols)


def _write_docs(tmp_path, ids, texts):
    table = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(ids), pa.string()),
            "source": pa.array(["s"] * len(ids), pa.string()),
            "n_chars": pa.array(
                [len(t) if t else 0 for t in texts], pa.int64()
            ),
        }
    )
    pq.write_table(table, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_incremental_excludes_null_text(spark, tmp_path):
    # even ids = corpus, odd ids = batch; doc 2's NULL text must not
    # poison the anti join (Spark left_anti would otherwise ADMIT the
    # NULL-text batch doc 3, while SQL NOT IN would reject everything)
    d = _write_docs(
        tmp_path, [0, 1, 2, 3, 5], ["known", "known", None, None, "fresh"]
    )
    got = {r["doc_id"] for r in dedup.incremental_new_docs(spark, d).collect()}
    assert got == {5}


def test_incremental_admits_unseen_content_only(spark, tmp_path):
    d = _write_docs(tmp_path, [0, 1, 2, 3], ["a", "a", "b", "new"])
    got = {r["doc_id"] for r in dedup.incremental_new_docs(spark, d).collect()}
    # doc 1 duplicates corpus doc 0; doc 3 is new; doc 2 is corpus-side
    assert got == {3}


def test_quality_quantile_drops_null_and_empty_text(spark, tmp_path):
    # NULL q_ratio sorts NULLS FIRST in Spark windows — without the
    # filter, contentless docs would rank as best quality and be kept
    d = _write_docs(
        tmp_path,
        [0, 1, 2, 3],
        ["the a the junkless words here", None, "", "plain words only"],
    )
    kept = sampling.quality_quantile_filter(spark, d).collect()
    assert {r["doc_id"] for r in kept} <= {0, 3}
    assert all(r["q_ratio"] is not None for r in kept)


def test_asof_tolerance_bounds_lookback(spark):
    """tolerance_ms must null out matches older than the bound and
    change nothing else (the bounded variant of the same attribution)."""
    unbounded = {
        r["event_id"]: r["last_click_ms"]
        for r in timeseries.asof_last_click(spark, SF).collect()
    }
    tol = 3_600_000
    bounded = {
        r["event_id"]: r["last_click_ms"]
        for r in timeseries.asof_last_click(
            spark, SF, tolerance_ms=tol
        ).collect()
    }
    assert set(bounded) == set(unbounded)  # purchases never drop
    gaps = {
        r["event_id"]: r["gap_ms"]
        for r in timeseries.asof_last_click(spark, SF).collect()
        if r["last_click_ms"] is not None
    }
    changed = 0
    for eid, match in unbounded.items():
        if match is None:
            assert bounded[eid] is None
        elif gaps[eid] > tol:
            assert bounded[eid] is None  # outside the window → NULL
            changed += 1
        else:
            assert bounded[eid] == match  # inside → identical
    assert changed > 0, "sf0.001 must exercise the out-of-window branch"


def test_vocab_topk_rank_is_deterministic(spark, tmp_path):
    d = _write_docs(
        tmp_path, [0, 1], ["b a a c b", "c a"]
    )
    from basenine_spark.ops import text

    rows = text.vocab_topk(spark, d, k=10).collect()
    got = [(r["token"], r["cnt"], r["rank"]) for r in rows]
    # counts: a=3, b=2, c=2 — tie between b and c broken by token asc
    assert got == [("a", 3, 1), ("b", 2, 2), ("c", 2, 3)]
