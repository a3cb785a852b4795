"""Equi-depth histogram + curriculum ordering: DuckDB differentials and
structural invariants."""

import json

import pytest

from basenine_spark.ops import pipeline, relational

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in ("events", "documents"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'"
        )
    yield con
    con.close()


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(json.dumps([repr(row[i]) for i in order]) for row in rows)


def test_histogram_matches_duckdb(spark, duck):
    sdf = relational.equi_depth_histogram(spark, SF, k=10)
    srows = [tuple(r) for r in sdf.collect()]
    cur = duck.execute(
        """
        SELECT bucket, round(min(v), 4) AS lo, round(max(v), 4) AS hi,
               count(*)::BIGINT AS n_rows
        FROM (
          SELECT value AS v,
                 ntile(10) OVER (ORDER BY value, event_id) AS bucket
          FROM events WHERE value IS NOT NULL
        )
        GROUP BY bucket
        """
    )
    dcols = [d[0] for d in cur.description]
    drows = cur.fetchall()
    assert sorted(sdf.columns) == sorted(dcols)
    assert len(srows) == len(drows) == 10
    assert _canon(srows, sdf.columns) == _canon(drows, dcols)


def test_histogram_equi_depth_property(spark):
    rows = relational.equi_depth_histogram(spark, SF, k=8).collect()
    counts = [r["n_rows"] for r in rows]
    assert max(counts) - min(counts) <= 1  # equal frequency ±1
    by_bucket = sorted(rows, key=lambda r: r["bucket"])
    for a, b in zip(by_bucket, by_bucket[1:]):
        assert a["hi"] <= b["lo"]  # value ranges ordered


def test_curriculum_matches_duckdb(spark, duck):
    sdf = pipeline.curriculum_order(spark, SF, stages=4)
    srows = [tuple(r) for r in sdf.collect()]
    cur = duck.execute(
        """
        WITH q AS (
          -- exact replay of text.quality_score: whitespace split WITH
          -- empty tokens, STOPWORDS = ('a', 'the')
          SELECT doc_id,
                 len(string_split(text, ' ')) AS n_tokens,
                 round(
                   len(list_filter(string_split(text, ' '),
                       x -> x IN ('a', 'the')))
                   / CAST(len(string_split(text, ' ')) AS DOUBLE), 6)
                   AS stop_ratio
          FROM documents WHERE text IS NOT NULL
        ), staged AS (
          SELECT doc_id,
                 ntile(4) OVER (ORDER BY stop_ratio DESC, doc_id) AS stage,
                 substring(md5('cur0:' || cast(doc_id AS VARCHAR)), 1, 32)
                   AS h
          FROM q WHERE n_tokens > 0
        )
        SELECT doc_id, stage,
               row_number() OVER (PARTITION BY stage ORDER BY h, doc_id)
                 AS seq
        FROM staged
        """
    )
    dcols = [d[0] for d in cur.description]
    drows = cur.fetchall()
    assert sorted(sdf.columns) == sorted(dcols)
    assert len(srows) == len(drows) > 0
    assert _canon(srows, sdf.columns) == _canon(drows, dcols)


def test_curriculum_stage_and_seq_invariants(spark):
    rows = pipeline.curriculum_order(spark, SF, stages=4).collect()
    by_stage: dict = {}
    for r in rows:
        by_stage.setdefault(r["stage"], []).append(r["seq"])
    assert set(by_stage) == {1, 2, 3, 4}
    for s, seqs in by_stage.items():
        assert sorted(seqs) == list(range(1, len(seqs) + 1))
    sizes = [len(v) for v in by_stage.values()]
    assert max(sizes) - min(sizes) <= 1


# -- skew profile ----------------------------------------------------------


def test_skew_profile_matches_duckdb(spark, duck):
    sdf = relational.skew_profile(spark, SF, key="user_id", top_k=10)
    srows = [tuple(r) for r in sdf.collect()]
    cur = duck.execute(
        """
        WITH counts AS (
          SELECT coalesce(cast(user_id AS VARCHAR), '<NULL>') AS key_value,
                 count(*) AS n_rows
          FROM events GROUP BY 1
        ), stats AS (
          SELECT sum(n_rows)::DOUBLE AS total, avg(n_rows) AS mean_n
          FROM counts
        )
        SELECT key_value, n_rows,
               floor(n_rows / (SELECT total FROM stats) * 1e6 + 0.5) / 1e6
                 AS share,
               floor(n_rows / (SELECT mean_n FROM stats) * 100 + 0.5) / 100
                 AS x_mean
        FROM counts ORDER BY n_rows DESC, key_value ASC LIMIT 10
        """
    )
    dcols = [d[0] for d in cur.description]
    drows = cur.fetchall()
    assert sorted(sdf.columns) == sorted(dcols)
    assert len(srows) == len(drows) == 10
    assert _canon(srows, sdf.columns) == _canon(drows, dcols)


def test_skew_profile_shares_sane(spark):
    rows = relational.skew_profile(spark, SF, key="event_type", top_k=5).collect()
    assert len(rows) == 5
    assert abs(sum(r["share"] for r in rows) - 1.0) < 0.01  # 5 types total
    for r in rows:
        assert r["x_mean"] > 0
