"""Per-source quality percentile calibration and exact phrase search:
DuckDB differential + planted-occurrence goldens."""

import json

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from basenine_spark.ops import sampling, text

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    yield con
    con.close()


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(json.dumps([repr(row[i]) for i in order]) for row in rows)


def test_percentile_matches_duckdb(spark, duck):
    sdf = sampling.quality_percentile_by_source(spark, SF)
    srows = [tuple(r) for r in sdf.collect()]
    cur = duck.execute(
        """
        WITH q AS (
          SELECT doc_id, source,
                 round(
                   len(list_filter(string_split(text, ' '),
                       x -> x IN ('a', 'the')))
                   / CAST(len(string_split(text, ' ')) AS DOUBLE), 6)
                   AS stop_ratio,
                 len(string_split(text, ' ')) AS n_tokens
          FROM documents WHERE text IS NOT NULL
        )
        SELECT doc_id, source, stop_ratio,
               round(percent_rank() OVER (
                 PARTITION BY source ORDER BY stop_ratio, doc_id
               ), 6) AS q_pct
        FROM q WHERE n_tokens > 0
        """
    )
    dcols = [d[0] for d in cur.description]
    drows = cur.fetchall()
    assert sorted(sdf.columns) == sorted(dcols)
    assert len(srows) == len(drows) > 0
    assert _canon(srows, sdf.columns) == _canon(drows, dcols)


def test_percentile_range_per_source(spark):
    rows = sampling.quality_percentile_by_source(spark, SF).collect()
    by_src: dict = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r["q_pct"])
    for src, ps in by_src.items():
        assert min(ps) == 0.0 and max(ps) == 1.0  # full range per source
        assert all(0.0 <= p <= 1.0 for p in ps)


def _write_docs(tmp_path, texts):
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(texts)),
                "source": pa.array(["t"] * len(texts)),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        d / "documents.parquet",
    )
    return str(d)


def test_phrase_search_finds_all_occurrences(spark, tmp_path):
    texts = [
        "x quick brown fox y quick brown fox",   # hits at pos 2 and 6
        "quick brown wolf",                       # near miss
        "the quick brown",                        # hit at pos 2
    ]
    sf = _write_docs(tmp_path, texts)
    got = sorted(
        (r["doc_id"], r["pos"])
        for r in text.phrase_search(spark, sf, phrase="quick brown fox").collect()
    )
    assert got == [(0, 2), (0, 6)]
    got1 = sorted(
        (r["doc_id"], r["pos"])
        for r in text.phrase_search(spark, sf, phrase="quick brown").collect()
    )
    assert got1 == [(0, 2), (0, 6), (1, 1), (2, 2)]


def test_phrase_search_matches_duckdb_scan(spark, duck):
    phrase = "spark"
    got = sorted(
        (r["doc_id"], r["pos"])
        for r in text.phrase_search(spark, SF, phrase=phrase).collect()
    )
    drows = sorted(
        duck.execute(
            """
            SELECT doc_id, pos FROM (
              SELECT doc_id,
                     unnest(generate_series(1, len(l))) AS pos, l
              FROM (SELECT doc_id, string_split(text, ' ') AS l
                    FROM documents WHERE text IS NOT NULL)
            ) WHERE l[pos] = 'spark'
            """
        ).fetchall()
    )
    assert got == [tuple(r) for r in drows]
    assert len(got) > 0


def test_phrase_search_empty_rejected(spark):
    with pytest.raises(ValueError):
        text.phrase_search(spark, SF, phrase="  ")
