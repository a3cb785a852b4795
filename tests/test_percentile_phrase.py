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


# -- winnow overlap pairs --------------------------------------------------


def test_winnow_overlap_matches_duckdb(spark, duck):
    sdf = text.winnow_overlap_pairs(spark, SF, min_shared=2)
    srows = [tuple(r) for r in sdf.collect()]
    # replay from first principles: the winnow fingerprint set per doc
    # (k=3 grams, window w=4, md5 min), then the pair join
    cur = duck.execute(
        """
        WITH toks AS (
          SELECT doc_id, string_split(text, ' ') AS l
          FROM documents WHERE text IS NOT NULL
        ), grams AS (
          SELECT doc_id, pos,
                 md5(array_to_string(list_slice(l, pos, pos + 2), ' '))
                   AS g
          FROM (
            SELECT doc_id, l, unnest(generate_series(1, len(l) - 2)) AS pos
            FROM toks WHERE len(l) >= 6
          )
        ), wins AS (
          SELECT DISTINCT doc_id,
                 min(g) OVER (PARTITION BY doc_id ORDER BY pos
                              ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING)
                   AS fp,
                 pos
          FROM grams
        ), valid AS (
          -- only windows fully inside the gram sequence: pos such that
          -- pos + 3 <= n_grams
          SELECT DISTINCT w.doc_id, w.fp
          FROM wins w
          JOIN (SELECT doc_id, len(l) - 2 AS n_grams FROM toks) n
            USING (doc_id)
          WHERE w.pos <= n.n_grams - 3
        )
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               count(*)::BIGINT AS shared_fps
        FROM valid a JOIN valid b ON a.fp = b.fp AND a.doc_id < b.doc_id
        GROUP BY 1, 2
        HAVING count(*) >= 2
        """
    )
    dcols = [d[0] for d in cur.description]
    drows = cur.fetchall()
    assert sorted(sdf.columns) == sorted(dcols)
    assert len(srows) == len(drows) > 0
    assert _canon(srows, sdf.columns) == _canon(drows, dcols)


def test_winnow_overlap_planted_shared_run(spark, tmp_path):
    shared = " ".join(f"s{i}" for i in range(15))
    a = " ".join(f"a{i}" for i in range(10)) + " " + shared
    b = shared + " " + " ".join(f"b{i}" for i in range(10))
    c = " ".join(f"c{i}" for i in range(25))
    sf = _write_docs(tmp_path, [a, b, c])
    pairs = {
        (r["doc_a"], r["doc_b"]): r["shared_fps"]
        for r in text.winnow_overlap_pairs(spark, sf, min_shared=1).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] >= 2  # long shared run
    assert all(2 not in p for p in pairs)  # unrelated doc clean
