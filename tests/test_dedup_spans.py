"""Exact duplicated-span (substring) dedup — Lee et al. ACL'22 family.

The Spark implementation hashes grams (rolling xxhash64) and merges hit
intervals with window algebra; the DuckDB replay here uses string grams
and the identical interval-merge, so agreement pins both the hash
fidelity (no collisions at test scale) and the span semantics. A
hand-built corpus pins exact boundaries, intra-doc repeats, and the
keep-one-occurrence scrub policy.
"""

import json

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from basenine_spark.ops import dedup

SF = "/root/testdata/sf0.001"
N = 8


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


_GRAMS = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS l
  FROM documents WHERE text IS NOT NULL
), grams AS (
  SELECT doc_id, pos,
         array_to_string(list_slice(l, pos, pos + {N} - 1), ' ') AS gram
  FROM (
    SELECT doc_id, l, unnest(generate_series(1, len(l) - {N} + 1)) AS pos
    FROM toks WHERE len(l) >= {N}
  )
)
"""

_MERGE = f"""
flagged AS (
  SELECT doc_id, pos,
         CASE WHEN pos > coalesce(max(pos + {N} - 1) OVER (
                PARTITION BY doc_id ORDER BY pos
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) + 1
              THEN 1 ELSE 0 END AS new_span
  FROM hits
), sp AS (
  SELECT doc_id, pos,
         sum(new_span) OVER (PARTITION BY doc_id ORDER BY pos) AS span_id
  FROM flagged
), spans AS (
  SELECT doc_id, min(pos) AS span_start, max(pos) + {N} - 1 AS span_end,
         max(pos) + {N} - 1 - min(pos) + 1 AS span_tokens
  FROM sp GROUP BY doc_id, span_id
)
"""


def test_duplicate_spans_matches_duckdb_replay(spark, duck):
    sdf = dedup.duplicate_spans(spark, SF, n=N)
    srows = [tuple(r) for r in sdf.collect()]
    cur = duck.execute(
        _GRAMS
        + f""", dup AS (
          SELECT gram FROM grams GROUP BY gram HAVING count(*) >= 2
        ), hits AS (
          SELECT doc_id, pos FROM grams
          WHERE gram IN (SELECT gram FROM dup)
        ), """
        + _MERGE.lstrip()
        + "SELECT doc_id, span_start, span_end, span_tokens FROM spans"
    )
    dcols = [d[0] for d in cur.description]
    drows = cur.fetchall()
    assert sorted(sdf.columns) == sorted(dcols)
    assert len(srows) == len(drows) > 0
    assert _canon(srows, sdf.columns) == _canon(drows, dcols)


def test_scrub_matches_duckdb_replay(spark, duck):
    sdf = dedup.scrub_duplicate_spans(spark, SF, n=N)
    srows = [tuple(r) for r in sdf.collect()]
    cur = duck.execute(
        _GRAMS
        + f""", rn AS (
          SELECT doc_id, pos,
                 row_number() OVER (PARTITION BY gram
                                    ORDER BY doc_id, pos) AS rn
          FROM grams
        ), hits AS (
          SELECT doc_id, pos FROM rn WHERE rn >= 2
        ), """
        + _MERGE.lstrip()
        + f"""
        , cover AS (
          SELECT doc_id,
                 unnest(generate_series(span_start, span_end)) AS p
          FROM spans
        ), tokpos AS (
          SELECT doc_id, l[i] AS tok, i FROM (
            SELECT doc_id, l, unnest(generate_series(1, len(l))) AS i
            FROM toks
          )
        )
        SELECT t.doc_id,
               coalesce(string_agg(tok, ' ' ORDER BY i)
                          FILTER (WHERE c.p IS NULL), '') AS clean_text,
               count(c.p) AS removed_tokens
        FROM tokpos t
        LEFT JOIN cover c ON t.doc_id = c.doc_id AND t.i = c.p
        GROUP BY t.doc_id
        """
    )
    dcols = [d[0] for d in cur.description]
    drows = cur.fetchall()
    assert sorted(sdf.columns) == sorted(dcols)
    assert len(srows) == len(drows) > 0
    assert _canon(srows, sdf.columns) == _canon(drows, dcols)


# -- hand-built corpus ------------------------------------------------------


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
                "n_chars": pa.array(
                    [len(t) if t else 0 for t in texts], pa.int64()
                ),
            }
        ),
        d / "documents.parquet",
    )
    return str(d)


def _tok(i):
    return f"w{i:03d}"


def test_planted_span_boundaries(spark, tmp_path):
    shared = " ".join(_tok(900 + i) for i in range(10))  # 10-token span
    a = " ".join(_tok(i) for i in range(20)) + " " + shared
    b = shared + " " + " ".join(_tok(100 + i) for i in range(20))
    sf = _write_docs(tmp_path, [a, b, None])
    rows = {
        r["doc_id"]: r
        for r in dedup.duplicate_spans(spark, sf, n=8).collect()
    }
    # doc 0: span covers tokens 21..30; doc 1: tokens 1..10
    assert rows[0]["span_start"] == 21 and rows[0]["span_end"] == 30
    assert rows[1]["span_start"] == 1 and rows[1]["span_end"] == 10
    assert rows[0]["span_tokens"] == rows[1]["span_tokens"] == 10


def test_intra_doc_repeat_detected(spark, tmp_path):
    block = " ".join(_tok(i) for i in range(8))
    text = block + " " + " ".join(_tok(500 + i) for i in range(5)) + " " + block
    sf = _write_docs(tmp_path, [text])
    spans = sorted(
        (r["span_start"], r["span_end"])
        for r in dedup.duplicate_spans(spark, sf, n=8).collect()
    )
    assert spans == [(1, 8), (14, 21)]


def test_scrub_keeps_exactly_one_occurrence(spark, tmp_path):
    shared = " ".join(_tok(900 + i) for i in range(10))
    a = " ".join(_tok(i) for i in range(20)) + " " + shared
    b = shared + " " + " ".join(_tok(100 + i) for i in range(20))
    sf = _write_docs(tmp_path, [a, b])
    rows = {
        r["doc_id"]: r
        for r in dedup.scrub_duplicate_spans(spark, sf, n=8).collect()
    }
    # doc 0 holds the keeper occurrence (smallest doc_id) — untouched
    assert rows[0]["clean_text"] == a and rows[0]["removed_tokens"] == 0
    # doc 1 loses the 10 shared tokens, keeps its unique tail
    assert rows[1]["removed_tokens"] == 10
    assert rows[1]["clean_text"] == " ".join(
        _tok(100 + i) for i in range(20)
    )


def test_no_duplicates_no_spans(spark, tmp_path):
    texts = [" ".join(_tok(100 * d + i) for i in range(12)) for d in range(3)]
    sf = _write_docs(tmp_path, texts)
    assert dedup.duplicate_spans(spark, sf, n=8).count() == 0
    rows = {
        r["doc_id"]: r
        for r in dedup.scrub_duplicate_spans(spark, sf, n=8).collect()
    }
    for d, t in enumerate(texts):
        assert rows[d]["clean_text"] == t
        assert rows[d]["removed_tokens"] == 0


# -- span-level decontamination --------------------------------------------


def test_decontaminate_matches_duckdb_replay(spark, duck):
    sdf = dedup.decontaminate_spans(spark, SF, benchmark_source="src0", n=N)
    srows = [tuple(r) for r in sdf.collect()]
    cur = duck.execute(
        f"""
        WITH toks AS (
          SELECT doc_id, source, string_split(text, ' ') AS l
          FROM documents WHERE text IS NOT NULL
        ), grams AS (
          SELECT doc_id, source, pos,
                 array_to_string(list_slice(l, pos, pos + {N} - 1), ' ')
                   AS gram
          FROM (
            SELECT doc_id, source, l,
                   unnest(generate_series(1, len(l) - {N} + 1)) AS pos
            FROM toks WHERE len(l) >= {N}
          )
        ), bench AS (
          SELECT DISTINCT gram FROM grams WHERE source = 'src0'
        ), hits AS (
          SELECT doc_id, pos FROM grams
          WHERE source <> 'src0' AND gram IN (SELECT gram FROM bench)
        ), """
        + _MERGE.lstrip()
        + """
        , cover AS (
          SELECT doc_id,
                 unnest(generate_series(span_start, span_end)) AS p
          FROM spans
        ), tokpos AS (
          SELECT doc_id, l[i] AS tok, i FROM (
            SELECT doc_id, l, unnest(generate_series(1, len(l))) AS i
            FROM toks WHERE source <> 'src0'
          )
        )
        SELECT t.doc_id,
               coalesce(string_agg(tok, ' ' ORDER BY i)
                          FILTER (WHERE c.p IS NULL), '') AS clean_text,
               count(c.p) AS removed_tokens
        FROM tokpos t
        LEFT JOIN cover c ON t.doc_id = c.doc_id AND t.i = c.p
        GROUP BY t.doc_id
        """
    )
    dcols = [d[0] for d in cur.description]
    drows = cur.fetchall()
    assert sorted(sdf.columns) == sorted(dcols)
    assert len(srows) == len(drows) > 0
    assert _canon(srows, sdf.columns) == _canon(drows, dcols)


def _write_docs_sources(tmp_path, rows):
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "lang": pa.array(["en"] * len(rows)),
                "source": pa.array([r[2] for r in rows], pa.string()),
                "n_chars": pa.array(
                    [len(r[1]) if r[1] else 0 for r in rows], pa.int64()
                ),
            }
        ),
        d / "documents.parquet",
    )
    return str(d)


def test_decontaminate_cuts_exactly_the_leak(spark, tmp_path):
    bench = " ".join(_tok(900 + i) for i in range(10))
    leaked = (
        " ".join(_tok(i) for i in range(15))
        + " " + bench + " "
        + " ".join(_tok(100 + i) for i in range(15))
    )
    clean = " ".join(_tok(200 + i) for i in range(20))
    sf = _write_docs_sources(
        tmp_path,
        [(0, bench, "src0"), (1, leaked, "web"), (2, clean, "web")],
    )
    rows = {
        r["doc_id"]: r
        for r in dedup.decontaminate_spans(
            spark, sf, benchmark_source="src0", n=8
        ).collect()
    }
    # benchmark docs are not in the output
    assert set(rows) == {1, 2}
    assert rows[1]["removed_tokens"] == 10
    assert rows[1]["clean_text"] == (
        " ".join(_tok(i) for i in range(15))
        + " "
        + " ".join(_tok(100 + i) for i in range(15))
    )
    assert rows[2]["clean_text"] == clean
    assert rows[2]["removed_tokens"] == 0


# -- canonicalizing dedup ---------------------------------------------------


def test_canonical_dedup_matches_duckdb(spark, duck):
    sdf = dedup.canonical_dedup(spark, SF)
    srows = [tuple(r) for r in sdf.collect()]
    cur = duck.execute(
        r"""
        SELECT md5(canon) AS canon_hash, min(doc_id) AS doc_id,
               count(*)::BIGINT AS dup_cnt
        FROM (
          SELECT doc_id,
                 trim(regexp_replace(
                   regexp_replace(lower(text), '[0-9]+', '0', 'g'),
                   '[\s]+', ' ', 'g')) AS canon
          FROM documents WHERE text IS NOT NULL
        )
        GROUP BY 1
        """
    )
    dcols = [d[0] for d in cur.description]
    drows = cur.fetchall()
    assert sorted(sdf.columns) == sorted(dcols)
    assert len(srows) == len(drows) > 0
    assert _canon(srows, sdf.columns) == _canon(drows, dcols)


def test_canonical_dedup_catches_templated_copies(spark, tmp_path):
    texts = [
        "Page 7 of 12 results for QUERY",
        "page 3 of 9   results for query",   # same after canonicalization
        "Page 7 of 12 results for OTHER",    # genuinely different
    ]
    sf = _write_docs(tmp_path, texts)
    rows = dedup.canonical_dedup(spark, sf).collect()
    groups = {r["doc_id"]: r["dup_cnt"] for r in rows}
    assert groups == {0: 2, 2: 1}
