"""Balanced-release composition (cap → substring scrub → split →
manifest): the whole chain replayed in DuckDB must hash-match, and the
cap must actually bind at this scale (non-vacuity)."""

import json
import math

import pytest

from basenine_spark.ops import pipeline

SF = "/root/testdata/sf0.001"
CAP, N = 15, 8

TRAIN_HI = "%08x" % math.floor(0.9 * 4294967296.0)
VAL_HI = "%08x" % math.floor(0.95 * 4294967296.0)


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


REPLAY = f"""
WITH base AS (
  SELECT doc_id, source, text FROM documents WHERE text IS NOT NULL
), ranked AS (
  SELECT doc_id, row_number() OVER (
           PARTITION BY source
           ORDER BY substring(md5('cap' || cast(doc_id AS VARCHAR)), 1, 8),
                    doc_id
         ) AS rnk
  FROM base
), surv AS (
  SELECT b.doc_id, b.source, b.text
  FROM base b JOIN ranked r USING (doc_id) WHERE r.rnk <= {CAP}
), toks AS (
  SELECT doc_id, string_split(text, ' ') AS l FROM surv
), grams AS (
  SELECT doc_id, pos,
         array_to_string(list_slice(l, pos, pos + {N} - 1), ' ') AS gram
  FROM (
    SELECT doc_id, l, unnest(generate_series(1, len(l) - {N} + 1)) AS pos
    FROM toks WHERE len(l) >= {N}
  )
), rn AS (
  SELECT doc_id, pos,
         row_number() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rn
  FROM grams
), hits AS (
  SELECT doc_id, pos FROM rn WHERE rn >= 2
), flagged AS (
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
  SELECT doc_id, min(pos) AS s, max(pos) + {N} - 1 AS e
  FROM sp GROUP BY doc_id, span_id
), cover AS (
  SELECT doc_id, unnest(generate_series(s, e)) AS p FROM spans
), tokpos AS (
  SELECT doc_id, l[i] AS tok, i FROM (
    SELECT doc_id, l, unnest(generate_series(1, len(l))) AS i FROM toks
  )
), per_doc AS (
  SELECT t.doc_id,
         count(*) FILTER (WHERE c.p IS NULL AND tok <> '') AS n_tok,
         count(c.p) AS removed
  FROM tokpos t
  LEFT JOIN cover c ON t.doc_id = c.doc_id AND t.i = c.p
  GROUP BY t.doc_id
), lbl AS (
  SELECT doc_id,
         CASE WHEN substring(md5('split' || cast(doc_id AS VARCHAR)), 1, 8)
                   < '{TRAIN_HI}' THEN 'train'
              WHEN substring(md5('split' || cast(doc_id AS VARCHAR)), 1, 8)
                   < '{VAL_HI}' THEN 'val'
              ELSE 'test' END AS split
  FROM surv
)
SELECT split, source,
       count(*)::BIGINT AS n_docs,
       sum(n_tok)::BIGINT AS n_tokens,
       sum(removed)::BIGINT AS removed_tokens
FROM per_doc JOIN surv USING (doc_id) JOIN lbl USING (doc_id)
GROUP BY split, source
ORDER BY split, source
"""


def test_release_balanced_matches_duckdb_replay(spark, duck):
    sdf = pipeline.release_balanced(spark, SF, cap=CAP, n=N)
    srows = [tuple(r) for r in sdf.collect()]
    cur = duck.execute(REPLAY)
    dcols = [d[0] for d in cur.description]
    drows = cur.fetchall()
    assert sorted(sdf.columns) == sorted(dcols)
    assert len(srows) == len(drows) > 0
    assert _canon(srows, sdf.columns) == _canon(drows, dcols)


def test_cap_binds_at_this_scale(spark, duck):
    # non-vacuity: every source has >CAP docs, so the manifest's doc
    # total must be exactly n_sources x CAP
    (n_sources,) = duck.execute(
        "SELECT count(DISTINCT source) FROM documents WHERE text IS NOT NULL"
    ).fetchone()
    (min_src,) = duck.execute(
        "SELECT min(c) FROM (SELECT count(*) AS c FROM documents "
        "WHERE text IS NOT NULL GROUP BY source)"
    ).fetchone()
    assert min_src > CAP, "cap does not bind — raise sf or lower CAP"
    total = sum(
        r["n_docs"]
        for r in pipeline.release_balanced(spark, SF, cap=CAP, n=N).collect()
    )
    assert total == n_sources * CAP


def test_scrub_stage_contributes(spark):
    # non-vacuity: the sf corpus contains exact duplicates, so some
    # capped survivors must lose tokens to the scrub
    removed = sum(
        r["removed_tokens"]
        for r in pipeline.release_balanced(spark, SF, cap=CAP, n=N).collect()
    )
    assert removed > 0
