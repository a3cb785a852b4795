"""Exact containment join (DuckDB brute-force parity + planted
quote golden) and the exactly-n deterministic sample."""

import json

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from basenine_spark.ops import dedup, sampling

SF = "/root/testdata/sf0.001"
T = 0.8


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


def test_containment_matches_brute_force(spark, duck):
    sdf = dedup.containment_pairs(spark, SF, threshold=T, n=3)
    srows = [tuple(r) for r in sdf.collect()]
    cur = duck.execute(
        f"""
        WITH toks AS (
          SELECT doc_id, string_split(text, ' ') AS l
          FROM documents WHERE text IS NOT NULL
        ), g AS (
          SELECT DISTINCT doc_id,
                 array_to_string(list_slice(l, pos, pos + 2), ' ') AS gram
          FROM (
            SELECT doc_id, l, unnest(generate_series(1, len(l) - 2)) AS pos
            FROM toks WHERE len(l) >= 3
          )
        ), sizes AS (
          SELECT doc_id, count(*) AS sz FROM g GROUP BY doc_id
        ), inter AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
          FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id <> b.doc_id
          GROUP BY 1, 2
        )
        SELECT doc_a, doc_b,
               round(c / CAST(sa.sz AS DOUBLE), 6) AS containment
        FROM inter
        JOIN sizes sa ON sa.doc_id = doc_a
        WHERE round(c / CAST(sa.sz AS DOUBLE), 6) >= {T}
        """
    )
    dcols = [d[0] for d in cur.description]
    drows = cur.fetchall()
    assert sorted(sdf.columns) == sorted(dcols)
    assert len(srows) == len(drows) > 0
    assert _canon(srows, sdf.columns) == _canon(drows, dcols)


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


def test_planted_quote_detected_one_direction(spark, tmp_path):
    quote = " ".join(f"q{i}" for i in range(12))
    article = (
        " ".join(f"w{i}" for i in range(60))
        + " " + quote + " "
        + " ".join(f"v{i}" for i in range(60))
    )
    other = " ".join(f"z{i}" for i in range(30))
    sf = _write_docs(tmp_path, [quote, article, other])
    rows = {
        (r["doc_a"], r["doc_b"]): r["containment"]
        for r in dedup.containment_pairs(
            spark, sf, threshold=0.8, n=3
        ).collect()
    }
    # the quote is fully contained in the article...
    assert rows.get((0, 1)) == 1.0
    # ...but the article is NOT contained in the quote, and the
    # unrelated doc appears nowhere
    assert (1, 0) not in rows
    assert not any(0 == a and b == 2 or a == 2 for (a, b) in rows)


def test_exact_n_sample_matches_duckdb(spark, duck):
    sdf = sampling.exact_n_sample(spark, SF, n=50)
    srows = [tuple(r) for r in sdf.collect()]
    cur = duck.execute(
        """
        SELECT doc_id, source,
               row_number() OVER (
                 ORDER BY substring(md5('exn' || cast(doc_id AS VARCHAR)),
                                    1, 8),
                          doc_id
               ) AS sample_rank
        FROM documents
        ORDER BY sample_rank LIMIT 50
        """
    )
    dcols = [d[0] for d in cur.description]
    drows = cur.fetchall()
    assert sorted(sdf.columns) == sorted(dcols)
    assert len(srows) == len(drows) == 50
    assert _canon(srows, sdf.columns) == _canon(drows, dcols)


def test_exact_n_is_prefix_stable(spark):
    # the n=20 sample is exactly the top-20 of the n=50 sample — the
    # nested-subset property hash ranking guarantees
    s50 = {
        r["sample_rank"]: r["doc_id"]
        for r in sampling.exact_n_sample(spark, SF, n=50).collect()
    }
    s20 = {
        r["sample_rank"]: r["doc_id"]
        for r in sampling.exact_n_sample(spark, SF, n=20).collect()
    }
    assert s20 == {k: v for k, v in s50.items() if k <= 20}


# -- containment dedup action ----------------------------------------------


def test_containment_dedup_drops_quote_keeps_article(spark, tmp_path):
    quote = " ".join(f"q{i}" for i in range(12))
    article = (
        " ".join(f"w{i}" for i in range(60))
        + " " + quote + " "
        + " ".join(f"v{i}" for i in range(60))
    )
    other = " ".join(f"z{i}" for i in range(30))
    sf = _write_docs(tmp_path, [quote, article, other])
    kept = {
        r["doc_id"]
        for r in dedup.containment_dedup(spark, sf, threshold=0.8).collect()
    }
    assert kept == {1, 2}


def test_containment_dedup_mutual_keeps_one(spark, tmp_path):
    # two gram-identical docs (mutual containment 1.0): exactly one
    # survives, chosen deterministically
    a = " ".join(f"m{i}" for i in range(20))
    sf = _write_docs(tmp_path, [a, a])
    kept = {
        r["doc_id"]
        for r in dedup.containment_dedup(spark, sf, threshold=0.8).collect()
    }
    assert kept == {0}


# -- quality-aware canonical selection -------------------------------------


def test_cluster_best_quality_picks_longest(spark, tmp_path):
    base = " ".join(f"c{i}" for i in range(30))
    longer = base + " " + " ".join(f"x{i}" for i in range(5))
    truncated = " ".join(f"c{i}" for i in range(22))
    unrelated = " ".join(f"u{i}" for i in range(25))
    sf = _write_docs(tmp_path, [truncated, base, longer, unrelated])
    rows = {
        r["cluster_id"]: r
        for r in dedup.cluster_best_quality(
            spark, sf, n=3, threshold=0.4
        ).collect()
    }
    # the near-dup cluster {0,1,2} is represented by doc 2 (longest),
    # labeled by its min id 0
    assert rows[0]["doc_id"] == 2 and rows[0]["cluster_size"] == 3
    # the unrelated doc is its own singleton representative
    assert rows[3]["doc_id"] == 3 and rows[3]["cluster_size"] == 1


def test_cluster_best_quality_sf_invariants(spark):
    rows = dedup.cluster_best_quality(spark, SF).collect()
    import duckdb

    con = duckdb.connect()
    (n_docs,) = con.execute(
        f"SELECT count(*) FROM '{SF}/documents.parquet' WHERE text IS NOT NULL"
    ).fetchone()
    con.close()
    # one representative per cluster; clusters partition the corpus
    assert sum(r["cluster_size"] for r in rows) == n_docs
    assert len({r["cluster_id"] for r in rows}) == len(rows)
    for r in rows:
        assert r["cluster_id"] <= r["doc_id"] or r["cluster_size"] > 1
