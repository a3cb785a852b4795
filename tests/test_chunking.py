"""Overlapping token-window chunking: DuckDB replay differential at
sf0.001 plus coverage/shape invariants on hand-built documents."""

import json

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from basenine_spark.ops import pipeline

SF = "/root/testdata/sf0.001"
SIZE, STRIDE = 64, 48


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


def _replay(size, stride):
    return f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS l
      FROM documents WHERE text IS NOT NULL
    ), m AS (
      SELECT doc_id, l, greatest(1, len(l) - {size} + 1) AS mx FROM toks
    ), st AS (
      SELECT doc_id, l,
             CASE WHEN s[-1] <> mx THEN list_append(s, mx) ELSE s END
               AS starts
      FROM (SELECT doc_id, l, mx,
                   generate_series(1, mx, {stride}) AS s FROM m)
    ), ex AS (
      SELECT doc_id, l,
             unnest(generate_series(1, len(starts))) - 1 AS chunk_idx,
             unnest(starts) AS chunk_start
      FROM st
    )
    SELECT doc_id, chunk_idx, chunk_start,
           least({size}, len(l) - chunk_start + 1) AS chunk_tokens,
           array_to_string(
             list_slice(l, chunk_start, chunk_start + {size} - 1), ' '
           ) AS chunk_text
    FROM ex
    """


def test_chunks_match_duckdb_replay(spark, duck):
    sdf = pipeline.chunk_documents(spark, SF, size=SIZE, stride=STRIDE)
    srows = [tuple(r) for r in sdf.collect()]
    cur = duck.execute(_replay(SIZE, STRIDE))
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
                "n_chars": pa.array(
                    [len(t) if t else 0 for t in texts], pa.int64()
                ),
            }
        ),
        d / "documents.parquet",
    )
    return str(d)


def test_coverage_and_shape(spark, tmp_path):
    # L = 100, size 64, stride 48: starts 1, 37 (tail-aligned; 49 would
    # overrun), both chunks exactly 64 tokens, together covering 1..100
    text = " ".join(f"t{i}" for i in range(100))
    sf = _write_docs(tmp_path, [text, None])
    rows = sorted(
        (
            r["chunk_idx"],
            r["chunk_start"],
            r["chunk_tokens"],
            r["chunk_text"],
        )
        for r in pipeline.chunk_documents(
            spark, sf, size=64, stride=48
        ).collect()
    )
    assert [(i, s, n) for i, s, n, _ in rows] == [(0, 1, 64), (1, 37, 64)]
    covered = set()
    for _, s, n, t in rows:
        assert len(t.split(" ")) == n
        covered.update(range(s, s + n))
    assert covered == set(range(1, 101))


def test_short_doc_single_chunk(spark, tmp_path):
    sf = _write_docs(tmp_path, ["a b c"])
    rows = pipeline.chunk_documents(spark, sf, size=64, stride=48).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["chunk_idx"], r["chunk_start"], r["chunk_tokens"]) == (0, 1, 3)
    assert r["chunk_text"] == "a b c"


def test_exact_stride_landing_no_duplicate_tail(spark, tmp_path):
    # L = 112, size 64, stride 48: starts 1 and 49 = L - size + 1
    # exactly — no appended tail duplicate
    text = " ".join(f"t{i}" for i in range(112))
    sf = _write_docs(tmp_path, [text])
    rows = pipeline.chunk_documents(spark, sf, size=64, stride=48).collect()
    assert sorted(r["chunk_start"] for r in rows) == [1, 49]


def test_bad_params_raise(spark):
    with pytest.raises(ValueError):
        pipeline.chunk_documents(spark, SF, size=8, stride=0)
    with pytest.raises(ValueError):
        pipeline.chunk_documents(spark, SF, size=8, stride=9)
