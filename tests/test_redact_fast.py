"""Schema-static redact fast path (VERDICT r2 next-round #3).

``redact("a.b") and <filter>`` compiles to Column projections
(``withField``/``lit``) when every redact argument is a static
struct-field chain disjoint from the paths the filter reads; everything
else stays on the exact row backend.  Semantics target:
``eval.go:406-537`` (redact always truthy, only existing paths set).
"""

import json

import pytest

from basenine_spark.bfl import parse
from basenine_spark.bfl.compiler import (
    REDACTED,
    compile_redact_fast,
)
from basenine_spark.bfl.pyeval import eval_query
from basenine_spark.engine.db import BasenineDB


def _db(spark, docs):
    df = spark.read.json(spark.sparkContext.parallelize(docs))
    return BasenineDB.from_dataframe(spark, df, id_col="id"), df


DOCS = [
    '{"id": 0, "a": {"b": 7, "c": "keep"}, "t": "error", "s": "x"}',
    '{"id": 1, "a": null, "t": "error", "s": "y"}',
    '{"id": 2, "a": {"b": null, "c": "keep"}, "t": "view", "s": "z"}',
]


def test_nested_redact_matches_row_oracle(spark):
    db, df = _db(spark, DOCS)
    out = db.query('redact("a.b") and t == "error"')
    assert "value" not in out.columns  # typed fast path engaged
    got = {r["id"]: r.asDict(recursive=True) for r in out.collect()}
    # pyeval is the exact reference oracle
    q = parse('redact("a.b") and t == "error"')
    for doc in DOCS:
        truth, new_doc = eval_query(q, doc)
        obj = json.loads(new_doc)
        if not truth:
            assert obj["id"] not in got
            continue
        row = got[obj["id"]]
        assert (row["a"] or {}).get("b") == (obj.get("a") or {}).get("b")
        assert (row["a"] or {}).get("c") == (obj.get("a") or {}).get("c")


def test_top_level_redact_includes_present_null(spark):
    # the typed-view convention reads NULL as a present JSON null, and
    # the reference redacts present nulls (pyeval agrees) — so every
    # row's leaf becomes [REDACTED]
    truth, new_doc = eval_query(parse('redact("a")'), DOCS[1])
    assert json.loads(new_doc)["a"] == REDACTED  # pyeval oracle on null
    db, _ = _db(spark, DOCS)
    rows = {r["id"]: r for r in db.query('redact("a")').collect()}
    assert rows[0]["a"] == REDACTED
    assert rows[1]["a"] == REDACTED
    assert rows[2]["a"] == REDACTED


def test_nested_redact_null_leaf_matches_oracle(spark):
    # a.b null (present) → redacted; a null (parent) → stays null
    db, _ = _db(spark, DOCS)
    rows = {r["id"]: r.asDict(recursive=True) for r in db.query('redact("a.b")').collect()}
    assert rows[0]["a"]["b"] == REDACTED
    assert rows[1]["a"] is None  # null parent: reference can't descend
    assert rows[2]["a"]["b"] == REDACTED  # null leaf is present → redacted
    for doc in DOCS:
        _, new_doc = eval_query(parse('redact("a.b")'), doc)
        obj = json.loads(new_doc)
        rid = obj["id"]
        if obj.get("a") is None:
            assert rows[rid]["a"] is None
        else:
            assert rows[rid]["a"]["b"] == obj["a"].get("b")


def test_unknown_path_is_noop(spark):
    db, _ = _db(spark, DOCS)
    rows = db.query('redact("nope.deep") and t == "error"').collect()
    assert len(rows) == 2  # redact truthy, filter applies, nothing redacted
    assert all("value" not in r.asDict() for r in rows)


def test_filter_reading_redacted_path_uses_row_backend(spark):
    # reference evaluates left-to-right over the mutated document:
    # after redact("s"), s == "[REDACTED]" is TRUE for every row that
    # had an s — only the exact row backend reproduces that
    db, _ = _db(spark, DOCS)
    out = db.query('redact("s") and s == "[REDACTED]"')
    assert set(out.columns) == {"id", "value"}  # row backend shape
    docs = [json.loads(r["value"]) for r in out.collect()]
    assert len(docs) == 3 and all(d["s"] == REDACTED for d in docs)


@pytest.mark.parametrize(
    "query",
    [
        'redact("a") or t == "error"',  # not a top-level conjunct
        '!(redact("a"))',
        'redact("a.json().b")',  # re-decode → document surgery
        'redact("..b")',  # recursive descent
        'redact("a[0]")',  # index path
    ],
)
def test_dynamic_forms_fall_back(spark, query, request):
    db, df = _db(spark, DOCS)
    fast = None
    try:
        fast = compile_redact_fast(parse(query), df, protected_roots=("id",))
    except Exception:
        fast = None
    assert fast is None


def test_array_crossing_path_is_noop_both_backends(spark):
    # ojg Child fragments don't descend arrays: the reference no-ops on
    # redact("arr.b") — the row oracle (pyeval) agrees, and the fast
    # path statically skips the path (truthy, nothing redacted)
    docs = ['{"id": 0, "arr": [{"b": 1}]}']
    db, df = _db(spark, docs)
    truth, new_doc = eval_query(parse('redact("arr.b")'), docs[0])
    assert truth and json.loads(new_doc)["arr"][0]["b"] == 1
    fast = compile_redact_fast(parse('redact("arr.b")'), df)
    assert fast is not None and fast[1] == []  # eligible, no projections
    rows = db.query('redact("arr.b")').collect()
    assert rows[0]["arr"][0]["b"] == 1


def test_map_crossing_path_falls_back(spark):
    # MapType: key presence is per-row — only the row backend is exact
    df = spark.createDataFrame(
        [(0, {"b": 1})], "id long, m map<string,long>"
    )
    assert compile_redact_fast(parse('redact("m.b")'), df) is None


def test_overlapping_redact_args_resolve_in_order(spark):
    # fuzz-found: redact("a.c") turns c into a string, so a following
    # redact("a.c.d") is the reference's no-op (can't descend a string);
    # resolution must track the mutated shape or the plan fails analysis
    docs = ['{"id": 0, "a": {"c": {"d": 2}}, "num": 1}']
    db, df = _db(spark, docs)
    row = db.query('redact("a.c") and redact("a.c.d")').collect()[0]
    assert row["a"]["c"] == REDACTED
    _, new_doc = eval_query(parse('redact("a.c") and redact("a.c.d")'), docs[0])
    assert json.loads(new_doc)["a"]["c"] == REDACTED
    # reverse order: leaf redact first, then the whole subtree
    row = db.query('redact("a.c.d") and redact("a.c")').collect()[0]
    assert row["a"]["c"] == REDACTED
    _, new_doc = eval_query(parse('redact("a.c.d") and redact("a.c")'), docs[0])
    assert json.loads(new_doc)["a"]["c"] == REDACTED
