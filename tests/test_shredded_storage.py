"""Shredded storage: ingest parses each document ONCE into a typed
``doc`` struct column, so durable-mode BFL queries are plain parquet
scans (column pruning, nested predicate pushdown, row-group stats)
instead of a corpus-wide ``from_json``.

The raw ``value`` remains the record of truth (row backend, legacy
readers); shredding is an access path, disabled automatically when it
can't be exact: logs predating the feature, a dynamic insertion-filter
batch (stored shape unknowable pre-write), or non-additive schema
evolution (a common leaf changed type).
"""

import json

import pytest
from pyspark.sql import functions as F

from basenine_spark.bfl.compiler import compile_filter
from basenine_spark.engine.db import BasenineDB


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_shredded_query_has_no_json_parse(spark, tmp_path):
    db = BasenineDB(spark, path=str(tmp_path / "s"))
    db.insert_json([json.dumps({"a": i, "s": "x" * i}) for i in range(20)])
    assert db._shred_ok
    df = db.query("a > 10")
    plan = _plan(df)
    assert "from_json" not in plan and "JsonToStructs" not in plan, plan
    assert sorted(r["a"] for r in df.collect()) == list(range(11, 20))


def test_shredded_filter_pushdown_reaches_parquet(spark, tmp_path):
    db = BasenineDB(spark, path=str(tmp_path / "s"))
    db.insert_json([json.dumps({"a": i}) for i in range(50)])
    view = db._typed_view()
    comp = compile_filter("a > 40", view)
    plan = _plan(view.filter(comp.predicate))
    assert "PushedFilters: [" in plan
    assert "doc.a" in plan.split("PushedFilters: [", 1)[1].split("]", 1)[0], plan


def test_additive_evolution_keeps_shredding(spark, tmp_path):
    db = BasenineDB(spark, path=str(tmp_path / "s"))
    db.insert_json(['{"a": 1}'])
    db.insert_json(['{"a": 2, "b": "new"}'])  # new field: additive
    assert db._shred_ok
    rows = {r["a"]: r for r in db.query("").collect()}
    assert rows[1]["b"] is None and rows[2]["b"] == "new"


def test_null_then_typed_field_keeps_shredding(spark, tmp_path):
    # an all-null field binds no parquet type (dropped from the write
    # schema), so typing it later is still additive
    db = BasenineDB(spark, path=str(tmp_path / "s"))
    db.insert_json(['{"a": 1, "x": null}'])
    db.insert_json(['{"a": 2, "x": 7}'])
    assert db._shred_ok
    rows = {r["a"]: r["x"] for r in db.query("").collect()}
    assert rows == {1: None, 2: 7}


def test_type_widening_falls_back_to_from_json(spark, tmp_path):
    db = BasenineDB(spark, path=str(tmp_path / "s"))
    db.insert_json(['{"a": 1}'])
    assert db._shred_ok
    db.insert_json(['{"a": 2.5}'])  # long -> double: non-additive
    assert not db._shred_ok
    assert sorted(r["a"] for r in db.query("a > 0").collect()) == [1.0, 2.5]
    plan = _plan(db.query("a > 0"))
    assert "from_json" in plan or "JsonToStructs" in plan  # fallback path


def test_type_narrowing_batch_keeps_shredding(spark, tmp_path):
    """Round-14 regression (found by the persistence driver row): a
    batch whose leaf is NARROWER than the accumulated type (int after
    double) does NOT change the union schema, so shredding legitimately
    stays on — but the batch must be WRITTEN with the merged (double)
    leaf type, or its INT64 parquet column is unreadable under the
    union read schema (vectorized reader can't upcast INT64→double)."""
    db = BasenineDB(spark, path=str(tmp_path / "s"))
    db.insert_json(['{"a": 1.5}'])
    assert db._shred_ok
    db.insert_json(['{"a": 2}'])  # double then int: still additive
    assert db._shred_ok  # union schema unchanged — shredding stays on
    df = db.query("a > 0")
    assert sorted(r["a"] for r in df.collect()) == [1.5, 2.0]
    plan = _plan(df)
    assert "from_json" not in plan and "JsonToStructs" not in plan, plan


def test_type_narrowing_bulk_batch_keeps_shredding(spark, tmp_path):
    """Bulk-path twin of the narrowing regression (insert_json_df has
    its own shred-schema derivation)."""
    db = BasenineDB(spark, path=str(tmp_path / "s"))
    db.insert_json_df(spark.createDataFrame([('{"a": 1.5}',)], "j string"))
    assert db._shred_ok
    db.insert_json_df(spark.createDataFrame([('{"a": 2}',)], "j string"))
    assert db._shred_ok
    assert sorted(r["a"] for r in db.query("a > 0").collect()) == [1.5, 2.0]


def test_dynamic_insertion_filter_disables_shredding(spark, tmp_path):
    db = BasenineDB(spark, path=str(tmp_path / "s"))
    db.set_insertion_filter('kind == "keep"')  # can drop records
    db.insert_json(['{"kind": "keep", "n": 1}', '{"kind": "drop", "n": 2}'])
    assert not db._shred_ok
    assert [r["n"] for r in db.query("").collect()] == [1]


def test_pure_redact_filter_keeps_shredding(spark, tmp_path):
    db = BasenineDB(spark, path=str(tmp_path / "s"))
    db.set_insertion_filter('redact("secret")')
    db.insert_json(['{"n": 1, "secret": 42}'])
    assert db._shred_ok
    row = db.query("").collect()[0]
    assert row["secret"] == "[REDACTED]"


def test_shred_flag_survives_restart(spark, tmp_path):
    path = str(tmp_path / "s")
    db = BasenineDB(spark, path=path)
    db.insert_json(['{"a": 1}'])
    db2 = BasenineDB(spark, path=path)
    assert db2._shred_ok
    assert "from_json" not in _plan(db2.query("a == 1"))

    # non-additive evolution then restart: stays off
    db2.insert_json(['{"a": "now-a-string"}'])
    assert not db2._shred_ok
    db3 = BasenineDB(spark, path=path)
    assert not db3._shred_ok


def test_legacy_state_defaults_to_unshredded(spark, tmp_path):
    path = str(tmp_path / "s")
    db = BasenineDB(spark, path=path)
    db.insert_json(['{"a": 1}'])
    state = json.load(open(db._state_path))
    state.pop("shred_ok")
    json.dump(state, open(db._state_path, "w"))
    db2 = BasenineDB(spark, path=path)
    assert not db2._shred_ok  # data + no flag = can't trust the files
    assert db2.query("a == 1").count() == 1


def test_flush_restores_shredding(spark, tmp_path):
    db = BasenineDB(spark, path=str(tmp_path / "s"))
    db.insert_json(['{"a": 1}'])
    db.insert_json(['{"a": 2.5}'])  # widen -> off
    assert not db._shred_ok
    db.flush()
    assert db._shred_ok
    db.insert_json(['{"a": 3}'])
    assert db._shred_ok and db.query("").count() == 1


def test_shredded_matches_from_json_results(spark, tmp_path):
    # same query, both access paths, identical rows
    docs = [
        json.dumps({"a": i, "nested": {"k": i * 2}, "s": f"v{i}"})
        for i in range(30)
    ]
    db = BasenineDB(spark, path=str(tmp_path / "s"))
    db.insert_json(docs)
    q = 'a > 10 and nested.k <= 50 and s.startsWith("v")'
    shredded = sorted(r["a"] for r in db.query(q).collect())
    db._shred_ok = False  # force the from_json path
    fallback = sorted(r["a"] for r in db.query(q).collect())
    assert shredded == fallback == list(range(11, 26))
