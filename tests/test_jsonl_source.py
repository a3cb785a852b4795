"""JSONL ingest: quarantine captures exactly the broken lines, strict
fails fast, drop drops, valid all-null rows are NOT quarantined."""

import json

import pytest

from basenine_spark.sources.jsonl import ingest_jsonl_documents, read_jsonl

SCHEMA = "doc_id bigint, text string, lang string, source string"


def _write(tmp_path, lines):
    p = tmp_path / "corpus.jsonl"
    p.write_text("\n".join(lines) + "\n")
    return str(p)


GOOD = [
    json.dumps({"doc_id": 1, "text": "hello world", "lang": "en", "source": "a"}),
    json.dumps({"doc_id": 2, "text": None, "lang": None, "source": "b"}),
    "{}",  # valid JSON, all fields null — NOT corrupt
]
BAD = [
    '{"doc_id": 3, "text": "unterminated',
    "not json at all",
    '{"doc_id": "notanumber", "text": "x"}',  # type mismatch
]


def test_quarantine_split(spark, tmp_path):
    path = _write(tmp_path, GOOD + BAD)
    good, bad = read_jsonl(spark, path, SCHEMA)
    assert good.count() == 3
    quarantined = sorted(r["raw"] for r in bad.collect())
    assert quarantined == sorted(BAD)


def test_strict_fails_fast(spark, tmp_path):
    path = _write(tmp_path, GOOD + BAD[:1])
    df, none = read_jsonl(spark, path, SCHEMA, policy="strict")
    assert none is None
    with pytest.raises(Exception):
        df.count()


def test_drop_policy(spark, tmp_path):
    path = _write(tmp_path, GOOD + BAD)
    df, none = read_jsonl(spark, path, SCHEMA, policy="drop")
    assert none is None
    # DROPMALFORMED removes the syntactically unparseable lines; a
    # field-level TYPE mismatch survives with that field nulled (Spark
    # semantics — which is exactly why quarantine is the default: drop
    # hides less than you'd hope)
    ids = {r["doc_id"] for r in df.collect()}
    assert {1, 2}.issubset(ids)
    assert df.count() == len(GOOD) + 1


def test_documents_ingest_shape(spark, tmp_path):
    path = _write(tmp_path, GOOD + BAD)
    typed, bad = ingest_jsonl_documents(spark, path)
    rows = {r["doc_id"]: r for r in typed.collect()}
    # the all-null "{}" row has no doc_id and is excluded from typed
    assert set(rows) == {1, 2}
    assert rows[1]["n_chars"] == len("hello world")
    assert rows[2]["n_chars"] == 0  # null text -> 0, recomputed
    assert typed.columns == ["doc_id", "text", "lang", "source", "n_chars"]
    assert bad.count() == len(BAD)


def test_bad_policy_rejected(spark, tmp_path):
    path = _write(tmp_path, GOOD)
    with pytest.raises(ValueError):
        read_jsonl(spark, path, SCHEMA, policy="yolo")
