"""BFL semantics: pure-Python evaluator vs the reference's golden corpus.

Corpus source: ``/root/reference/server/lib/eval_test.go`` (ported in
``tests/corpus.py``) + macro goldens (``macro_test.go``)."""

import base64
import json
import time

import pytest

from basenine_spark.bfl import add_macro, expand_macros, parse, validate
from basenine_spark.bfl.pyeval import eval_query, path_get, parse_path_string

from corpus import (
    BOOKSTORE_JSON,
    EVAL_ROWS,
    MACRO_DEFS,
    MACRO_EXPECTED,
    MACRO_QUERY,
    REDACT_ROWS,
    TIME_ROWS,
    XML_ROWS,
)


@pytest.mark.parametrize("query,doc,truth,limit,new_json", EVAL_ROWS)
def test_eval_corpus(query, doc, truth, limit, new_json):
    q = parse(query)
    assert q.limit == limit, f"limit extraction for {query!r}"
    got_truth, got_json = eval_query(q, doc)
    assert got_truth == truth, f"Query: {query!r} JSON: {doc}"
    expected = new_json if new_json is not None else doc
    assert json.loads(got_json) == json.loads(expected), f"Query: {query!r}"


@pytest.mark.parametrize("query,truth", XML_ROWS)
def test_eval_xml(query, truth):
    q = parse(query)
    got_truth, _ = eval_query(q, BOOKSTORE_JSON)
    assert got_truth == truth, f"Query: {query!r}"


@pytest.mark.parametrize("query,truth,doc,expected,str_compare", REDACT_ROWS)
def test_eval_redact(query, truth, doc, expected, str_compare):
    q = parse(query)
    got_truth, new_json = eval_query(q, doc)
    assert got_truth == truth

    nested = path_get(json.loads(new_json), parse_path_string("response.body"))[0]
    try:
        nested = base64.b64decode(nested, validate=True).decode("utf-8")
    except Exception:
        pass
    try:
        expected = base64.b64decode(expected, validate=True).decode("utf-8")
    except Exception:
        pass

    if str_compare:
        assert nested == expected
    else:
        assert json.loads(nested) == json.loads(expected)


@pytest.mark.parametrize("query,truth", TIME_ROWS)
def test_eval_time_helpers(query, truth):
    now_ms = int(time.time() * 1000)
    doc = json.dumps(
        {
            "id": 114905,
            "model": "Camaro",
            "brand": {"name": "Chevrolet"},
            "timestamp": now_ms - 2000,
        }
    )
    q = parse(query)
    got_truth, _ = eval_query(q, doc, now_ms=now_ms)
    assert got_truth == truth, f"Query: {query!r}"


def test_macro_expansion_golden():
    macros = {}
    for name, expansion in MACRO_DEFS:
        add_macro(macros, name, expansion)
    assert expand_macros(macros, MACRO_QUERY) == MACRO_EXPECTED


def test_empty_query_matches_everything():
    q = parse("")
    truth, new_json = eval_query(q, '{"a": 1}')
    assert truth is True
    assert json.loads(new_json) == {"a": 1}


def test_validate_mode():
    ok, msg = validate('brand.name == "Chevrolet"')
    assert ok and msg == "OK"
    ok, msg = validate("=")
    assert not ok and msg.startswith("1:1:")
    ok, msg = validate("")
    assert ok


def test_limit_left_most_wins():
    assert parse("limit(5) and limit(10)").limit == 5
    assert parse('x == 1 and limit(7)').limit == 7
