"""BFL→Column compiler vs the reference golden corpus, on Spark.

Each corpus row's JSON document becomes a one-row DataFrame (schema
inferred by ``spark.read.json``, mirroring "stable traffic fields
projected into a StructType view", SURVEY.md §1.4); the compiled predicate
must produce the golden truth value.  ``redact`` rows are excluded — the
compiler intentionally routes those to the row backend
(:mod:`basenine_spark.bfl.pyeval`), asserted here via ``UnsupportedBFL``.
"""

import json
import time

import pytest

from basenine_spark.bfl import parse
from basenine_spark.bfl.compiler import Compiled, UnsupportedBFL, compile_filter

from corpus import BOOKSTORE_JSON, EVAL_ROWS, TIME_ROWS, XML_ROWS

NON_REDACT_ROWS = [r for r in EVAL_ROWS if "redact" not in r[0]]
REDACT_QUERIES = sorted({r[0] for r in EVAL_ROWS if "redact" in r[0]})


def _one_row_df(spark, doc: str):
    return spark.read.json(spark.sparkContext.parallelize([doc]))


def _run(spark, query: str, doc: str, now_ms=None) -> bool:
    df = _one_row_df(spark, doc)
    compiled = compile_filter(query, df, now_ms=now_ms)
    assert isinstance(compiled, Compiled)
    if compiled.predicate is None:
        return True
    return df.filter(compiled.predicate).count() == 1


@pytest.mark.parametrize("query,doc,truth,limit,new_json", NON_REDACT_ROWS)
def test_compiler_corpus(spark, query, doc, truth, limit, new_json):
    q = parse(query)
    assert q.limit == limit
    assert _run(spark, query, doc) == truth, f"Query: {query!r} JSON: {doc}"


@pytest.mark.parametrize("query,truth", XML_ROWS)
def test_compiler_xml(spark, query, truth):
    assert _run(spark, query, BOOKSTORE_JSON) == truth, f"Query: {query!r}"


@pytest.mark.parametrize("query,truth", TIME_ROWS)
def test_compiler_time_helpers(spark, query, truth):
    now_ms = int(time.time() * 1000)
    doc = json.dumps(
        {
            "id": 114905,
            "model": "Camaro",
            "brand": {"name": "Chevrolet"},
            "timestamp": now_ms - 2000,
        }
    )
    assert _run(spark, query, doc, now_ms=now_ms) == truth, f"Query: {query!r}"


@pytest.mark.parametrize("query", REDACT_QUERIES)
def test_redact_routes_to_row_backend(spark, query):
    df = _one_row_df(spark, '{"id": 1, "model": "m", "brand": {"name": "b"}}')
    with pytest.raises(UnsupportedBFL):
        compile_filter(query, df)


def test_match_all(spark):
    df = _one_row_df(spark, '{"a": 1}')
    compiled = compile_filter("", df)
    assert compiled.predicate is None
