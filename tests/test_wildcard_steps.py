"""P11 extensions: Key/Index/Wildcard segments AFTER a wildcard, on the
typed fast path (previously routed to the row backend).

Semantics oracle: pyeval (ojg collects existing matches only; empty
result set collapses the expression, eval.go:615-624).
"""

import json

from basenine_spark.bfl import parse
from basenine_spark.bfl.compiler import compile_filter
from basenine_spark.bfl.pyeval import eval_query


def _both(spark, query: str, doc: str) -> bool:
    df = spark.read.json(spark.sparkContext.parallelize([doc]))
    compiled = compile_filter(query, df)
    spark_truth = (
        True
        if compiled.predicate is None
        else df.filter(compiled.predicate).count() == 1
    )
    py_truth, _ = eval_query(parse(query), doc)
    assert spark_truth == py_truth, (
        f"compiler={spark_truth} pyeval={py_truth} for {query!r}"
    )
    return spark_truth


DOC_STRUCTS = json.dumps(
    {"items": [{"name": "a", "price": 10}, {"name": "b", "price": 20}]}
)
DOC_NESTED = json.dumps({"m": [[1, 2], [3], [4, 5, 6]]})


def test_field_after_wildcard(spark):
    assert _both(spark, 'items.*.name == "b"', DOC_STRUCTS) is True
    assert _both(spark, "items.*.price > 15", DOC_STRUCTS) is True
    assert _both(spark, "items.*.price > 25", DOC_STRUCTS) is False


def test_index_after_wildcard(spark):
    # m.*[1] → [2, 5] (the 1-element row contributes nothing)
    assert _both(spark, "m.*[1] == 5", DOC_NESTED) is True
    assert _both(spark, "m.*[1] == 3", DOC_NESTED) is False
    # out-of-bounds everywhere → empty result → collapse → false
    assert _both(spark, "m.*[9] == 1 or m.*[9] == 0", DOC_NESTED) is False


def test_wildcard_after_wildcard_flatten(spark):
    assert _both(spark, "m.*.* == 4", DOC_NESTED) is True
    assert _both(spark, "m.*.* > 5", DOC_NESTED) is True
    assert _both(spark, "m.*.* > 6", DOC_NESTED) is False


def test_key_after_wildcard_on_maps(spark):
    # headers.*["k"] over array<map<string,string>> — only elements with
    # the key contribute
    df = spark.createDataFrame(
        [([{"k": "v1"}, {"other": "x"}, {"k": "v2"}],)],
        "headers array<map<string,string>>",
    )
    doc = json.dumps({"headers": [{"k": "v1"}, {"other": "x"}, {"k": "v2"}]})
    for q, expected in [
        ('headers.*["k"] == "v2"', True),
        ('headers.*["k"] == "x"', False),
        ('headers.*["missing"] == "v1"', False),  # empty result → collapse
    ]:
        compiled = compile_filter(q, df)
        spark_truth = df.filter(compiled.predicate).count() == 1
        py_truth, _ = eval_query(parse(q), doc)
        assert spark_truth == py_truth == expected, (q, spark_truth, py_truth)
