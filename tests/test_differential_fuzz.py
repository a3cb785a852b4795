"""Differential fuzzing: the BFL→Column compiler against the exact
Python evaluator over randomized queries × documents.

The reference has no property-based tests (SURVEY §5); this adds the
missing layer: deterministic pseudo-random documents (scalars including
nulls, numeric-looking strings, arrays, nested objects, json()-encoded
bodies) × pseudo-random queries from the BFL grammar, asserting the
vectorized fast path agrees with pyeval row by row. Vectorized: one
Spark job per query evaluates all documents at once.
"""

import json
import random

import pytest

from basenine_spark.bfl import parse
from basenine_spark.bfl.compiler import UnsupportedBFL, compile_filter
from basenine_spark.bfl.pyeval import eval_query

SEED = 20260813
N_DOCS = 60

FIELDS = ["num", "fnum", "s", "snum", "flag", "nil", "arr", "obj", "body"]


def _gen_doc(rnd: random.Random, present: set) -> dict:
    """One document. Field *presence* is decided per test case (a typed
    table either has a column or it doesn't — a field missing from one
    row of a typed view is a NULL, which is the compiler's documented
    JSON-null convention and exactly what the row backend's serialized
    rows contain). Per-document NULLs exercise the null coercions;
    static collapse is exercised by absent-in-all fields. True per-doc
    key absence survives only inside the json() body, where the Variant
    path distinguishes it exactly."""
    doc = {
        "num": rnd.choice([0, 1, -3, 7, 29, 1000, 114905, None]),
        "fnum": rnd.choice([0.0, 1.5, -2.25, 3.14159265, 42.0, 1e3, None]),
        "s": rnd.choice(["", "x", "Chevrolet", "null", "false", "29", None]),
        "snum": rnd.choice(["1.50", "0", "-1", "2e2", "abc"]),
        "flag": rnd.choice([True, False, None]),
        "nil": None,
        "arr": rnd.choice([[], [1, 2, 3], [5], [-1, 10]]),
        "obj": {"k": rnd.choice([1, "v", None])},
    }
    # nested JSON body exercising the variant path (keys may be absent)
    inner = {
        "price": rnd.choice([1.5, 1.50, 30, "1.50", None]),
        "name": rnd.choice(["Chevrolet", "Ford", ""]),
        "tags": rnd.choice([[], ["a", "b"], [1, 2]]),
        "ok": rnd.choice([True, False, "true"]),
    }
    for f in list(inner):
        if rnd.random() < 0.2:
            del inner[f]
    doc["body"] = json.dumps(inner)
    return {k: v for k, v in doc.items() if k in present}


_LITS = ['"Chevrolet"', '"x"', '"null"', '"29"', '"1.5"', "0", "1", "29", "1.5", "-1", "1000", "nil", "true", "false", 'r"ev"', 'r"^C"']
_PATHS = [
    "num", "fnum", "s", "snum", "flag", "nil", "arr", "arr[0]", "arr[5]",
    "arr.*", "obj.k", 'obj["k"]', 'obj["absent"]', "missing", "missing.deep",
]
_JSON_PATHS = [
    "body.json().price", "body.json().name", "body.json().tags",
    "body.json().ok", "body.json().absent", 'body.json()["name"]',
    "body.json().tags[0]", "missing.json().x",
]
_OPS = ["==", "!=", ">", "<", ">=", "<="]


def _gen_term(rnd: random.Random) -> str:
    kind = rnd.random()
    if kind < 0.45:
        lhs = rnd.choice(_PATHS + _JSON_PATHS)
        return f"{lhs} {rnd.choice(_OPS)} {rnd.choice(_LITS)}"
    if kind < 0.6:
        return rnd.choice(_PATHS + _JSON_PATHS)  # bare truthiness
    if kind < 0.7:
        return f"!{rnd.choice(['flag', 'missing', 's'])}"
    if kind < 0.8:
        h = rnd.choice(["startsWith", "endsWith", "contains"])
        target = rnd.choice(["s", "snum", "missing"])
        arg = rnd.choice(['"C"', '"x"', '"1"'])
        return f"{target}.{h}({arg})"
    lhs = rnd.choice(["num", "fnum", "arr"])
    return f"{lhs} {rnd.choice(_OPS)} {rnd.choice(['num', 'fnum', 's'])}"


def _gen_query(rnd: random.Random) -> str:
    terms = [_gen_term(rnd) for _ in range(rnd.randint(1, 3))]
    out = f"({terms[0]})"
    for t in terms[1:]:
        out = f"{out} {rnd.choice(['and', 'or'])} ({t})"
    return out


@pytest.mark.parametrize("qi", range(30))
def test_differential_compiler_vs_pyeval(spark, qi):
    rnd = random.Random(SEED + qi)
    query = _gen_query(rnd)
    # per-case column set: most fields present; occasionally drop one
    # entirely (static-collapse fuzzing); body always present
    present = {f for f in FIELDS if f == "body" or rnd.random() > 0.1}
    docs = [
        json.dumps(_gen_doc(random.Random(SEED * 1000 + qi * N_DOCS + i), present))
        for i in range(N_DOCS)
    ]

    expected = []
    for d in docs:
        truth, _ = eval_query(parse(query), d)
        expected.append(bool(truth))

    df = spark.read.json(spark.sparkContext.parallelize(docs)).withColumn(
        "_doc_idx", __import__("pyspark").sql.functions.monotonically_increasing_id()
    )
    # read.json may reorder / merge schemas; re-derive doc order via zip
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "idx long, raw string"
    )
    from pyspark.sql import functions as F

    sample = spark.read.json(spark.sparkContext.parallelize(docs))
    typed = df.select("idx", F.from_json("raw", sample.schema).alias("doc")).select(
        "idx", "doc.*"
    )
    try:
        compiled = compile_filter(query, typed)
    except UnsupportedBFL:
        pytest.skip(f"row-backend query shape: {query}")
    if compiled.predicate is None:
        got_idx = set(range(N_DOCS))
    else:
        got_idx = {r["idx"] for r in typed.filter(compiled.predicate).select("idx").collect()}
    mismatches = [
        (i, docs[i]) for i in range(N_DOCS) if (i in got_idx) != expected[i]
    ]
    assert not mismatches, (
        f"query {query!r}: {len(mismatches)} disagreements; first: "
        f"doc={mismatches[0][1]} compiler={mismatches[0][0] in got_idx} "
        f"pyeval={expected[mismatches[0][0]]}"
    )


# -- redact fast path vs pyeval (round 3) -----------------------------------
#
# The schema-static redact compiler must agree with the exact evaluator
# on (a) which rows survive the other conjuncts and (b) exactly which
# leaves read [REDACTED] afterwards — across nested structs, null
# parents/leaves, absent names, array-crossing no-ops.

_R_POOL = [
    "s", "num", "a", "a.b", "a.c", "a.c.d", "a.missing", "missing",
    "missing.deep", "arr.b",
]
_R_FILTERS = {
    None: set(),
    "num > 0": {"num"},
    's == "x"': {"s"},
    "num == 1 or s": {"num", "s"},
    "!(num > 5)": {"num"},
}


def _r_doc(rnd: random.Random) -> dict:
    a = rnd.choice(
        [None, {"b": rnd.choice([1, "y", None]), "c": rnd.choice([None, {"d": rnd.choice([2, None])}])}]
    )
    return {
        "idx": None,  # filled by caller
        "s": rnd.choice(["x", "", None]),
        "num": rnd.choice([0, 1, 7, None]),
        "a": a,
        "arr": [{"b": 1}],
    }


def _leaf_paths(args):
    for arg in args:
        yield tuple(arg.split("."))


@pytest.mark.parametrize("qi", range(15))
def test_differential_redact_fast_vs_pyeval(spark, qi):
    from basenine_spark.bfl.compiler import (
        apply_redact_paths,
        compile_redact_fast,
    )

    rnd = random.Random(77000 + qi)
    args = rnd.sample(_R_POOL, rnd.randint(1, 3))
    flt = rnd.choice(list(_R_FILTERS))
    query = " and ".join(
        [f'redact("{a}")' for a in args] + ([flt] if flt else [])
    )
    docs = []
    for i in range(40):
        d = _r_doc(random.Random(88000 + qi * 100 + i))
        d["idx"] = i
        docs.append(json.dumps(d))

    sample = spark.read.json(spark.sparkContext.parallelize(docs))
    q = parse(query)
    fast = compile_redact_fast(q, sample)
    # a filter that reads a redacted root must fall back (left-to-right
    # mutation visibility); everything else in the pool is eligible
    tainted = {a.split(".")[0] for a in args} & _R_FILTERS[flt]
    if tainted:
        assert fast is None, f"tainted query took the fast path: {query}"
        pytest.skip(f"row-backend by design: {query}")
    assert fast is not None, f"eligible query fell back: {query}"
    pred, paths = fast
    out = sample if pred is None else sample.filter(pred)
    out = apply_redact_paths(out, paths)
    got = {r["idx"]: r.asDict(recursive=True) for r in out.collect()}

    def dig(obj, path):
        for name in path:
            if not isinstance(obj, dict) or obj.get(name) is None:
                return obj.get(name) if isinstance(obj, dict) else None
            obj = obj[name]
        return obj

    for doc in docs:
        truth, new_doc = eval_query(q, doc)
        obj = json.loads(new_doc)
        i = obj["idx"]
        assert (i in got) == bool(truth), f"{query} over {doc}"
        if not truth:
            continue
        for path in _leaf_paths(args):
            exp = dig(obj, path)
            act = dig(got[i], path)
            assert (exp == "[REDACTED]") == (act == "[REDACTED]"), (
                f"{query} path {path} over {doc}: pyeval={exp!r} fast={act!r}"
            )
