"""The oracle-side half of the engine-stable rounding contract
(VERDICT r9 item 4): ``registry._register`` rewrites every natural
``round()`` in an oracle SQL string into the same FLOOR idiom the
Spark side's ``stable_round`` emits, so the two engines evaluate the
identical IEEE-754 sequence — including on negative half-way doubles,
where native DuckDB ``round()`` and floor+0.5 round in OPPOSITE
directions.
"""

import re

import duckdb
import pytest

from basenine_spark.ops.util import stable_round_sql


def test_two_arg_round_rewritten():
    assert (
        stable_round_sql("SELECT round(sum(x), 2) AS s FROM t")
        == "SELECT FLOOR((sum(x)) * 1e2 + 0.5) / 1e2 AS s FROM t"
    )


def test_one_arg_round_rewritten():
    assert (
        stable_round_sql("CAST(round(x * 255 / y) AS BIGINT)")
        == "CAST(FLOOR((x * 255 / y) + 0.5) AS BIGINT)"
    )


def test_nested_parens_and_commas():
    out = stable_round_sql("round(coalesce(a, b) / nullif(c, 0), 4)")
    assert out == "FLOOR((coalesce(a, b) / nullif(c, 0)) * 1e4 + 0.5) / 1e4"


def test_nested_round_inside_round():
    out = stable_round_sql("round(round(x, 4) + y, 2)")
    assert (
        out
        == "FLOOR((FLOOR((x) * 1e4 + 0.5) / 1e4 + y) * 1e2 + 0.5) / 1e2"
    )


def test_word_boundary_not_mangled():
    sql = "SELECT background(x), stable_round_marker FROM t"
    assert stable_round_sql(sql) == sql


def test_quoted_string_parens_opaque():
    out = stable_round_sql("round(instr(s, '(('), 2)")
    assert out == "FLOOR((instr(s, '((')) * 1e2 + 0.5) / 1e2"


def test_non_literal_precision_raises():
    with pytest.raises(ValueError):
        stable_round_sql("round(x, k)")


def test_unbalanced_raises():
    with pytest.raises(ValueError):
        stable_round_sql("round(x, 2")


def test_registry_oracles_have_no_native_round():
    import __spark_entry__ as em

    pat = re.compile(r"(?<![A-Za-z0-9_])round\s*\(", re.I)
    bad = [n for n, s in em.oracle_sql().items() if pat.search(s)]
    assert bad == []


def test_negative_half_matches_floor_idiom_not_native_round():
    # -1.00005 has an exact-half shortest repr at 4 decimals; DuckDB
    # native round() takes it away from zero (-1.0001 when the binary
    # value cooperates) while floor+0.5 takes halves toward +inf. The
    # rewritten SQL must agree with Python's floor emulation of the
    # Spark column expression on a sweep of signed values.
    con = duckdb.connect()
    import math

    for x in [-2.5e-4, -1.5e-4, -0.73125, -1.00005, 0.00005, 2.5e-4, 1.23456]:
        sql = stable_round_sql(f"SELECT round({x!r}, 4) AS v")
        (got,) = con.execute(sql).fetchone()
        want = math.floor(x * 1e4 + 0.5) / 1e4
        assert got == want, (x, got, want)


# -- property test: the rewriter is total over the oracle grammar ------------
try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HYP = True
except ImportError:  # pragma: no cover
    _HYP = False

if _HYP:
    _atoms = st.sampled_from(
        ["x", "y.z", "sum(a)", "count(*)", "1.5", "coalesce(a, b)",
         "'lit,with)parens('", "nullif(c, 0)"]
    )

    @st.composite
    def _exprs(draw, depth=0):
        if depth >= 3:
            return draw(_atoms)
        kind = draw(st.integers(0, 3))
        if kind == 0:
            return draw(_atoms)
        if kind == 1:
            return f"({draw(_exprs(depth + 1))} + {draw(_exprs(depth + 1))})"
        if kind == 2:
            k = draw(st.integers(0, 6))
            return f"round({draw(_exprs(depth + 1))}, {k})"
        return f"round({draw(_exprs(depth + 1))})"

    @given(_exprs())
    @settings(max_examples=200, deadline=None)
    def test_rewriter_total_and_complete(expr):
        """Every round() — arbitrarily nested, with quoted commas and
        parens inside string literals — is rewritten; the output never
        contains a native round( and is paren-balanced outside
        literals."""
        sql = f"SELECT {expr} AS v FROM t"
        out = stable_round_sql(sql)
        assert not re.search(r"(?<![A-Za-z0-9_])round\s*\(", out, re.I)
        # strip single-quoted literals, then parens must balance
        stripped = re.sub(r"'[^']*'", "", out)
        depth = 0
        for ch in stripped:
            depth += ch == "("
            depth -= ch == ")"
            assert depth >= 0
        assert depth == 0

    @given(st.floats(-1e6, 1e6, allow_nan=False), st.integers(0, 6))
    @settings(max_examples=200, deadline=None)
    def test_rewritten_sql_matches_python_floor(x, k):
        """DuckDB evaluating the rewritten idiom agrees with the exact
        same IEEE sequence computed in Python — including negative
        half-way doubles, where native round() would disagree."""
        import math

        out = stable_round_sql(f"SELECT round({x!r}, {k}) AS v")
        (got,) = duckdb.execute(out).fetchone()
        scale = float(10**k)
        want = math.floor(x * scale + 0.5) / scale
        assert got == want
