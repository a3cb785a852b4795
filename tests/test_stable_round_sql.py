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
