"""Shared engine-stable helpers for cross-engine-compared columns.

The driver compares Spark output against a DuckDB oracle by value
hash, so any column that surfaces a rounded double must round the
SAME way in both engines.  Spark ``round()`` (HALF_UP on the decimal
repr) and DuckDB ``round()`` (banker's on the binary double) disagree
on exact half-way doubles — e.g. ``1/128 = 0.0078125`` rounds to
``0.007813`` in Spark and ``0.007812`` in DuckDB.  The repo standard
(VERDICT r7 item 3, TUNING.md) is ``floor(x * 10^k + 0.5) / 10^k`` on
BOTH sides: pure IEEE-754 multiply/add/floor, bit-identical across
engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def stable_round(col: Column, k: int = 6) -> Column:
    """Engine-stable rounding: ``floor(x * 10^k + 0.5) / 10^k``.

    Use for every double column a DuckDB oracle compares by hash; the
    oracle SQL must use the same ``FLOOR(x * 1e{k} + 0.5) / 1e{k}``
    expression.  Intended for non-negative ratios/scores (floor+0.5 is
    round-half-up only for x >= 0).
    """
    scale = float(10**k)
    return F.floor(col * scale + F.lit(0.5)) / F.lit(scale)
