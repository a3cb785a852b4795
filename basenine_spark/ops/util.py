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
    expression (``stable_round_sql`` rewrites natural ``round()`` SQL
    into it at registration time, so the pairing cannot drift).

    Convention for signed values (z-scores, centered drifts, cosine
    sims): half-way points round toward +inf — NOT half-away-from-zero
    as DuckDB/Spark native ``round()`` would.  That asymmetry is fine
    for the driver compare because BOTH engines evaluate the identical
    IEEE-754 multiply/add/floor sequence, so they agree bit-for-bit on
    every input, negative halves included.  What is NOT safe is mixing
    this with native ``round()`` on the other side (they disagree on
    negative halves in opposite directions — VERDICT r9 item 4).
    """
    scale = float(10**k)
    return F.floor(col * scale + F.lit(0.5)) / F.lit(scale)


def stable_round_sql(sql: str) -> str:
    """Rewrite every ``round(expr[, k])`` in a DuckDB oracle SQL string
    into the engine-stable FLOOR idiom matching :func:`stable_round`:

    * ``round(e, k)`` -> ``FLOOR((e) * 1e{k} + 0.5) / 1e{k}``
    * ``round(e)``    -> ``FLOOR((e) + 0.5)``

    Applied by ``registry._register`` to every oracle at registration
    time, so an oracle written with natural ``round()`` can never pair
    a native-rounding DuckDB side with a ``stable_round`` Spark side
    again (the r9 latent class: 26 oracles left on native ``round()``
    after a Spark-side-only sweep).  The second argument must be a
    bare non-negative integer literal; anything else raises so a bad
    oracle fails at import, not in the driver.
    """
    import re

    # Single-quoted literal spans ('' is the escaped quote): a
    # ``round(`` whose match starts inside one is literal TEXT, not a
    # call — rewriting it would corrupt the SQL (e.g. a regex pattern
    # ``regexp_extract(s, 'round(x)')``). ADVICE r10: the arg scanner
    # below already treats quotes as opaque, but the top-level pattern
    # search did not.
    spans: list[tuple[int, int]] = []
    p = 0
    while True:
        q0 = sql.find("'", p)
        if q0 < 0:
            break
        q1 = q0
        while True:
            q1 = sql.find("'", q1 + 1)
            if q1 < 0:  # unterminated literal: opaque to end of string
                q1 = len(sql) - 1
                break
            if q1 + 1 < len(sql) and sql[q1 + 1] == "'":
                q1 += 1  # '' escape — stay inside the literal
                continue
            break
        spans.append((q0, q1))
        p = q1 + 1

    out = []
    i = 0
    pat = re.compile(r"(?<![A-Za-z0-9_])round\s*\(", re.IGNORECASE)
    while True:
        m = pat.search(sql, i)
        if not m:
            out.append(sql[i:])
            return "".join(out)
        lit = next(
            (s for s in spans if s[0] <= m.start() <= s[1]), None
        )
        if lit is not None:  # inside a string literal — copy verbatim
            out.append(sql[i : lit[1] + 1])
            i = lit[1] + 1
            continue
        out.append(sql[i : m.start()])
        # balanced-paren scan from the opening '(' (single-quoted SQL
        # strings are opaque); top-level commas split the args
        j = m.end()
        depth = 1
        args, arg_start = [], j
        while depth:
            if j >= len(sql):
                raise ValueError(f"unbalanced round( in oracle SQL: {sql[m.start():m.start()+80]!r}")
            c = sql[j]
            if c == "'":
                j = sql.index("'", j + 1)
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0:
                    args.append(sql[arg_start:j].strip())
            elif c == "," and depth == 1:
                args.append(sql[arg_start:j].strip())
                arg_start = j + 1
            j += 1
        args = [stable_round_sql(a) for a in args]  # nested round()
        if len(args) == 1:
            out.append(f"FLOOR(({args[0]}) + 0.5)")
        elif len(args) == 2 and re.fullmatch(r"\d+", args[1]):
            k = int(args[1])
            out.append(f"FLOOR(({args[0]}) * 1e{k} + 0.5) / 1e{k}")
        else:
            raise ValueError(f"round() with non-literal precision in oracle SQL: {args!r}")
        i = j


# ---------------------------------------------------------------------------
# Lifecycle phase timing (VERDICT r11 #4)
#
# The *_verified contract rows run a production operator AND its
# ground-truth twin (quadratic exact kNN, second full selection, numpy
# power iteration...). A single wall-clock number over the pair lets
# the budget gate pin only the harness, not the operator. Contract
# functions wrap their production-path portion in
# ``timed_phase("build")`` and the oracle recompute in
# ``timed_phase("verify")``; bench.py snapshots PHASE_TIMINGS after
# each lifecycle entry and budgets the build phase separately.
#
# The registry is driven single-threaded per process (bench loop /
# driver sweep), so a module-level dict is safe; a parallel driver
# would see merged timings — harmless for correctness, the phases are
# bench telemetry only.
# ---------------------------------------------------------------------------

PHASE_TIMINGS: dict[str, float] = {}


def reset_phase_timings() -> None:
    PHASE_TIMINGS.clear()


class timed_phase:
    """Context manager accumulating wall-clock into PHASE_TIMINGS.

    Eager-evaluation caveat: only work FORCED inside the block (a
    ``localCheckpoint(eager=True)``, ``.count()``, ``.collect()``)
    is attributed to the phase — a lazy DataFrame returned through the
    block boundary bills its compute to whoever forces it. Contract
    functions already force their expensive intermediates eagerly,
    which is what makes this attribution honest.
    """

    def __init__(self, name: str):
        self.name = name

    def __enter__(self):
        import time

        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        import time

        PHASE_TIMINGS[self.name] = (
            PHASE_TIMINGS.get(self.name, 0.0)
            + time.perf_counter()
            - self._t0
        )
        return False


def release_checkpoint(df) -> None:
    """Drop the materialized blocks behind a ``localCheckpoint``-backed
    DataFrame (round 14, guide §5 "unpersist when done").

    ``localCheckpoint`` pins its partitions in block-manager storage
    until the ContextCleaner notices the RDD is unreachable — which
    needs a driver FULL GC that an 8-GiB heap may not run for the
    whole life of a many-query session (``spark.cleaner.periodicGC``
    defaults to 30 MINUTES). Iterative operators that checkpoint per
    round (k-center, PageRank, label propagation) therefore leak every
    superseded round's state into storage memory for the rest of the
    session, squeezing the unified pool every later query shares.

    Call ONLY on a checkpoint no consumer will read again: the blocks
    ARE the data (lineage is truncated), so a released DataFrame is
    dead. Best-effort — if the plan isn't the direct LogicalRDD of a
    checkpoint (or the py4j surface moves), it silently does nothing.
    """
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass


def bucket_pairs(banded, keys, id_col, cap=None, payload=()):
    """Candidate pairs from co-bucketed rows — ONE groupBy + in-bucket
    pair expansion instead of a keyed self-join (round 14).

    The self-join shape evaluates the upstream lineage (usually an
    expensive signature / bucketing computation) once per join side
    and needs an extra same-keyed window for a hot-bucket cap; this
    shape computes it once, shuffles once (the aggregation), and the
    cap becomes a plain ``size(ids) <= cap`` filter on the grouped
    list. Work stays quadratic only WITHIN a bucket, exactly like the
    join it replaces, and a capped bucket bounds the grouped list the
    same way it bounded the join's per-key output.

    ``banded``: rows of (*keys, id_col); returns (a, b) with a < b,
    NOT globally distinct — callers dedup across buckets/bands
    themselves, as before. With ``payload`` columns each side is a
    struct ``(_id, *payload)`` (ordered by ``a._id < b._id``) so
    per-pair verification columns ride along without a re-join
    against the expensive upstream.
    """
    from pyspark.sql import DataFrame  # noqa: F401  (doc only)

    item = (
        F.struct(
            F.col(id_col).alias("_id"), *[F.col(c) for c in payload]
        )
        if payload
        else F.col(id_col)
    )
    grouped = banded.groupBy(*keys).agg(
        F.collect_list(item).alias("_ids")
    )
    if cap is not None:
        grouped = grouped.filter(F.size("_ids") <= cap)
    grouped = grouped.filter(F.size("_ids") >= 2)
    # pair expansion as two codegen'd Generates + an a<b filter, NOT a
    # higher-order slice/transform: interpreted HOF struct allocation
    # measured ~2x SLOWER than the join it replaced on big buckets
    # (md5 2-row bands at sf0.1) — the double explode stays inside
    # whole-stage codegen and the b² intermediate is filtered in place
    out = (
        grouped.select(F.explode("_ids").alias("a"), F.col("_ids"))
        .select("a", F.explode("_ids").alias("b"))
    )
    if payload:
        return out.filter(F.col("a._id") < F.col("b._id"))
    return out.filter(F.col("a") < F.col("b"))
