"""Streaming ordered-funnel progression — the online twin of
:func:`basenine_spark.ops.timeseries.event_funnel`.

State per user (``applyInPandasWithState`` keyed on user_id) is the
array of step times filled so far — at most ``len(steps)`` longs, a
constant-size record no matter how many events stream through. Each
micro-batch's events are sorted by event time and walked with the same
greedy strictly-after rule as the batch fold; a row is emitted the
moment a user first reaches a step, so the sink accumulates the funnel
transition log.

Equivalence contract: when events arrive in event-time order across
micro-batches (within a batch, order doesn't matter — the batch is
sorted), the emitted step times are identical to the batch operator's.
An event arriving in a LATER batch but with an EARLIER timestamp than
an already-filled step cannot rewrite history (greedy state is
append-only) — the documented online/offline divergence, same contract
as the streaming dedup/SemDeDup admission twins.

Caveat on the precondition: one multi-file log append is NOT an
atomic arrival — the file source can list a subset of a batch's
part-files in one trigger and the rest in the next (task-commit
visibility), so a single insert's events may straddle trigger
boundaries in arbitrary file order. Arrival-order agreement is
therefore guaranteed for event-time-ordered SEQUENCES OF INSERTS
(the file source processes files oldest-mtime-first), not for
arbitrary row order inside one large insert — the same caveat any
file-fed Structured Streaming pipeline carries.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..engine.db import BasenineDB

OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("step_idx", T.IntegerType()),
        T.StructField("ts_ms", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [T.StructField("times", T.ArrayType(T.LongType()))]
)


def _funnel_fn(steps: tuple):
    n = len(steps)

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        events = []
        for pdf in pdfs:
            for ts, et in zip(pdf["ts_ms"], pdf["event_type"]):
                # null longs arrive as NaN through Arrow — pd.notna
                # catches both None and NaN shapes
                if pd.notna(ts) and et is not None:
                    events.append((int(ts), str(et)))
        if not events:
            return
        events.sort()
        (times,) = state.get if state.exists else ([],)
        times = list(times)
        emitted = []
        for ts, et in events:
            if len(times) >= n:
                break
            if et == steps[len(times)] and (not times or ts > times[-1]):
                times.append(ts)
                emitted.append((key[0], len(times) - 1, ts))
        state.update((times,))
        if emitted:
            yield pd.DataFrame(
                emitted, columns=["user_id", "step_idx", "ts_ms"]
            )

    return fn


def funnel_stream(
    db: BasenineDB,
    steps: tuple = ("view", "click", "purchase"),
    query_name: str = "funnel_steps",
    checkpoint: str | None = None,
):
    """Start the online funnel over a durable BasenineDB's log whose
    documents carry ``{"user_id": …, "ts_ms": …, "event_type": …}``;
    step transitions land in the in-memory table ``query_name`` as
    (user_id, step_idx, ts_ms). ``checkpoint`` defaults to a STABLE path derived from the log
    path and query name, so restarting the same query resumes its
    state instead of replaying the log (and no per-start ckpt dirs
    leak); pass a throwaway path for a deliberate from-scratch
    replay. NOTE: the default in-memory table sink is NOT recoverable
    across JVM restarts — a same-name restart resumes *offsets and
    state* but the memory table restarts empty, so pre-restart output
    rows never reappear; pair the stable checkpoint with a durable
    sink when replay-safe output matters. Returns the StreamingQuery."""
    if db._log is None:
        raise ValueError("funnel_stream requires a durable (path-backed) db")
    from ..engine.log import LOG_SCHEMA

    stream = db.spark.readStream.schema(LOG_SCHEMA).parquet(db._log.path)
    ev = (
        stream.select(
            F.from_json(
                F.col("value"),
                "user_id long, ts_ms long, event_type string",
            ).alias("d")
        )
        .select("d.user_id", "d.ts_ms", "d.event_type")
        # ts_ms null-filtered upstream too: a null long crosses Arrow
        # as NaN, passes `is not None`, and int(NaN) would terminate
        # the streaming query on one malformed record
        .filter(F.col("user_id").isNotNull() & F.col("ts_ms").isNotNull())
    )
    out = ev.groupBy("user_id").applyInPandasWithState(
        _funnel_fn(tuple(steps)),
        OUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
    return (
        out.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .option(
            "checkpointLocation",
            checkpoint or f"{db._log.path}_funnel_ckpt_{query_name}",
        )
        .start()
    )
