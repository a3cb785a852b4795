"""Regression tests for the round-5 ADVICE findings (fixed round 6).

1. Streaming anomaly/funnel workers must survive null longs/doubles,
   which cross the Arrow boundary as NaN and defeat `is not None`
   checks (int(NaN) raises; NaN poisons Welford state forever).
2. source_cap_twophase must trigger its exact re-rank fallback for a
   source whose pre-filter kept ZERO rows (previously invisible to the
   shortfall detector because it anchored on kept, not counts).
3. equi_depth_histogram is now a distributed exact rank (range
   partition + per-partition offsets) — no whole-column single-task
   sort — and takes a parameterized tie-break id column.
"""

import math

import pandas as pd
import pytest
from pyspark.sql import functions as F


class _FakeState:
    """Minimal GroupState stand-in for driving the worker fns."""

    def __init__(self):
        self.exists = False
        self._v = None
        self.hasTimedOut = False

    def setTimeoutDuration(self, ms):
        pass

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v
        self.exists = True


# -- ADVICE 1+2: NaN-null robustness in stateful streaming workers ----------


def test_anomaly_worker_survives_nan_and_keeps_state_clean():
    from basenine_spark.streaming.anomaly import _detect_fn

    fn = _detect_fn(z_threshold=3.0, min_n=2)
    state = _FakeState()
    # null long/double arrive as NaN through Arrow
    pdf = pd.DataFrame(
        {
            "event_id": [1.0, float("nan"), 2.0, 3.0],
            "value": [1.0, float("nan"), 1.1, float("nan")],
        }
    )
    list(fn(("click",), iter([pdf]), state))  # must not raise
    n, mean, m2 = state.get
    assert n == 2  # only the two clean rows entered the moments
    assert math.isfinite(mean) and math.isfinite(m2)


def test_anomaly_worker_all_nan_batch_is_noop():
    from basenine_spark.streaming.anomaly import _detect_fn

    fn = _detect_fn(z_threshold=3.0, min_n=2)
    state = _FakeState()
    pdf = pd.DataFrame(
        {"event_id": [float("nan")], "value": [float("nan")]}
    )
    out = list(fn(("click",), iter([pdf]), state))
    assert out == []
    assert not state.exists  # nothing entered the state


def test_funnel_worker_survives_nan_ts():
    from basenine_spark.streaming.funnel import _funnel_fn

    fn = _funnel_fn(("view", "click"), 0, 2000)
    state = _FakeState()
    pdf = pd.DataFrame(
        {
            "ts_ms": [float("nan"), 100.0, 200.0],
            "event_type": ["view", "view", "click"],
        }
    )
    out = list(fn((7,), iter([pdf]), state))  # must not raise
    times, pend_ts, pend_et, max_ts = state.get
    assert list(times) == [100, 200]
    assert list(pend_ts) == [] and max_ts == 200
    assert len(out) == 1 and len(out[0]) == 2


# -- ADVICE 3: zero-kept source triggers the exact re-rank fallback ---------


def test_twophase_zero_kept_source_still_exact(spark):
    from basenine_spark.ops import sampling

    sf = "/root/testdata/sf0.001"
    # margin 0.01 with cap 3 targets 0.03 expected survivors per
    # source: every source larger than 0.03 rows pre-filters to ~zero
    # kept rows with overwhelming probability, which the old detector
    # (anchored on kept) never saw. Output must STILL equal the
    # single-window reference form exactly.
    ref = sampling.source_cap(spark, sf, cap=3).orderBy("source", "cap_rank")
    two = sampling.source_cap_twophase(
        spark, sf, cap=3, margin=0.01
    ).orderBy("source", "cap_rank")
    assert [tuple(r) for r in ref.collect()] == [
        tuple(r) for r in two.collect()
    ]
    # non-vacuity: the adversarial margin actually zeroed the prefilter
    # for at least one source (otherwise this test proves nothing)
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    n_sources = docs.select("source").distinct().count()
    assert ref.select("source").distinct().count() == n_sources


# -- ADVICE 4: distributed equi-depth histogram -----------------------------


def test_equi_depth_distributed_plan_and_tiebreak_param(spark):
    from basenine_spark.ops import relational

    sf = "/root/testdata/sf0.001"
    # parameterized tie-break column: a table WITHOUT event_id now works
    out = relational.equi_depth_histogram(
        spark, sf, k=8, table="orders", col="o_totalprice",
        id_col="o_orderkey",
    )
    rows = out.collect()
    assert len(rows) == 8
    n_total = sum(r["n_rows"] for r in rows)
    lo, hi = n_total // 8, -(-n_total // 8)
    assert all(lo <= r["n_rows"] <= hi for r in rows)
    # buckets tile the value range in order
    srt = sorted(rows, key=lambda r: r["bucket"])
    for a, b in zip(srt, srt[1:]):
        assert a["hi"] <= b["lo"]
    # the data-ranking window is PARTITIONED on the pinned range
    # partition id — the old form's unpartitioned global ntile (whole
    # column sorted through one task) is gone. (The range exchange
    # itself lives inside the localCheckpoint RDD lineage so it can't
    # appear in this plan string.)
    fresh = relational.equi_depth_histogram(
        spark, sf, k=8, table="orders", col="o_totalprice",
        id_col="o_orderkey",
    )
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        fresh.explain("formatted")
    plan = buf.getvalue()
    assert "windowspecdefinition(pid#" in plan
    assert "ntile" not in plan


def test_equi_depth_fewer_rows_than_buckets(spark, tmp_path):
    """N < k degenerates exactly like ntile: N singleton buckets 1..N
    (the integer arithmetic's q=0 branch)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from basenine_spark.ops import relational

    d = tmp_path / "tiny"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(5), pa.int64()),
                "ts": pa.array([1000 * i for i in range(5)], pa.timestamp("ms")),
                "user_id": pa.array([0] * 5, pa.int64()),
                "event_type": pa.array(["view"] * 5),
                "value": pa.array([5.0, 1.0, 3.0, 2.0, 4.0], pa.float64()),
                "props": pa.array(["{}"] * 5),
            }
        ),
        d / "events.parquet",
    )
    rows = sorted(
        relational.equi_depth_histogram(spark, str(d), k=8).collect(),
        key=lambda r: r["bucket"],
    )
    assert [r["bucket"] for r in rows] == [1, 2, 3, 4, 5]
    assert all(r["n_rows"] == 1 for r in rows)
    assert [r["lo"] for r in rows] == [1.0, 2.0, 3.0, 4.0, 5.0]
