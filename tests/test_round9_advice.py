"""Regression tests for the round-9 ADVICE findings (fixed round 10).

1. The funnel's pending reorder buffer is HARD-capped: a user whose
   event times all stay within ``order_tolerance_ms`` of max_ts never
   crosses the reorder horizon, and continuous traffic re-arms the
   quiescence timeout, so without a cap the buffer grows with stream
   length. On overflow, the oldest events are folded immediately.
2. The default funnel checkpoint path is versioned (``_v2``) because
   the r9 order-tolerant rewrite grew STATE_SCHEMA from 1 field to 4 —
   a pre-r9 checkpoint under the old stable path would fail Spark's
   state-schema compatibility check instead of resuming.
"""

import pandas as pd


class _FakeState:
    def __init__(self):
        self.exists = False
        self._v = None
        self.hasTimedOut = False

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v
        self.exists = True

    def setTimeoutDuration(self, ms):
        pass


def test_funnel_pending_buffer_hard_cap():
    from basenine_spark.streaming.funnel import _funnel_fn

    # tolerance so large nothing ever crosses the horizon naturally
    fn = _funnel_fn(("view", "click"), 10**9, 2000, max_pending=8)
    state = _FakeState()
    # 20 non-matching events ("other" would be filtered upstream; use
    # step-typed events that can't fold: clicks before any view)
    pdf = pd.DataFrame(
        {
            "ts_ms": [float(1000 + i) for i in range(20)],
            "event_type": ["click"] * 20,
        }
    )
    list(fn((1,), iter([pdf]), state))
    times, pend_ts, pend_et, max_ts = state.get
    assert len(pend_ts) == 8  # capped, not 20
    assert list(pend_ts) == [float(1000 + i) for i in range(12, 20)]
    assert times == []  # spilled clicks couldn't fold without a view


def test_funnel_overflow_folds_oldest_in_event_time_order():
    from basenine_spark.streaming.funnel import _funnel_fn

    fn = _funnel_fn(("view", "click"), 10**9, 2000, max_pending=2)
    state = _FakeState()
    # arrival order scrambled; overflow must fold OLDEST events in
    # event-time order: view@100 then click@200 -> both steps fill
    pdf = pd.DataFrame(
        {
            "ts_ms": [400.0, 100.0, 300.0, 200.0],
            "event_type": ["click", "view", "click", "click"],
        }
    )
    out = list(fn((1,), iter([pdf]), state))
    times, pend_ts, pend_et, max_ts = state.get
    assert list(times) == [100, 200]
    assert list(pend_ts) == [300, 400]  # newest two still buffered
    assert len(out) == 1 and len(out[0]) == 2


def test_funnel_default_checkpoint_is_versioned():
    import inspect

    from basenine_spark.streaming import funnel

    src = inspect.getsource(funnel.funnel_stream)
    assert "_funnel_ckpt_{query_name}_v2" in src
