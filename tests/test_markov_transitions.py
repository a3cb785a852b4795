"""First-order Markov transitions over per-user event sequences:
hand-computed chain golden, probability conservation, NULL policy,
and plan shape."""

from basenine_spark.ops import timeseries

SF = "/root/testdata/sf0.01"


def _planted(spark, tmp_path):
    """u1: view->click->purchase; u2: view->view->click;
    u3: click alone (no transition); NULL rows dropped."""
    out = str(tmp_path / "mkv_sf")
    rows = [
        (1, 1, "view", 1000), (2, 1, "click", 2000), (3, 1, "purchase", 3000),
        (4, 2, "view", 1000), (5, 2, "view", 2000), (6, 2, "click", 3000),
        (7, 3, "click", 1000),
        (8, None, "view", 1000),       # NULL user -> dropped
        (9, 4, None, 1000),            # NULL type -> dropped
        (10, 4, "view", None),         # NULL ts -> dropped
    ]
    spark.createDataFrame(
        [(e, u, t, ts, 0.0, "{}") for e, u, t, ts in rows],
        "event_id long, user_id long, event_type string, ts_ms long, "
        "value double, props string",
    ).write.mode("overwrite").parquet(f"{out}/events.parquet")
    return out


def test_chain_golden(spark, tmp_path):
    sf = _planted(spark, tmp_path)
    got = {
        (r["from_state"], r["to_state"]): (r["n_transitions"], r["prob"])
        for r in timeseries.markov_transitions(spark, sf).collect()
    }
    # transitions: view->click (u1), click->purchase (u1),
    #              view->view (u2), view->click (u2)
    assert got[("view", "click")] == (2, 0.666667)
    assert got[("view", "view")][0] == 1
    assert got[("click", "purchase")] == (1, 1.0)
    assert ("purchase", "view") not in got  # no wraparound
    assert len(got) == 3


def test_probabilities_sum_to_one_per_from_state(spark):
    rows = timeseries.markov_transitions(spark, SF).collect()
    by_from = {}
    for r in rows:
        by_from.setdefault(r["from_state"], []).append(r["prob"])
    for f, ps in by_from.items():
        assert abs(sum(ps) - 1.0) < 1e-3, (f, sum(ps))
    # every state with an outgoing transition appears
    assert len(by_from) >= 2


def test_plan_shape(spark):
    plan = (
        timeseries.markov_transitions(spark, SF)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
