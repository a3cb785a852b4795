"""Batch-replay rows for the streaming twins (round 11 replay wave).

Each replay is driver-gated at sf0.01 with a full-value DuckDB oracle
(registry entries ``streaming_*_replay``); these tests pin the same
agreement at sf0.001 so a regression surfaces in pytest between
driver rounds. Coverage focuses on the mechanically-trickiest rows:

* sessions — the ProcessingTimeTimeout state keeps the micro-batch
  engine in an endless no-data cleanup-commit loop, so the replay
  CANNOT use ``processAllAvailable`` (observed hang); it drains via
  cumulative numInputRows + a trailing zero-input commit
  (:func:`basenine_spark.streaming.replay._drain_stateful`).
* rfm — the final emission per user must equal the batch aggregate
  (monetary through the engine-stable rounding idiom on both sides).
* asof — the stream-stream join's emitted multiset vs the batch
  range join.
"""

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


def _oracle(sql: str):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{SF}/events.parquet')"
    )
    return [tuple(r) for r in con.execute(sql).fetchall()]


def test_sessions_replay_matches_batch_closed_sessions(spark):
    from basenine_spark.streaming.replay import sessions_replay

    got = [tuple(r) for r in sessions_replay(spark, SF).collect()]
    want = _oracle(
        """
        WITH e AS (
          SELECT user_id, epoch_ms(ts) AS ts_ms FROM events
          WHERE event_id IS NOT NULL AND ts IS NOT NULL
            AND user_id IS NOT NULL
        ), o AS (
          SELECT user_id, ts_ms,
                 CASE WHEN ts_ms - lag(ts_ms) OVER
                        (PARTITION BY user_id ORDER BY ts_ms) > 1800000
                      THEN 1 ELSE 0 END AS brk
          FROM e
        ), s AS (
          SELECT user_id, ts_ms,
                 SUM(brk) OVER (PARTITION BY user_id ORDER BY ts_ms
                                ROWS UNBOUNDED PRECEDING) AS sid
          FROM o
        ), g AS (
          SELECT user_id, sid, min(ts_ms) AS session_start_ms,
                 max(ts_ms) AS session_end_ms, count(*) AS n_events
          FROM s GROUP BY user_id, sid
        )
        SELECT user_id, session_start_ms, session_end_ms, n_events
        FROM (SELECT g.*, row_number() OVER
                (PARTITION BY user_id ORDER BY sid DESC) AS rn FROM g)
        WHERE rn > 1 ORDER BY user_id, session_start_ms
        """
    )
    assert got == want
    assert len(got) > 0  # the corpus must actually close sessions


def test_rfm_replay_matches_batch_aggregate(spark):
    from basenine_spark.streaming.replay import rfm_replay

    got = [tuple(r) for r in rfm_replay(spark, SF).collect()]
    want = _oracle(
        """
        SELECT user_id, max(epoch_ms(ts)) AS recency_ms,
               count(*) AS frequency,
               FLOOR(round(sum(coalesce(value, 0)), 4) * 1e4 + 0.5)
                 / 1e4 AS monetary
        FROM events
        WHERE event_id IS NOT NULL AND ts IS NOT NULL
          AND user_id IS NOT NULL
        GROUP BY user_id ORDER BY user_id
        """
    )
    assert got == want
    assert len(got) > 0


def test_asof_replay_matches_batch_range_join(spark):
    from basenine_spark.streaming.replay import asof_replay

    got = [tuple(r) for r in asof_replay(spark, SF).collect()]
    want = _oracle(
        """
        SELECT p.user_id, epoch_ms(p.ts), epoch_ms(c.ts)
        FROM events p JOIN events c
          ON c.user_id = p.user_id
         AND epoch_ms(c.ts) BETWEEN epoch_ms(p.ts) - 1800000
                                AND epoch_ms(p.ts)
        WHERE p.event_type = 'purchase' AND c.event_type = 'click'
          AND p.event_id IS NOT NULL AND p.ts IS NOT NULL
          AND c.event_id IS NOT NULL AND c.ts IS NOT NULL
        ORDER BY 1, 2, 3
        """
    )
    assert got == want


@pytest.mark.parametrize(
    "fn_name",
    ["dedup_replay", "windows_replay", "source_cap_replay",
     "quality_monitor_replay", "exposure_replay", "blocklist_replay",
     "funnel_replay"],
)
def test_other_replays_produce_rows(spark, fn_name):
    """The remaining replay rows carry full-value driver oracles at
    sf0.01; here just pin that each runs end-to-end at sf0.001 and
    emits a stable non-empty projection."""
    from basenine_spark.streaming import replay

    df = getattr(replay, fn_name)(spark, SF)
    assert df.count() > 0


@pytest.mark.parametrize(
    "fn_name",
    ["semdedup_replay_contract", "dsir_replay_contract",
     "anomaly_replay_contract"],
)
def test_contract_replays_zero_counters(spark, fn_name):
    """The stream-vs-batch contract rows: every violation/mismatch
    counter must be deterministically zero at sf0.001 too (the driver
    pins sf0.01 + the fuzz corpora)."""
    from basenine_spark.streaming import replay

    rows = [tuple(r) for r in getattr(replay, fn_name)(spark, SF).collect()]
    assert len(rows) == 1
    assert all(v == 0 for v in rows[0][1:]), rows
