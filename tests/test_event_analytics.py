"""Event-sequence analytics: funnel (greedy fold ≡ chained-min CTEs)
and cohort retention, both DuckDB-differential at sf0.001 plus
hand-built orderings that pin the strictly-after semantics."""

import json

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from basenine_spark.ops import timeseries

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    import duckdb

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    yield con
    con.close()


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(json.dumps([repr(row[i]) for i in order]) for row in rows)


def test_funnel_matches_duckdb_chained_mins(spark, duck):
    sdf = timeseries.event_funnel(spark, SF)
    srows = [tuple(r) for r in sdf.collect()]
    cur = duck.execute(
        """
        WITH s1 AS (
          SELECT user_id, min(epoch_ms(ts)) AS s1_ms
          FROM events WHERE event_type = 'view' GROUP BY user_id
        ), s2 AS (
          SELECT e.user_id, min(epoch_ms(e.ts)) AS s2_ms
          FROM events e JOIN s1 USING (user_id)
          WHERE e.event_type = 'click' AND epoch_ms(e.ts) > s1.s1_ms
          GROUP BY e.user_id
        ), s3 AS (
          SELECT e.user_id, min(epoch_ms(e.ts)) AS s3_ms
          FROM events e JOIN s2 USING (user_id)
          WHERE e.event_type = 'purchase' AND epoch_ms(e.ts) > s2.s2_ms
          GROUP BY e.user_id
        )
        SELECT u.user_id, s1_ms, s2_ms, s3_ms
        FROM (SELECT DISTINCT user_id FROM events) u
        LEFT JOIN s1 USING (user_id)
        LEFT JOIN s2 USING (user_id)
        LEFT JOIN s3 USING (user_id)
        """
    )
    dcols = [d[0] for d in cur.description]
    drows = cur.fetchall()
    assert sorted(sdf.columns) == sorted(dcols)
    assert len(srows) == len(drows) > 0
    assert _canon(srows, sdf.columns) == _canon(drows, dcols)


def test_retention_matches_duckdb(spark, duck):
    sdf = timeseries.cohort_retention(spark, SF)
    srows = [tuple(r) for r in sdf.collect()]
    cur = duck.execute(
        """
        WITH cohorts AS (
          SELECT user_id, min(epoch_ms(ts) // 604800000) AS cohort_week
          FROM events WHERE event_type = 'signup' GROUP BY user_id
        ), activity AS (
          SELECT DISTINCT user_id, epoch_ms(ts) // 604800000 AS week
          FROM events
        )
        SELECT cohort_week, (week - cohort_week) AS week_offset,
               count(DISTINCT user_id)::BIGINT AS n_users
        FROM activity JOIN cohorts USING (user_id)
        WHERE week >= cohort_week
        GROUP BY cohort_week, week_offset
        """
    )
    dcols = [d[0] for d in cur.description]
    drows = cur.fetchall()
    assert sorted(sdf.columns) == sorted(dcols)
    assert len(srows) == len(drows) > 0
    assert _canon(srows, sdf.columns) == _canon(drows, dcols)


def _write_events(tmp_path, rows):
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(len(rows)), pa.int64()),
                "ts": pa.array(
                    [r[1] * 1000 for r in rows], pa.timestamp("ms")
                ),
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "event_type": pa.array([r[2] for r in rows], pa.string()),
                "value": pa.array([0.0] * len(rows), pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        ),
        d / "events.parquet",
    )
    return str(d)


def test_funnel_strictly_after_semantics(spark, tmp_path):
    rows = [
        # user 1: completes in order
        (1, 10, "view"), (1, 20, "click"), (1, 30, "purchase"),
        # user 2: click BEFORE view — click at 5 must not count;
        # the click at 25 does
        (2, 5, "click"), (2, 15, "view"), (2, 25, "click"),
        # user 3: purchase before click — never reaches step 3
        (3, 10, "view"), (3, 12, "purchase"), (3, 20, "click"),
        # user 4: same-ms view+click — strict ordering rejects the tie
        (4, 10, "view"), (4, 10, "click"),
    ]
    sf = _write_events(tmp_path, rows)
    got = {
        r["user_id"]: (r["s1_ms"], r["s2_ms"], r["s3_ms"])
        for r in timeseries.event_funnel(spark, sf).collect()
    }
    assert got[1] == (10000, 20000, 30000)
    assert got[2] == (15000, 25000, None)
    assert got[3] == (10000, 20000, None)
    assert got[4] == (10000, None, None)


def test_retention_triangle_on_hand_built(spark, tmp_path):
    wk = 604800
    rows = [
        (1, 0 * wk + 100, "signup"), (1, 1 * wk + 100, "view"),
        (1, 3 * wk + 100, "click"),
        (2, 0 * wk + 200, "signup"), (2, 0 * wk + 300, "view"),
        # user 3 signs up in week 1, active week 1 only
        (3, 1 * wk + 100, "signup"),
        # user 4 never signs up — excluded entirely
        (4, 2 * wk, "view"),
    ]
    sf = _write_events(tmp_path, rows)
    got = {
        (r["cohort_week"], r["week_offset"]): r["n_users"]
        for r in timeseries.cohort_retention(spark, sf).collect()
    }
    assert got == {
        (0, 0): 2,  # users 1 and 2 active in their signup week
        (0, 1): 1,  # user 1
        (0, 3): 1,  # user 1
        (1, 0): 1,  # user 3
    }


# -- rolling z-score outliers ----------------------------------------------


def test_rolling_outliers_match_duckdb(spark, duck):
    sdf = timeseries.rolling_outliers(spark, SF, window_n=50)
    srows = [tuple(r) for r in sdf.collect()]
    cur = duck.execute(
        """
        WITH ev AS (
          SELECT event_id, event_type, epoch_ms(ts) AS ts_ms, value
          FROM events WHERE value IS NOT NULL
        ), scored AS (
          SELECT event_id, event_type, ts_ms, value,
            avg(value) OVER w AS m,
            stddev_samp(value) OVER w AS sd,
            count(value) OVER w AS c
          FROM ev
          WINDOW w AS (PARTITION BY event_type ORDER BY ts_ms, event_id
                       ROWS BETWEEN 50 PRECEDING AND 1 PRECEDING)
        )
        SELECT event_id, event_type, ts_ms, value,
               CASE WHEN c >= 10 AND sd > 0
                    THEN round((value - m) / sd, 4) END AS zscore,
               coalesce(abs(CASE WHEN c >= 10 AND sd > 0
                    THEN round((value - m) / sd, 4) END) >= 3.0, false)
                 AS is_outlier
        FROM scored
        """
    )
    dcols = [d[0] for d in cur.description]
    drows = cur.fetchall()
    assert sorted(sdf.columns) == sorted(dcols)
    assert len(srows) == len(drows) > 0
    assert _canon(srows, sdf.columns) == _canon(drows, dcols)


def test_rolling_outliers_flag_planted_spike(spark, tmp_path):
    # jittered baseline (sd > 0) then a huge spike; the first
    # min_window rows are warm-up and must be NULL-scored
    rows = [(1, 100 + i, "view") for i in range(30)]
    sf = _write_events(tmp_path, rows)
    import pyarrow.parquet as pq_mod
    import pyarrow as pa_mod

    t = pq_mod.read_table(f"{sf}/events.parquet")
    vals = [10.0 + (i % 5) * 0.1 for i in range(29)] + [1000.0]
    t = t.set_column(
        t.schema.get_field_index("value"), "value",
        pa_mod.array(vals, pa_mod.float64()),
    )
    pq_mod.write_table(t, f"{sf}/events.parquet")
    out = {
        r["event_id"]: r
        for r in timeseries.rolling_outliers(
            spark, sf, window_n=50, min_window=10
        ).collect()
    }
    spike = out[29]
    assert spike["is_outlier"] and spike["zscore"] > 100
    for i in range(10):
        assert out[i]["zscore"] is None and not out[i]["is_outlier"]


# -- session-scoped funnel -------------------------------------------------


def test_session_funnel_matches_duckdb(spark, duck):
    sdf = timeseries.session_funnel(spark, SF)
    srows = [tuple(r) for r in sdf.collect()]
    cur = duck.execute(
        """
        WITH ev AS (
          SELECT user_id, event_id, event_type, epoch_ms(ts) AS ts_ms
          FROM events
        ), sid AS (
          SELECT *, sum(new_s) OVER (
                   PARTITION BY user_id ORDER BY ts_ms, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS session_no
          FROM (
            SELECT *, CASE WHEN ts_ms - lag(ts_ms) OVER (
                     PARTITION BY user_id ORDER BY ts_ms, event_id
                   ) > 1800000 THEN 1 ELSE 0 END AS new_s
            FROM ev
          )
        ), s1 AS (
          SELECT user_id, session_no, min(ts_ms) AS s1_ms
          FROM sid WHERE event_type = 'view' GROUP BY 1, 2
        ), s2 AS (
          SELECT e.user_id, e.session_no, min(e.ts_ms) AS s2_ms
          FROM sid e JOIN s1 USING (user_id, session_no)
          WHERE e.event_type = 'click' AND e.ts_ms > s1.s1_ms
          GROUP BY 1, 2
        ), s3 AS (
          SELECT e.user_id, e.session_no, min(e.ts_ms) AS s3_ms
          FROM sid e JOIN s2 USING (user_id, session_no)
          WHERE e.event_type = 'purchase' AND e.ts_ms > s2.s2_ms
          GROUP BY 1, 2
        )
        SELECT u.user_id, u.session_no, s1_ms, s2_ms, s3_ms
        FROM (SELECT DISTINCT user_id, session_no FROM sid) u
        LEFT JOIN s1 USING (user_id, session_no)
        LEFT JOIN s2 USING (user_id, session_no)
        LEFT JOIN s3 USING (user_id, session_no)
        """
    )
    dcols = [d[0] for d in cur.description]
    drows = cur.fetchall()
    assert sorted(sdf.columns) == sorted(dcols)
    assert len(srows) == len(drows) > 0
    assert _canon(srows, sdf.columns) == _canon(drows, dcols)


def test_session_funnel_resets_across_sessions(spark, tmp_path):
    gap = 30 * 60  # seconds
    rows = [
        # session 0: full conversion
        (1, 100, "view"), (1, 200, "click"), (1, 300, "purchase"),
        # session 1 (after > gap idle): view+click only — the purchase
        # of session 0 must NOT leak in
        (1, 300 + gap + 100, "view"), (1, 300 + gap + 200, "click"),
    ]
    sf = _write_events(tmp_path, rows)
    got = {
        r["session_no"]: (r["s1_ms"], r["s2_ms"], r["s3_ms"])
        for r in timeseries.session_funnel(spark, sf).collect()
    }
    assert got[0] == (100000, 200000, 300000)
    assert got[1] == ((300 + gap + 100) * 1000, (300 + gap + 200) * 1000, None)
