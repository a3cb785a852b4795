"""NULL/tie differential gate (VERDICT r6 items 1 + 7).

Round 6's one red driver row (``events_session_funnel``) was an
environment-sensitive oracle divergence: with NULL ``user_id``/``ts``
in the events table, Spark's ``groupBy`` keeps the NULL group and its
windows order NULLS FIRST, while the DuckDB oracle's ``JOIN … USING``
drops NULL keys and its ``ORDER BY`` defaults NULLS LAST — equal row
counts, different values, invisible on NULL-free local data.

This module replays every events-derived oracle entry against a
deterministically NULL- and tie-injected twin of the sf0.001 testdata
(``tools/driver_sim.make_nulls_fuzz_dir`` — the same generator behind
``driver_sim.py --nulls-fuzz``) and asserts the driver's own
comparison (row count + column names + order-insensitive value hash).
The full-registry sweep at sf0.01 stays in ``driver_sim.py
--nulls-fuzz``; this is the fast always-on subset over the entries
whose plans key or order on nullable events columns.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.driver_sim import TABLES, make_nulls_fuzz_dir, value_hash  # noqa: E402

SRC_DIR = "/root/testdata/sf0.001"

# every oracle-backed entry whose Spark plan and SQL twin read the
# events table through nullable keys/orderings (the class of VERDICT r6
# item 1), plus the BFL entries whose nil-coercion semantics
# (eval.go:47-88) the oracles must mirror explicitly
ENTRIES = [
    "events_session_funnel",
    "sessionize_gap",
    "events_funnel_steps",
    "events_cohort_retention",
    "events_rolling_outliers",
    "agg_equi_depth_histogram",
    "join_asof_clicks",
    "join_asof_tolerance",
    "window_range_count",
    "join_interval_overlap",
    "agg_hourly_window",
    "agg_value_median",
    "ts_gap_fill_hourly",
    "events_expectations",
    "events_skew_profile",
    "bfl_eq_string",
    "bfl_neq_string",
    "bfl_not",
    "bfl_cmp_gt",
    "bfl_cmp_le",
    "bfl_xml_path",
    "query_limit_extract",
]


@pytest.fixture(scope="module")
def fuzz_dir(tmp_path_factory):
    dest = tmp_path_factory.mktemp("nulls_fuzz") / "sf"
    return make_nulls_fuzz_dir(SRC_DIR, str(dest))


@pytest.fixture(scope="module")
def duck(fuzz_dir):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{fuzz_dir}/{t}.parquet'"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", ENTRIES)
def test_entry_matches_oracle_under_nulls_and_ties(
    spark, fuzz_dir, duck, name
):
    from basenine_spark.registry import ORACLES, SPARK_QUERIES

    sql = ORACLES[name]
    assert sql is not None, f"{name} lost its oracle"
    sdf = SPARK_QUERIES[name](spark, fuzz_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    cur = duck.execute(sql)
    ocols = [d[0] for d in cur.description]
    orows = cur.fetchall()
    assert len(srows) == len(orows), (
        f"{name}: {len(srows)} spark rows vs {len(orows)} oracle rows"
    )
    assert sorted(scols) == sorted(ocols)
    assert value_hash(srows, scols) == value_hash(orows, ocols), (
        f"{name}: value divergence under NULL/tie injection"
    )


def test_fuzz_dir_actually_contains_nulls_and_ties(fuzz_dir):
    """Guard the guard: the generator must keep injecting (a refactor
    that silently stops injecting would turn this whole module into a
    no-op green)."""
    import duckdb

    con = duckdb.connect()
    n_null_user, n_null_ts, n_null_id, n_ties = con.execute(
        f"""
        SELECT
          count(*) FILTER (user_id IS NULL),
          count(*) FILTER (ts IS NULL),
          count(*) FILTER (event_id IS NULL),
          (SELECT count(*) FROM (
             SELECT user_id, ts FROM '{fuzz_dir}/events.parquet'
             WHERE user_id IS NOT NULL AND ts IS NOT NULL
             GROUP BY user_id, ts HAVING count(*) > 1))
        FROM '{fuzz_dir}/events.parquet'
        """
    ).fetchone()
    con.close()
    assert n_null_user > 0 and n_null_ts > 0 and n_null_id > 0
    assert n_ties > 0
