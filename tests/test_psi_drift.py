"""PSI drift: histogram/PSI math replayed in DuckDB against the same
boundaries, boundary computation cross-checked vs quantile_cont, and
planted-shift / identical-release behavior."""

import json
import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from basenine_spark.ops import relational

SF = "/root/testdata/sf0.001"
SF_BIG = "/root/testdata/sf0.01"
K = 10


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(json.dumps([repr(row[i]) for i in order]) for row in rows)


def test_psi_matches_duckdb_with_shared_boundaries(spark):
    import duckdb

    sdf = relational.psi_drift(spark, SF, SF_BIG, k=K)
    srows = [tuple(r) for r in sdf.collect()]
    # recompute the reference boundaries exactly as the op does, then
    # replay the bucket/PSI math in DuckDB against those literals
    from pyspark.sql import functions as F

    from basenine_spark.sources.tables import load_table

    probs = [i / K for i in range(1, K)]
    ref = load_table(spark, SF, "events").filter(F.col("value").isNotNull())
    bounds = ref.agg(
        F.percentile(F.col("value"), F.array(*[F.lit(p) for p in probs]))
    ).collect()[0][0]
    case = "CASE " + " ".join(
        f"WHEN value <= {b!r} THEN {i + 1}" for i, b in enumerate(bounds)
    ) + f" ELSE {K} END"
    con = duckdb.connect()
    cur = con.execute(
        f"""
        WITH r AS (
          SELECT {case} AS bucket, count(*) AS n_ref
          FROM '{SF}/events.parquet' WHERE value IS NOT NULL GROUP BY 1
        ), c AS (
          SELECT {case} AS bucket, count(*) AS n_cur
          FROM '{SF_BIG}/events.parquet' WHERE value IS NOT NULL GROUP BY 1
        ), j AS (
          SELECT coalesce(r.bucket, c.bucket) AS bucket,
                 coalesce(n_ref, 0) AS n_ref, coalesce(n_cur, 0) AS n_cur
          FROM r FULL JOIN c ON r.bucket = c.bucket
        ), t AS (SELECT sum(n_ref) AS tr, sum(n_cur) AS tc FROM j)
        SELECT bucket,
               round((n_ref + 1) / ((SELECT tr FROM t) + {K}), 6) AS p_ref,
               round((n_cur + 1) / ((SELECT tc FROM t) + {K}), 6) AS p_cur,
               round(((n_cur + 1) / ((SELECT tc FROM t) + {K})
                      - (n_ref + 1) / ((SELECT tr FROM t) + {K}))
                     * ln(((n_cur + 1) / ((SELECT tc FROM t) + {K}))
                          / ((n_ref + 1) / ((SELECT tr FROM t) + {K}))), 6)
                 AS psi_term
        FROM j
        """
    )
    dcols = [d[0] for d in cur.description]
    drows = cur.fetchall()
    con.close()
    assert sorted(sdf.columns) == sorted(dcols)
    assert len(srows) == len(drows) == K
    assert _canon(srows, sdf.columns) == _canon(drows, dcols)


def test_boundaries_agree_with_quantile_cont(spark):
    import duckdb

    from pyspark.sql import functions as F

    from basenine_spark.sources.tables import load_table

    probs = [i / K for i in range(1, K)]
    ref = load_table(spark, SF, "events").filter(F.col("value").isNotNull())
    bounds = ref.agg(
        F.percentile(F.col("value"), F.array(*[F.lit(p) for p in probs]))
    ).collect()[0][0]
    con = duckdb.connect()
    dbounds = con.execute(
        f"SELECT quantile_cont(value, {probs}) FROM "
        f"'{SF}/events.parquet' WHERE value IS NOT NULL"
    ).fetchone()[0]
    con.close()
    for a, b in zip(bounds, dbounds):
        assert a == pytest.approx(b, abs=1e-9)


def _write_events(tmp_path, name, vals):
    d = tmp_path / name
    d.mkdir()
    n = len(vals)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(n), pa.int64()),
                "ts": pa.array([1000 * i for i in range(n)], pa.timestamp("ms")),
                "user_id": pa.array([0] * n, pa.int64()),
                "event_type": pa.array(["view"] * n),
                "value": pa.array(vals, pa.float64()),
                "props": pa.array(["{}"] * n),
            }
        ),
        d / "events.parquet",
    )
    return str(d)


def test_identical_releases_near_zero_planted_shift_large(spark, tmp_path):
    rng = np.random.default_rng(9)
    base = list(rng.normal(50, 10, 2000))
    shifted = list(rng.normal(80, 10, 2000))
    a = _write_events(tmp_path, "a", base)
    b = _write_events(tmp_path, "b", list(base))
    c = _write_events(tmp_path, "c", shifted)
    same = sum(
        r["psi_term"] for r in relational.psi_drift(spark, a, b).collect()
    )
    moved = sum(
        r["psi_term"] for r in relational.psi_drift(spark, a, c).collect()
    )
    assert abs(same) < 0.01
    assert moved > 0.5  # way past the conventional 0.2 alert line


def test_psi_and_skew_build_lazily_without_driver_actions(spark):
    """VERDICT r6 item 6: the whole derivation is ONE lazy plan —
    boundaries and totals fold in as broadcast 1-row joins, so merely
    BUILDING the DataFrame must launch zero Spark jobs (the old form
    ran 3 collect()s before the caller's first action)."""
    from basenine_spark.ops import relational

    sc = spark.sparkContext
    sc.setJobGroup("lazy-probe", "construction must not run jobs")
    try:
        relational.psi_drift(spark, SF, SF_BIG, k=5)
        relational.skew_profile(spark, SF, key="user_id", top_k=5)
        jobs = sc.statusTracker().getJobIdsForGroup("lazy-probe")
    finally:
        sc.setJobGroup(None, None)
    assert jobs == [], f"construction launched jobs: {jobs}"
