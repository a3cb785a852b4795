"""Z-order layout: Morton key correctness vs a pure-Python reference,
data preservation through the rewrite, and the measured point — a 2-D
box query must overlap strictly fewer z-ordered files than id-ordered
files of the same data."""

import pytest
from pyspark.sql import functions as F

from basenine_spark.ops import layout
from basenine_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _py_morton(x, y, bits):
    k = 0
    for i in range(bits):
        k |= ((x >> i) & 1) << (2 * i)
        k |= ((y >> i) & 1) << (2 * i + 1)
    return k


def test_morton_key_matches_python(spark):
    rows = [(x, y) for x in range(0, 1024, 37) for y in range(0, 1024, 41)]
    df = spark.createDataFrame(rows, "x long, y long").select(
        "x", "y", layout.morton_key(F.col("x"), F.col("y"), 10).alias("z")
    )
    for r in df.collect():
        assert r["z"] == _py_morton(r["x"], r["y"], 10)


def test_zorder_preserves_data(spark, tmp_path):
    dest = layout.zorder_write(spark, SF, str(tmp_path / "z"), files=8)
    src = load_table(spark, SF, "events").filter(
        F.col("user_id").isNotNull() & F.col("value").isNotNull()
    )
    out = spark.read.parquet(dest)
    assert out.count() == src.count()
    assert sorted(r["event_id"] for r in out.select("event_id").collect()) == sorted(
        r["event_id"] for r in src.select("event_id").collect()
    )


def test_box_query_prunes_more_files_than_id_order(spark, tmp_path):
    files = 16
    z_dest = layout.zorder_write(spark, SF, str(tmp_path / "z"), files=files)
    # baseline: same rows, same file count, laid out by event_id order
    src = load_table(spark, SF, "events").filter(
        F.col("user_id").isNotNull() & F.col("value").isNotNull()
    )
    id_dest = str(tmp_path / "id")
    (
        src.repartitionByRange(files, "event_id")
        .sortWithinPartitions("event_id")
        .write.mode("overwrite")
        .parquet(id_dest)
    )
    # a selective 2-D box: a few users x a narrow value band
    box = dict(
        x_col="user_id", x_range=(2, 4), y_col="value", y_range=(10.0, 25.0)
    )
    z_hit, z_total = layout.files_overlapping_box(z_dest, **box)
    id_hit, id_total = layout.files_overlapping_box(id_dest, **box)
    assert z_total == id_total == files
    # id-ordered files all span the full (user, value) space — no
    # pruning; the z-ordered layout must actually skip files
    assert z_hit < id_hit, (z_hit, id_hit)
    assert z_hit <= files // 2


def test_query_results_identical_across_layouts(spark, tmp_path):
    z_dest = layout.zorder_write(spark, SF, str(tmp_path / "z2"), files=8)
    src = load_table(spark, SF, "events").filter(
        F.col("user_id").isNotNull() & F.col("value").isNotNull()
    )
    pred = (
        (F.col("user_id").between(2, 4))
        & (F.col("value").between(10.0, 25.0))
    )
    expect = sorted(
        r["event_id"] for r in src.filter(pred).select("event_id").collect()
    )
    got = sorted(
        r["event_id"]
        for r in spark.read.parquet(z_dest)
        .filter(pred)
        .select("event_id")
        .collect()
    )
    assert got == expect


def test_statsless_footer_treated_as_overlapping(tmp_path):
    # regression (r12): a footer with no min/max statistics must count
    # as overlapping (cannot prove disjoint -> must scan), not crash
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table({"user_id": [100, 200], "value": [900.0, 950.0]})
    d = tmp_path / "nostats"
    d.mkdir()
    pq.write_table(tbl, str(d / "part-0.parquet"), write_statistics=False)
    # the data is far OUTSIDE the box; only the missing-stats guard
    # can make this file count as overlapping
    hit, total = layout.files_overlapping_box(
        str(d), "user_id", (2, 4), "value", (10.0, 25.0)
    )
    assert (hit, total) == (1, 1)

    md = pq.read_metadata(str(d / "part-0.parquet"))
    assert layout._footer_minmax(md, 0) is None
    assert layout._file_overlaps_box(md, 0, 1, (2, 4), (10.0, 25.0))


def test_morton_keys_entry_matches_local_recompute(spark):
    """Round-13 direct value row: (event_id, zkey) must equal a
    pure-Python recompute of the same bounds/bucketize/interleave
    (the driver re-derives this in DuckDB; this is the in-CI twin)."""
    import math

    ev = (
        load_table(spark, SF, "events")
        .filter(
            F.col("event_id").isNotNull()
            & F.col("user_id").isNotNull()
            & F.col("value").isNotNull()
        )
        .select("event_id", "user_id", "value")
        .collect()
    )
    xs = [float(r["user_id"]) for r in ev]
    ys = [float(r["value"]) for r in ev]
    x_lo, x_hi, y_lo, y_hi = min(xs), max(xs), min(ys), max(ys)

    def bucket(v, lo, hi):
        span = hi - lo
        if span <= 0:
            return 0
        return min(max(int(math.floor((v - lo) / span * 1024)), 0), 1023)

    expect = {}
    for r, x, y in zip(ev, xs, ys):
        xb, yb = bucket(x, x_lo, x_hi), bucket(y, y_lo, y_hi)
        expect[r["event_id"]] = _py_morton(xb, yb, 10)
    got = {
        r["event_id"]: r["zkey"]
        for r in layout.morton_keys(spark, SF).collect()
    }
    assert got == expect


def test_morton_keys_excludes_nan(spark, tmp_path):
    """ADVICE r13: a NaN value must be excluded like a NULL — it would
    otherwise poison the min/max bounds for every row AND break the
    cross-engine hash (Spark/DuckDB NaN ordering through floor/least/
    greatest is not guaranteed to agree).  Keys over the clean rows
    must be unaffected by the NaN row's presence."""
    import math

    rows = [
        (1, 10, 2.0, 0),
        (2, 20, 4.0, 0),
        (3, 30, float("nan"), 0),  # must be dropped, not poison bounds
        (4, 40, 8.0, 0),
        (5, None, 6.0, 0),
    ]
    spark.createDataFrame(
        rows, "event_id long, user_id long, value double, ts_ms long"
    ).write.parquet(str(tmp_path / "events.parquet"))
    got = {
        r["event_id"]: r["zkey"]
        for r in layout.morton_keys(spark, str(tmp_path)).collect()
    }
    assert set(got) == {1, 2, 4}
    # bounds derived from the NaN-free survivors only
    xs, ys = [10.0, 20.0, 40.0], [2.0, 4.0, 8.0]
    x_lo, x_hi, y_lo, y_hi = min(xs), max(xs), min(ys), max(ys)

    def bucket(v, lo, hi):
        span = hi - lo
        return min(max(int(math.floor((v - lo) / span * 1024)), 0), 1023)

    for eid, x, y in [(1, 10.0, 2.0), (2, 20.0, 4.0), (4, 40.0, 8.0)]:
        assert got[eid] == _py_morton(
            bucket(x, x_lo, x_hi), bucket(y, y_lo, y_hi), 10
        )


def test_morton_keys_float_parity_fuzz(spark):
    """The bucketize arithmetic ((v-lo)/span*1024, floored) must match
    a pure-Python IEEE-double recompute bit-for-bit across magnitudes
    and signs — the precondition for the DuckDB oracle's hash match
    (python floats ARE C doubles; association order is pinned)."""
    import math
    import random

    rng = random.Random(13)
    pools = [
        [rng.uniform(-1e9, 1e9) for _ in range(200)],
        [rng.uniform(-1e-6, 1e-6) for _ in range(200)],
        [rng.choice([0.0, -0.0, 1.5, 1.5, 2.5]) for _ in range(200)],
    ]
    for vals in pools:
        lo, hi = min(vals), max(vals)
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vals)], "i long, v double"
        )
        from pyspark.sql import functions as F

        got = {
            r["i"]: r["b"]
            for r in df.select(
                "i",
                layout._bucketize(
                    F.col("v"), F.lit(lo), F.lit(hi), 10
                ).alias("b"),
            ).collect()
        }
        span = hi - lo
        for i, v in enumerate(vals):
            if span <= 0:
                exp = 0
            else:
                exp = min(max(int(math.floor((v - lo) / span * 1024)), 0), 1023)
            assert got[i] == exp, (i, v, got[i], exp)
