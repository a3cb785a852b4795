"""DuckDB oracle checks for registry entries OUTSIDE the driver window.

The driver records CORRECTNESS rows for the first 50 registry entries
only, so oracle-backed entries past position 50 (demoted because their
semantics are also pinned by the golden corpus / fuzzing, or because an
in-window entry covers the same capability) would otherwise never face
the hard rows+schema+hash comparison.  This suite runs the exact same
gate locally at sf0.01: every oracle-backed entry in the registry gets
a hash-checked row somewhere — driver window or this file.
"""

import hashlib
import json

import pytest

from basenine_spark.registry import ORACLES, SPARK_QUERIES

WINDOW = 50
SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

OVERFLOW = [
    n for n in list(SPARK_QUERIES)[WINDOW:] if ORACLES[n] is not None
]


def _value_hash(rows, cols):
    # mirror of the driver gate: order-insensitive, columns sorted by name
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon = sorted(
        json.dumps([repr(row[i]) for i in order]) for row in rows
    )
    return hashlib.sha256("\n".join(canon).encode()).hexdigest()[:16]


@pytest.fixture(scope="module")
def oracle_con():
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def test_overflow_entries_exist():
    # the demotion list should actually contain oracle-backed entries;
    # if this empties out, the suite is vacuous and should be removed
    assert len(OVERFLOW) >= 10


@pytest.mark.parametrize("name", OVERFLOW)
def test_overflow_oracle(name, spark, oracle_con):
    sdf = SPARK_QUERIES[name](spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    odf = oracle_con.execute(ORACLES[name])
    ocols = [d[0] for d in odf.description]
    orows = odf.fetchall()

    assert len(srows) == len(orows), f"{name}: row count mismatch"
    assert sorted(scols) == sorted(ocols), f"{name}: schema mismatch"
    assert _value_hash(srows, scols) == _value_hash(orows, ocols), (
        f"{name}: value hash mismatch"
    )
