"""QUERY-mode golden table ported from server_test.go:123-206: 100
identical inserts, then (query, limit, leftOff) combinations with
expected streamed ids and rewritten documents."""

import json

import pytest

from basenine_spark.engine.db import BasenineDB, index_to_id

PAYLOAD = '{"brand":{"name":"Chevrolet"},"model":"Camaro","year":2021}'

# (query, expected_count, left_off) — server_test.go:123-132.  With
# leftOff=60 the reference streams records 61..99 (39 records).
CASES = [
    ('brand.name == "Chevrolet"', 100, 0),
    ('brand.name == "Chevrolet" and limit(10)', 10, 0),
    ('limit(10) and brand.name == "Chevrolet"', 10, 0),  # position-independent
    ('brand.name == "Chevrolet"', 39, 60),
]


@pytest.fixture(scope="module")
def db100(spark, tmp_path_factory):
    db = BasenineDB(spark, path=str(tmp_path_factory.mktemp("qm") / "store"))
    db.insert_json([PAYLOAD] * 100)
    return db


@pytest.mark.parametrize("query,expected,left_off", CASES)
def test_query_mode_golden(db100, query, expected, left_off):
    rows = db100.query(query, left_off=left_off).collect()
    assert len(rows) == expected
    start = left_off + 1 if left_off else 0
    for i, r in enumerate(rows):
        doc = r.asDict(recursive=True)
        # id injected into the document (native.go:302-311), order is
        # insertion order (native.go:432)
        assert doc["id"] == index_to_id(start + i)
        assert doc["brand"]["name"] == "Chevrolet"
        assert doc["model"] == "Camaro"
        assert doc["year"] == 2021


def test_single_mode_golden(db100):
    # server_test.go:208-265: /single by index
    rec = db100.single(index_to_id(42))
    assert rec["id"] == index_to_id(42)
    assert rec["model"] == "Camaro"
    assert db100.single(index_to_id(4242)) is None  # "Record does not exist!"


# (leftOff, direction, limit, expected_count) — server_test.go:403-418.
# Forward pages include leftOff; backward pages start just before it.
FETCH_CASES = [
    (0, 1, 5, 5),
    (13, 1, 5, 5),
    (13, 1, 200, 87),
    (93, 1, 20, 7),
    (99, -1, 5, 5),
    (13, -1, 5, 5),
    (13, -1, 200, 13),
    (93, -1, 20, 20),
]


@pytest.mark.parametrize("left_off,direction,limit,expected", FETCH_CASES)
def test_fetch_mode_golden(db100, left_off, direction, limit, expected):
    rows = db100.fetch(
        index_to_id(left_off), direction, 'brand.name == "Chevrolet"', limit
    ).collect()
    assert len(rows) == expected
    start = left_off if direction > 0 else left_off - 1
    for i, r in enumerate(rows):
        doc = r.asDict(recursive=True)
        assert doc["id"] == index_to_id(start + i * direction)


def test_metadata_frame_golden(db100):
    """Metadata frame wire-shape parity (structs.go:75-82,
    client_test.go:150-168): exact key set and casing."""
    md = db100.metadata(written=5, queried=7)
    frame = json.loads(md.to_json())
    assert set(frame) == {
        "current", "total", "numberOfWritten", "leftOff",
        "truncatedTimestamp", "noMoreData",
    }
    assert frame["total"] == 100
    assert frame["numberOfWritten"] == 5
    assert frame["current"] == 7
    assert frame["leftOff"] == index_to_id(99)
    assert frame["truncatedTimestamp"] == 0
    assert frame["noMoreData"] is False
