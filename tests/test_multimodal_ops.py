"""Multimodal binary plumbing: frame sampling, stub decode, REAL
byte-histogram features and byte-decimation resize.

The oracle entries (`multimodal_meta`, `multimodal_frames`) pin the
JVM-side shapes at sf0.01; these tests pin the Arrow/`mapInPandas`
paths against pure-Python references, byte-for-byte.
"""

import math
import zlib

import pytest
from pyspark.sql import functions as F

from basenine_spark.ops import multimodal
from basenine_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _payloads(spark, n=20):
    docs = load_table(spark, SF, "documents").limit(n)
    return multimodal.attach_payload(docs)


def test_frame_sample_reassembles(spark):
    t = _payloads(spark).cache()
    frames = multimodal.frame_sample(t).collect()
    by_doc = {}
    for r in sorted(frames, key=lambda r: (r["doc_id"], r["frame_idx"])):
        by_doc.setdefault(r["doc_id"], b"")
        by_doc[r["doc_id"]] += bytes(r["frame"])
    orig = {r["doc_id"]: bytes(r["payload"]) for r in t.collect()}
    assert by_doc == {k: v for k, v in orig.items() if v}


def test_decode_stub_checksum_matches_python(spark):
    t = _payloads(spark)
    got = {r["doc_id"]: r["checksum"] for r in multimodal.decode_features(t).collect()}
    expect = {
        r["doc_id"]: zlib.crc32(bytes(r["payload"])) for r in t.collect()
    }
    assert got == expect


def test_decode_real_mode_raises(spark):
    t = _payloads(spark, n=2)
    with pytest.raises(Exception, match="NotImplementedError|real media"):
        multimodal.decode_features(t, mode="real").collect()


def test_byte_histogram_matches_python(spark):
    t = _payloads(spark).cache()
    got = {
        r["doc_id"]: (r["entropy"], list(r["hist"]))
        for r in multimodal.byte_histogram_features(t).collect()
    }
    for r in t.collect():
        data = bytes(r["payload"])
        counts = [0] * 16
        for b in data:
            counts[b >> 4] += 1
        total = sum(counts)
        p = [c / total for c in counts]
        entropy = round(-sum(x * math.log2(x) for x in p if x > 0), 6)
        e_got, h_got = got[r["doc_id"]]
        assert e_got == pytest.approx(entropy, abs=1e-6)
        assert h_got == pytest.approx([round(x, 6) for x in p], abs=1e-6)


def test_resize_decimates(spark):
    t = _payloads(spark, n=5).cache()
    small = {
        r["doc_id"]: bytes(r["payload"])
        for r in multimodal.resize_payload(t, factor=4).collect()
    }
    for r in t.collect():
        data = bytes(r["payload"])
        assert small[r["doc_id"]] == data[::4]


def test_resize_image_mode_raises(spark):
    # driver-side, before any plan/job: NotImplementedError directly,
    # not a wrapped executor PythonException — and it raises even on
    # an empty input (ADVICE r4)
    t = _payloads(spark, n=2)
    with pytest.raises(NotImplementedError, match="image resize"):
        multimodal.resize_payload(t, mode="image")
    with pytest.raises(NotImplementedError, match="image resize"):
        multimodal.resize_payload(t.limit(0), mode="image")


def test_resize_unknown_mode_raises(spark):
    with pytest.raises(ValueError, match="unknown resize mode"):
        multimodal.resize_payload(_payloads(spark, n=1), mode="nope")


def test_byte_ops_on_multibyte_text(spark, tmp_path):
    """Multibyte payloads: byte-level features and frame slicing operate
    on UTF-8 bytes (not codepoints) — frame reassembly must still be
    byte-exact and the histogram must match the Python reference."""
    import json as _json

    import pyarrow as pa
    import pyarrow.parquet as pq

    texts = ["héllo wörld", "你好，世界 — grüß", "emoji 🎉🎊 tail", "plain"]
    table = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["xx"] * len(texts), pa.string()),
            "source": pa.array(["s"] * len(texts), pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(table, str(tmp_path / "documents.parquet"))
    docs = load_table(spark, str(tmp_path), "documents")
    t = multimodal.attach_payload(docs).cache()

    # payload is the UTF-8 encoding
    for r in t.collect():
        assert bytes(r["payload"]) == texts[r["doc_id"]].encode("utf-8")
        assert r["meta"]["n_bytes"] == len(texts[r["doc_id"]].encode("utf-8"))

    frames = multimodal.frame_sample(t, frame_bytes=5).collect()
    by_doc = {}
    for r in sorted(frames, key=lambda r: (r["doc_id"], r["frame_idx"])):
        by_doc.setdefault(r["doc_id"], b"")
        by_doc[r["doc_id"]] += bytes(r["frame"])
    for i, text in enumerate(texts):
        assert by_doc[i] == text.encode("utf-8")

    got = {r["doc_id"]: r["checksum"] for r in multimodal.decode_features(t).collect()}
    for i, text in enumerate(texts):
        assert got[i] == zlib.crc32(text.encode("utf-8"))
