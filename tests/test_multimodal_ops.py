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


def test_decode_real_mode_dispatches_codecs(spark):
    """mode='real' is a real codec path now (round-6): BMP/PNG/WAV
    payloads produce physically meaningful features, text payloads
    degrade to [n_bytes, 0, 0, 0]."""
    import numpy as np

    px = np.zeros((4, 4, 3), dtype=np.uint8)
    px[:, :, 0] = 200  # solid red
    wav = multimodal.encode_wav(0.5 * np.sin(np.arange(800) / 8), 8000)
    df = spark.createDataFrame(
        [
            (1, bytearray(multimodal.encode_bmp(px))),
            (2, bytearray(multimodal.encode_png(px))),
            (3, bytearray(wav)),
            (4, bytearray(b"just text")),
        ],
        "doc_id long, payload binary",
    )
    got = {
        r["doc_id"]: list(r["feature"])
        for r in multimodal.decode_features(df, mode="real").collect()
    }
    # both image containers decode to the same pixels → same features
    assert got[1] == [4.0, 4.0, 200.0, 0.0]
    assert got[2] == got[1]
    assert got[3][0] == 800.0 and got[3][1] == 8000.0 and got[3][2] > 0
    assert got[4] == [9.0, 0.0, 0.0, 0.0]


def test_decode_unknown_mode_raises(spark):
    with pytest.raises(ValueError, match="unknown decode mode"):
        multimodal.decode_features(_payloads(spark, n=1), mode="nope")


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


def test_resize_image_mode_real(spark):
    """mode='image' decodes BMP/PNG, nearest-neighbor downsamples, and
    re-encodes in the ORIGINAL container; non-images pass through."""
    import numpy as np

    yy, xx = np.mgrid[0:8, 0:8]
    px = np.stack([xx * 30, yy * 30, xx * 0 + 9], axis=2).astype(np.uint8)
    df = spark.createDataFrame(
        [
            (1, bytearray(multimodal.encode_bmp(px))),
            (2, bytearray(multimodal.encode_png(px))),
            (3, bytearray(b"not an image")),
        ],
        "doc_id long, payload binary",
    )
    got = {
        r["doc_id"]: bytes(r["payload"])
        for r in multimodal.resize_payload(df, factor=2, mode="image").collect()
    }
    bmp_small = multimodal._decode_bmp(got[1])
    png_small = multimodal._decode_png(got[2])
    assert got[1][:2] == b"BM" and got[2][:8] == b"\x89PNG\r\n\x1a\n"
    assert bmp_small.shape == png_small.shape == (4, 4, 3)
    assert (bmp_small == px[::2, ::2]).all()
    assert (png_small == px[::2, ::2]).all()
    assert got[3] == b"not an image"  # pass-through, not dropped


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


# -- real codecs (stdlib WAV + BMP; round 5) ---------------------------


def test_wav_roundtrip_exact_features(spark):
    """Real RIFF/WAVE decode: a known sine comes back with its exact
    sample count, ~A/sqrt(2) RMS, and a zero-crossing rate of ~2f/sr."""
    import numpy as np

    from basenine_spark.ops.multimodal import encode_wav, wav_features

    sr, f, n, amp = 8000, 400, 8000, 0.5
    t = np.arange(n) / sr
    payload = encode_wav(amp * np.sin(2 * np.pi * f * t), sr)
    df = spark.createDataFrame([(1, bytearray(payload))], "doc_id long, payload binary")
    row = wav_features(df).collect()[0]
    assert row["ok"] and row["sample_rate"] == sr and row["n_samples"] == n
    assert row["duration_ms"] == 1000.0
    assert abs(row["rms"] - amp / np.sqrt(2)) < 1e-3
    # a 400 Hz sine crosses zero 800 times per second
    assert abs(row["zcr"] - 2 * f / sr) < 1e-3
    assert abs(row["peak"] - amp) < 1e-3


def test_wav_malformed_payload_yields_not_ok(spark):
    from basenine_spark.ops.multimodal import wav_features

    df = spark.createDataFrame(
        [(1, bytearray(b"not a wav at all"))], "doc_id long, payload binary"
    )
    row = wav_features(df).collect()[0]
    assert row["ok"] is False and row["n_samples"] == 0


def test_bmp_roundtrip_exact_stats_and_resize(spark):
    import numpy as np

    from basenine_spark.ops.multimodal import (
        _decode_bmp,
        bmp_resize,
        bmp_stats,
        encode_bmp,
    )

    # 4x6 image with known channel means (incl. a width that forces
    # BMP row padding: 6*3=18 bytes -> padded to 20)
    px = np.zeros((4, 6, 3), dtype=np.uint8)
    px[:, :, 0] = 10
    px[:, :, 1] = 20
    px[:, :, 2] = 200
    payload = encode_bmp(px)
    assert np.array_equal(_decode_bmp(payload), px)  # exact roundtrip
    df = spark.createDataFrame([(7, bytearray(payload))], "doc_id long, payload binary")
    row = bmp_stats(df).collect()[0]
    assert row["ok"] and (row["width"], row["height"]) == (6, 4)
    assert (row["mean_r"], row["mean_g"], row["mean_b"]) == (10.0, 20.0, 200.0)

    small = bmp_resize(df, factor=2).collect()[0]
    assert (small["width"], small["height"]) == (3, 2)
    resized = _decode_bmp(bytes(small["payload"]))
    assert np.array_equal(resized, px[::2, ::2])  # exact nearest-neighbor


def test_bmp_stats_rejects_non_bmp(spark):
    from basenine_spark.ops.multimodal import bmp_stats

    df = spark.createDataFrame(
        [(1, bytearray(b"PNG? nope"))], "doc_id long, payload binary"
    )
    assert bmp_stats(df).collect()[0]["ok"] is False


def test_media_decode_features_end_to_end(spark):
    """The mixed-media entry decodes every synthesized payload for both
    real modalities (ok=true across the board) and is deterministic."""
    from basenine_spark.ops.multimodal import media_decode_features

    sf = "/root/testdata/sf0.001"
    a = media_decode_features(spark, sf).collect()
    b = media_decode_features(spark, sf).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert len(a) > 0
    assert all(r["ok"] for r in a)
    kinds = {r["media_type"] for r in a}
    assert kinds == {"audio/wav", "image/bmp", "image/png"}


def test_wav_roundtrip_property():
    """Hypothesis: encode_wav → _decode_wav recovers samples within
    PCM16 quantization for any length/rate/amplitude."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=30, deadline=None)
    @given(
        st.integers(min_value=1, max_value=400),
        st.sampled_from([8000, 16000, 44100]),
        st.floats(min_value=0.01, max_value=0.99),
        st.integers(min_value=0, max_value=2**32 - 1),
    )
    def check(n, sr, amp, seed):
        rng = np.random.default_rng(seed)
        x = (amp * (2 * rng.random(n) - 1)).astype(np.float64)
        dec = multimodal._decode_wav(multimodal.encode_wav(x, sr))
        assert dec is not None
        got_sr, nch, y = dec
        assert got_sr == sr and nch == 1 and len(y) == n
        # encoder scales by 32767, decoder by 32768: worst case is
        # one quantization step plus the |x|/32768 scale mismatch
        assert np.abs(y - x).max() <= 2.5 / 32768

    check()


def test_real_decode_never_crashes_on_random_bytes():
    """decode_features(mode='real')'s per-payload dispatcher must
    degrade to the byte-fallback row on arbitrary junk — never raise
    (one corrupt payload must not kill a 100 TB decode pass)."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=150, deadline=None)
    @given(st.binary(min_size=0, max_size=300))
    def check(payload):
        # drive the worker-level decode exactly as the Arrow pass does
        import zlib

        crc = zlib.crc32(payload)
        img = multimodal._decode_image(payload)
        wav = multimodal._decode_wav(payload)
        # whichever decoder claims it must produce a well-formed result
        if img is not None:
            assert img.ndim == 3 and img.shape[2] == 3
        if wav is not None:
            sr, nch, x = wav
            assert sr > 0 and nch >= 1
        assert crc >= 0

    check()
