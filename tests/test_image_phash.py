"""Perceptual hashing + image near-dup: hash invariances, and the
banded candidate join must find EXACTLY the numpy brute-force pair set
(pigeonhole exactness for Hamming <= 7)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from basenine_spark.ops import multimodal

SF = "/root/testdata/sf0.001"


def _gradient(w, h, bias):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            (xx * 255 // max(w - 1, 1)),
            (yy * 255 // max(h - 1, 1)),
            np.full_like(xx, bias % 256),
        ],
        axis=2,
    ).astype(np.uint8)


def _noise(img, rng, amount=2):
    out = img.astype(np.int16) + rng.integers(
        -amount, amount + 1, img.shape
    )
    return np.clip(out, 0, 255).astype(np.uint8)


def _textured(rng, w, h):
    """Low-frequency random image: an 8x8 random block upsampled — the
    DCT low band carries strong structure, so the hash is robust to
    pixel noise (a flat gradient's near-zero AC coefficients would sit
    on the median threshold and flip on any perturbation)."""
    block = rng.integers(0, 256, (8, 8, 3))
    img = np.kron(block, np.ones((h // 8, w // 8, 1)))
    return img[:h, :w].astype(np.uint8)


@pytest.fixture(scope="module")
def planted(spark):
    """3 base images, each with 2 slightly-noised copies, plus 6
    distinct images — near-dup structure known by construction."""
    rng = np.random.default_rng(7)
    rows = []
    did = 0

    def _enc(i, img):
        # alternate containers so the near-dup parity covers BMP-BMP,
        # PNG-PNG AND cross-format pairs (the hash is pixel-space)
        if i % 2 == 0:
            return "image/bmp", multimodal.encode_bmp(img)
        return "image/png", multimodal.encode_png(img)

    for b in range(3):
        base = _textured(rng, 48 + b * 8, 40 + b * 8)
        for copy in range(3):
            img = base if copy == 0 else _noise(base, rng)
            rows.append((did, *_enc(did, img)))
            did += 1
    for b in range(6):
        rng2 = np.random.default_rng(100 + b)
        img = rng2.integers(0, 256, (24 + b, 30 + b, 3)).astype(np.uint8)
        rows.append((did, *_enc(did, img)))
        did += 1
    return spark.createDataFrame(
        rows, "doc_id long, media_type string, payload binary"
    )


def test_phash_deterministic_and_noise_robust(spark, planted):
    hashes = {
        r["doc_id"]: r["phash"]
        for r in multimodal.image_phash(planted).collect()
    }
    again = {
        r["doc_id"]: r["phash"]
        for r in multimodal.image_phash(planted).collect()
    }
    assert hashes == again
    # noised copies stay within Hamming 7 of their base
    for b in range(3):
        base = hashes[b * 3]
        for c in (1, 2):
            d = bin(base ^ hashes[b * 3 + c]).count("1")
            assert d <= 7, f"copy {b*3+c} drifted to hamming {d}"


def test_near_dup_matches_brute_force_exactly(spark, planted):
    hashes = {
        r["doc_id"]: r["phash"]
        for r in multimodal.image_phash(planted).collect()
    }
    for mh in (0, 4, 7):
        expect = {
            (a, b, bin(hashes[a] ^ hashes[b]).count("1"))
            for a in hashes
            for b in hashes
            if a < b and bin(hashes[a] ^ hashes[b]).count("1") <= mh
        }
        got = {
            (r["doc_id_a"], r["doc_id_b"], r["hamming"])
            for r in multimodal.image_near_dup(
                spark, SF, max_hamming=mh, media=planted
            ).collect()
        }
        assert got == expect, f"mismatch at max_hamming={mh}"


def test_planted_copies_found(spark, planted):
    pairs = {
        (r["doc_id_a"], r["doc_id_b"])
        for r in multimodal.image_near_dup(
            spark, SF, max_hamming=7, media=planted
        ).collect()
    }
    for b in range(3):
        ids = [b * 3, b * 3 + 1, b * 3 + 2]
        for i in range(3):
            for j in range(i + 1, 3):
                assert (ids[i], ids[j]) in pairs


# -- PNG codec goldens ------------------------------------------------------


def test_png_roundtrip_byte_exact():
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (13, 17, 3)).astype(np.uint8)
    dec = multimodal._decode_png(multimodal.encode_png(px))
    assert dec is not None and (dec == px).all()


def test_png_all_filter_types_decoded():
    """The decoder must invert every scanline filter of the PNG spec
    (§9): build an image whose rows are forward-filtered with types
    0..4 and check pixel-exact recovery."""
    import struct
    import zlib

    rng = np.random.default_rng(11)
    h, w, bpp = 5, 9, 3
    px = rng.integers(0, 256, (h, w, bpp)).astype(np.uint8)
    raw = bytearray()
    prev = np.zeros(w * bpp, dtype=np.int32)
    for y in range(h):
        line = px[y].reshape(-1).astype(np.int32)
        ftype = y % 5
        filt = np.empty_like(line)
        for x in range(len(line)):
            left = int(line[x - bpp]) if x >= bpp else 0
            up = int(prev[x])
            ul = int(prev[x - bpp]) if x >= bpp else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = left
            elif ftype == 2:
                pred = up
            elif ftype == 3:
                pred = (left + up) >> 1
            else:
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if pa <= pb and pa <= pc else (up if pb <= pc else ul)
            filt[x] = (line[x] - pred) & 0xFF
        raw.append(ftype)
        raw.extend(filt.astype(np.uint8).tobytes())
        prev = line

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body))
        )

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    dec = multimodal._decode_png(png)
    assert dec is not None and (dec == px).all()


def test_png_gray_and_rgba_color_types():
    import struct
    import zlib

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body))
        )

    def make(ctype, channels, data):
        h = len(data)
        w = len(data[0]) // channels
        raw = b"".join(b"\x00" + bytes(row) for row in data)
        return (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b"")
        )

    gray = make(0, 1, [[10, 20], [30, 40]])
    dg = multimodal._decode_png(gray)
    assert dg.shape == (2, 2, 3) and (dg[0, 0] == [10, 10, 10]).all()
    rgba = make(6, 4, [[1, 2, 3, 255, 4, 5, 6, 128]])
    da = multimodal._decode_png(rgba)
    assert da.shape == (1, 2, 3)
    assert (da[0, 0] == [1, 2, 3]).all() and (da[0, 1] == [4, 5, 6]).all()


def test_png_bmp_phash_identical_for_same_pixels(spark):
    rng = np.random.default_rng(5)
    px = _textured(rng, 48, 40)
    df = spark.createDataFrame(
        [
            (0, bytearray(multimodal.encode_bmp(px))),
            (1, bytearray(multimodal.encode_png(px))),
        ],
        "doc_id long, payload binary",
    )
    got = {r["doc_id"]: r["phash"] for r in multimodal.image_phash(df).collect()}
    assert got[0] == got[1]


def test_png_truncated_and_corrupt_rejected():
    px = np.zeros((4, 4, 3), dtype=np.uint8)
    good = multimodal.encode_png(px)
    assert multimodal._decode_png(good[: len(good) // 2]) is None
    bad = bytearray(good)
    bad[40] ^= 0xFF  # corrupt inside the IDAT zlib stream
    assert multimodal._decode_png(bytes(bad)) is None


def test_non_bmp_payloads_flagged(spark):
    df = spark.createDataFrame(
        [(0, b"not an image"), (1, b"")],
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r["ok"] for r in multimodal.image_phash(df).collect()}
    assert rows == {0: False, 1: False}


def test_bad_threshold_rejected(spark):
    with pytest.raises(ValueError):
        multimodal.image_near_dup(spark, SF, max_hamming=8)


def test_synth_table_entry_runs(spark):
    out = multimodal.image_near_dup(spark, SF, max_hamming=6).collect()
    for r in out:
        assert r["doc_id_a"] < r["doc_id_b"]
        assert 0 <= r["hamming"] <= 6


# -- unified asset dedup ----------------------------------------------------


def test_asset_near_dup_routes_modalities(spark, tmp_path):
    """One report over a mixed-media table: exact text dups, pHash
    image pairs, fingerprint audio pairs — each labeled, never
    crossing modalities."""
    rng = np.random.default_rng(9)
    img = _textured(rng, 48, 40)
    t = np.arange(1600) / 8000.0
    wav = multimodal.encode_wav(0.5 * np.sin(2 * np.pi * 440 * t), 8000)
    rows = [
        (0, "text/plain", b"same text bytes"),
        (1, "text/plain", b"same text bytes"),       # exact text dup
        (2, "text/plain", b"different"),
        (3, "image/bmp", multimodal.encode_bmp(img)),
        (4, "image/png", multimodal.encode_png(_noise(img, rng))),  # near-dup
        (5, "audio/wav", wav),
        (6, "audio/wav", wav),                        # identical audio
    ]
    media = spark.createDataFrame(
        rows, "doc_id long, media_type string, payload binary"
    )
    pairs = {
        (r["doc_id_a"], r["doc_id_b"]): (r["modality"], r["distance"])
        for r in multimodal.asset_near_dup(
            spark, SF, media=media
        ).collect()
    }
    assert pairs[(0, 1)] == ("text", 0)
    assert (0, 2) not in pairs
    assert (3, 4) in pairs and pairs[(3, 4)][0] == "image"
    assert pairs[(5, 6)] == ("audio", 0)
    # no cross-modality pair exists
    kinds = {k: v[0] for k, v in pairs.items()}
    by_id = {0: "t", 1: "t", 2: "t", 3: "i", 4: "i", 5: "a", 6: "a"}
    for (a, b), m in kinds.items():
        assert by_id[a] == by_id[b]


def test_asset_near_dup_on_synth_table(spark):
    out = multimodal.asset_near_dup(spark, SF).collect()
    mods = {r["modality"] for r in out}
    for r in out:
        assert r["doc_id_a"] < r["doc_id_b"]
        assert r["distance"] >= 0
    # the synth images are all-distinct gradients (no near-pairs at
    # this hamming), but the sine-audio family collides by design —
    # at least one modality reports and none is mislabeled
    assert mods <= {"text", "image", "audio"}
    assert "audio" in mods


def test_png_roundtrip_property_random_shapes():
    """Hypothesis property: encode→decode is pixel-exact for any RGB
    image shape (incl. 1×1 and skinny rows/columns)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        st.integers(min_value=1, max_value=24),
        st.integers(min_value=1, max_value=24),
        st.integers(min_value=0, max_value=2**32 - 1),
    )
    def check(h, w, seed):
        rng = np.random.default_rng(seed)
        px = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        dec = multimodal._decode_png(multimodal.encode_png(px))
        assert dec is not None and dec.shape == (h, w, 3)
        assert (dec == px).all()

    check()


def test_png_decoder_never_crashes_on_mutations():
    """Robustness property: random byte mutations of a valid PNG must
    yield either a correct decode or None — never an exception (a
    corrupt payload at scale must degrade to a flagged row)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    rng = np.random.default_rng(2)
    base = multimodal.encode_png(
        rng.integers(0, 256, (6, 7, 3)).astype(np.uint8)
    )

    @settings(max_examples=120, deadline=None)
    @given(
        st.integers(min_value=0, max_value=len(base) - 1),
        st.integers(min_value=0, max_value=255),
    )
    def check(pos, val):
        mutated = bytearray(base)
        mutated[pos] = val
        out = multimodal._decode_png(bytes(mutated))
        assert out is None or (
            hasattr(out, "shape") and out.shape[2] == 3
        )

    check()
