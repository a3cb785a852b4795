"""Audio fingerprint near-dup: noise/amplitude robustness on planted
copies, pigeonhole-exact pair recovery vs numpy brute force."""

import numpy as np
import pytest

from basenine_spark.ops import multimodal

SF = "/root/testdata/sf0.001"


def _tone_mix(rng, sr=8000, n=2048):
    """Broadband signal with a strong random spectral envelope — the
    regime real audio lives in and the one the band-difference
    fingerprint is built for. (Sparse pure-sine mixes are the
    documented adversarial case: most bands sit at the noise floor and
    their sign bits are unstable.)"""
    nb = n // 2 + 1
    env = np.exp(
        np.convolve(rng.normal(0, 1.8, nb), np.ones(5) / 5, mode="same")
    )
    phase = rng.uniform(0, 2 * np.pi, nb)
    spec = env * np.exp(1j * phase)
    spec[0] = 0
    x = np.fft.irfft(spec, n)
    return x / np.abs(x).max() * 0.8


@pytest.fixture(scope="module")
def planted(spark):
    rng = np.random.default_rng(11)
    rows, did = [], 0
    for b in range(3):
        base = _tone_mix(rng)
        variants = [
            base,
            base * 0.5 + rng.normal(0, 0.002, base.shape),  # quieter+noise
            base + rng.normal(0, 0.004, base.shape),
        ]
        for v in variants:
            rows.append(
                (did, "audio/wav", multimodal.encode_wav(v, 8000))
            )
            did += 1
    for b in range(6):
        rng2 = np.random.default_rng(500 + b)
        rows.append(
            (did, "audio/wav", multimodal.encode_wav(_tone_mix(rng2), 8000))
        )
        did += 1
    return spark.createDataFrame(
        rows, "doc_id long, media_type string, payload binary"
    )


def test_fingerprint_robust_to_amplitude_and_noise(spark, planted):
    fps = {
        r["doc_id"]: r["afp"]
        for r in multimodal.audio_fingerprint(planted).collect()
    }
    for b in range(3):
        base = fps[b * 3]
        for c in (1, 2):
            d = bin(base ^ fps[b * 3 + c]).count("1")
            assert d <= 6, f"variant {b*3+c} drifted to hamming {d}"


def test_near_dup_matches_brute_force(spark, planted):
    fps = {
        r["doc_id"]: r["afp"]
        for r in multimodal.audio_fingerprint(planted).collect()
    }
    for mh in (0, 6):
        expect = {
            (a, b, bin(fps[a] ^ fps[b]).count("1"))
            for a in fps
            for b in fps
            if a < b and bin(fps[a] ^ fps[b]).count("1") <= mh
        }
        got = {
            (r["doc_id_a"], r["doc_id_b"], r["hamming"])
            for r in multimodal.audio_near_dup(
                spark, SF, max_hamming=mh, media=planted
            ).collect()
        }
        assert got == expect, f"mismatch at max_hamming={mh}"


def test_planted_copies_found(spark, planted):
    pairs = {
        (r["doc_id_a"], r["doc_id_b"])
        for r in multimodal.audio_near_dup(
            spark, SF, max_hamming=6, media=planted
        ).collect()
    }
    for b in range(3):
        assert (b * 3, b * 3 + 1) in pairs
        assert (b * 3, b * 3 + 2) in pairs


def test_synth_entry_runs(spark):
    out = multimodal.audio_near_dup(spark, SF, max_hamming=4).collect()
    for r in out:
        assert r["doc_id_a"] < r["doc_id_b"] and 0 <= r["hamming"] <= 4
