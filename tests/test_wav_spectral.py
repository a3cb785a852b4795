"""Spectral features: the decoded pipeline must RECOVER the synthesized
sine frequencies (within one FFT bin), corpus-wide, plus malformed-
payload tolerance."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from basenine_spark.ops import multimodal

SF = "/root/testdata/sf0.001"
BIN_HZ = 8000.0 / 256  # n_fft 256 at the synth table's 8 kHz


def test_known_sines_recovered(spark):
    rows = []
    for i, freq in enumerate([300.0, 625.0, 1500.0, 3000.0]):
        sr, n = 8000, 2048
        t = np.arange(n) / sr
        rows.append(
            (i, multimodal.encode_wav(0.5 * np.sin(2 * np.pi * freq * t), sr))
        )
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        r["doc_id"]: r
        for r in multimodal.wav_spectral_features(df).collect()
    }
    for i, freq in enumerate([300.0, 625.0, 1500.0, 3000.0]):
        assert got[i]["ok"]
        assert abs(got[i]["dominant_hz"] - freq) <= BIN_HZ
        assert abs(got[i]["centroid_hz"] - freq) <= 200.0
        assert got[i]["n_frames"] == 1 + (2048 - 256) // 128


def test_corpus_wide_frequency_recovery(spark):
    # every synth WAV is a sine at 100 + (doc_id % 40) * 10 Hz — the
    # whole distributed pipeline must recover it within one bin
    rows = multimodal.media_spectral_entry(spark, SF).collect()
    assert len(rows) > 100
    for r in rows:
        assert r["ok"], f"doc {r['doc_id']} failed to decode"
        expect = 100.0 + (r["doc_id"] % 40) * 10.0
        assert abs(r["dominant_hz"] - expect) <= BIN_HZ, (
            r["doc_id"], r["dominant_hz"], expect
        )


def test_malformed_and_short_payloads(spark):
    short = multimodal.encode_wav(np.zeros(100), 8000)  # < one frame
    df = spark.createDataFrame(
        [(0, b"garbage"), (1, short)], "doc_id long, payload binary"
    )
    got = {r["doc_id"]: r for r in multimodal.wav_spectral_features(df).collect()}
    assert not got[0]["ok"] and not got[1]["ok"]
