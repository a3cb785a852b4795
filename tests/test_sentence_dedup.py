"""C4-style sentence-level dedup: duplicate-sentence ratio + keep-first
scrub (Raffel et al. 2020; Lee et al. 2022).

The driver corpus has no sentence punctuation (each doc is one
"sentence" there — the oracle still pins whole-doc multiplicity and
the fuzz's whitespace/duplicate mutations), so the multi-sentence
semantics live HERE on a planted corpus: cross-document duplicates,
within-document repeats, case-folded and whitespace-collapsed
matching, keep-first survivor choice, singleton passthrough.
"""

from basenine_spark.ops import text


def _planted(spark, tmp_path):
    out = str(tmp_path / "sent_sf")
    rows = [
        # doc 0: 3 sentences; "common line" also in docs 1 and 2
        (0, "Common line. Unique zero! Tail zero?", "en", "s0", 30),
        # doc 1: case + whitespace variant of the common line, plus a
        # within-doc repeat ("echo. echo.")
        (1, "common   LINE. Echo! echo. Solo one.", "en", "s0", 30),
        # doc 2: the common line again, later doc_id
        (2, "Unique two. Common line.", "en", "s1", 20),
        # doc 3: all-unique
        (3, "Fully unique alpha. Fully unique beta.", "en", "s1", 30),
        # doc 4: punctuation-only text → zero sentences → absent
        (4, "...!!!???", "en", "s1", 9),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int"
    ).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    return out


def test_dup_ratio_planted(spark, tmp_path):
    sf = _planted(spark, tmp_path)
    got = {r["doc_id"]: r for r in text.dup_sentence_stats(spark, sf).collect()}
    # doc 0: 3 sentences, only "Common line" duplicated (4 occurrences
    # corpus-wide: docs 0, 1, 2)
    assert got[0]["n_sentences"] == 3 and got[0]["n_dup_sentences"] == 1
    assert abs(got[0]["dup_sentence_ratio"] - 0.333333) < 1e-9
    # doc 1: 4 sentences; dup = the common-line variant + BOTH copies
    # of the within-doc repeat (occurrence-counted, not doc-distinct)
    assert got[1]["n_sentences"] == 4 and got[1]["n_dup_sentences"] == 3
    # doc 3: nothing duplicated
    assert got[3]["n_dup_sentences"] == 0 and got[3]["dup_sentence_ratio"] == 0.0
    # doc 4: zero sentences -> absent (documented)
    assert 4 not in got


def test_scrub_keep_first_planted(spark, tmp_path):
    sf = _planted(spark, tmp_path)
    kept = text.scrub_dup_sentences(spark, sf).collect()
    by_doc = {}
    for r in kept:
        by_doc.setdefault(r["doc_id"], []).append((r["sent_idx"], r["sentence"]))
    for v in by_doc.values():
        v.sort()
    # the common line survives ONLY at its first occurrence (doc 0, idx 0)
    assert (0, "Common line") in by_doc[0]
    assert all("common" not in s.lower() for _, s in by_doc.get(1, []))
    assert all("common" not in s.lower() for _, s in by_doc.get(2, []))
    # within-doc repeat: first "Echo" kept, second dropped
    d1 = [s.lower() for _, s in by_doc[1]]
    assert d1.count("echo") == 1
    # singletons pass through untouched
    assert len(by_doc[3]) == 2
    # whitespace-collapsed matching: doc 1's "common   LINE" was the
    # variant that matched — and was dropped, not kept separately
    total_common = sum(
        1 for v in by_doc.values() for _, s in v if s.lower() == "common line"
    )
    assert total_common == 1


def test_scrub_idempotent_multiset(spark, tmp_path):
    # scrubbing the kept set again changes nothing (all keys unique)
    sf = _planted(spark, tmp_path)
    kept = text.scrub_dup_sentences(spark, sf)
    keys = [r["sentence"].lower() for r in kept.collect()]
    assert len(keys) == len(set(keys))


def test_plan_shape(spark):
    sf = "/root/testdata/sf0.001"
    for fn in (text.dup_sentence_stats, text.scrub_dup_sentences):
        plan = fn(spark, sf)._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        assert "CartesianProduct" not in plan
