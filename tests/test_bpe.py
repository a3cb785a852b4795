"""Distributed BPE: the word-frequency factorization must match a
naive full-token-stream reference; merges and encoding pinned on
hand-computed corpora; token counts monotone in merge count."""

import json

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from basenine_spark.ops import bpe

SF = "/root/testdata/sf0.001"


# -- naive reference: trains on the raw token stream, no frequency
#    table — an independent implementation of the same algorithm


def _naive_bpe(words: list[str], num_merges: int):
    table = [list(w) for w in words if w]
    merges = []
    for _ in range(num_merges):
        counts: dict = {}
        for syms in table:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + 1
        if not counts:
            break
        (l, r), freq = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if freq < 2:
            break
        merges.append((l, r, freq))
        out_table = []
        for syms in table:
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            out_table.append(out)
        table = out_table
    return merges


def test_type_factorization_matches_token_stream_reference(spark):
    # full token stream of the sf corpus (small enough to do naively)
    t = pq.read_table(f"{SF}/documents.parquet")
    words = []
    for txt in t["text"].to_pylist():
        if txt is not None:
            words.extend(w for w in txt.split(" ") if w)
    ref = _naive_bpe(words, 24)
    got = [
        (r["left"], r["right"], int(r["pair_freq"]))
        for r in bpe.bpe_train(spark, SF, num_merges=24, top_v=10**6)
        .orderBy("rank")
        .collect()
    ]
    assert got == ref


def _write_docs(tmp_path, texts):
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(texts)),
                "source": pa.array(["t"] * len(texts)),
                "n_chars": pa.array(
                    [len(t) if t else 0 for t in texts], pa.int64()
                ),
            }
        ),
        d / "documents.parquet",
    )
    return str(d)


def test_hand_computed_merges(spark, tmp_path):
    # "aaab" x3, "aab" x2: pairs (a,a)=3*2+2=8, (a,b)=5 → merge (a,a).
    # Then aaab=[aa,a,b], aab=[aa,b]: (aa,a)=3, (a,b)=3, (aa,b)=2 —
    # tie at 3 breaks lexicographically to (a,b) → aaab=[aa,ab].
    # Then (aa,ab)=3 beats (aa,b)=2.
    sf = _write_docs(tmp_path, ["aaab aaab aaab aab aab"])
    got = [
        (r["left"], r["right"], int(r["pair_freq"]))
        for r in bpe.bpe_train(spark, sf, num_merges=3).orderBy("rank").collect()
    ]
    assert got == [("a", "a", 8), ("a", "b", 3), ("aa", "ab", 3)]


def test_tie_breaks_lexicographic(spark, tmp_path):
    # "cd" x2 and "ab" x2: both pairs freq 2 → (a,b) merges first
    sf = _write_docs(tmp_path, ["cd cd ab ab"])
    got = [
        (r["left"], r["right"])
        for r in bpe.bpe_train(spark, sf, num_merges=2).orderBy("rank").collect()
    ]
    assert got == [("a", "b"), ("c", "d")]


def test_encode_word_uses_rank_priority():
    ranks = {("a", "a"): 0, ("aa", "a"): 1, ("aaa", "b"): 2}
    assert bpe._encode_word("aaab", ranks) == ["aaab"]
    assert bpe._encode_word("aab", ranks) == ["aa", "b"]
    assert bpe._encode_word("xyz", ranks) == ["x", "y", "z"]


def test_token_counts_monotone_and_bounded(spark, tmp_path):
    sf = _write_docs(
        tmp_path, ["the cat sat on the mat", "the mat the cat", None]
    )
    with_0 = {
        r["doc_id"]: r
        for r in bpe.bpe_token_counts(spark, sf, num_merges=0).collect()
    }
    with_16 = {
        r["doc_id"]: r
        for r in bpe.bpe_token_counts(spark, sf, num_merges=16).collect()
    }
    texts = {0: "the cat sat on the mat", 1: "the mat the cat"}
    for d, txt in texts.items():
        n_chars = sum(len(w) for w in txt.split(" "))
        n_words = len(txt.split(" "))
        assert with_0[d]["n_bpe_tokens"] == n_chars  # 0 merges = chars
        assert with_16[d]["n_bpe_tokens"] <= with_0[d]["n_bpe_tokens"]
        assert with_16[d]["n_bpe_tokens"] >= n_words
        assert with_16[d]["n_words"] == n_words


def test_word_frequencies_match_duckdb(spark):
    import duckdb

    sdf = bpe.word_frequencies(spark, SF, top_v=50)
    srows = [(r["word"], int(r["freq"])) for r in sdf.collect()]
    con = duckdb.connect()
    drows = con.execute(
        f"""
        SELECT word, count(*) AS freq FROM (
          SELECT unnest(string_split(text, ' ')) AS word
          FROM '{SF}/documents.parquet' WHERE text IS NOT NULL
        ) WHERE word <> ''
        GROUP BY word ORDER BY freq DESC, word ASC LIMIT 50
        """
    ).fetchall()
    con.close()
    assert srows == [(w, int(f)) for w, f in drows]


def test_tokenizer_fertility_bounds_and_consistency(spark):
    """Fertility >= 1 (a word is at least one subword), decreases (or
    holds) as merges grow, and the per-source sums reconcile with the
    per-doc encode pass."""
    from collections import defaultdict

    from basenine_spark.ops.bpe import bpe_token_counts, tokenizer_fertility
    from basenine_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    rows = tokenizer_fertility(spark, sf, num_merges=16).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["fertility"] >= 1.0
        assert r["bytes_per_token"] > 0
        assert r["n_bpe_tokens"] >= r["n_words"] > 0
    # more merges => fewer (or equal) subword tokens per source
    more = {
        r["source"]: r["n_bpe_tokens"]
        for r in tokenizer_fertility(spark, sf, num_merges=48).collect()
    }
    for r in rows:
        assert more[r["source"]] <= r["n_bpe_tokens"]
    # reconciliation against the per-doc pass
    per_doc = defaultdict(int)
    src = {
        r["doc_id"]: r["source"]
        for r in load_table(spark, sf, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "source")
        .collect()
    }
    for r in bpe_token_counts(spark, sf, num_merges=16).collect():
        per_doc[src[r["doc_id"]]] += r["n_bpe_tokens"]
    assert {r["source"]: r["n_bpe_tokens"] for r in rows} == dict(per_doc)
