"""Randomized differential fuzz for the substring-span and chunking
operators: small-vocabulary pseudo-random corpora (dense gram
collisions by construction) against independent pure-Python naive
implementations — same style as the BFL differential fuzz."""

import random

import pyarrow as pa
import pyarrow.parquet as pq

from basenine_spark.ops import dedup, pipeline

SEED = 20260814
VOCAB = ["alpha", "beta", "gamma", "delta", "eps"]


def _corpus(rnd, n_docs=40):
    texts = []
    for _ in range(n_docs):
        ln = rnd.randint(0, 30)
        texts.append(" ".join(rnd.choice(VOCAB) for _ in range(ln)))
    return texts


def _write(tmp_path, texts, tag):
    d = tmp_path / f"sf{tag}"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(texts)),
                "source": pa.array(["t"] * len(texts)),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        d / "documents.parquet",
    )
    return str(d)


def _naive_spans(texts, n):
    counts: dict = {}
    for t in texts:
        toks = t.split(" ")
        for i in range(len(toks) - n + 1):
            g = tuple(toks[i : i + n])
            counts[g] = counts.get(g, 0) + 1
    out = []
    for did, t in enumerate(texts):
        toks = t.split(" ")
        hits = [
            i + 1
            for i in range(len(toks) - n + 1)
            if counts[tuple(toks[i : i + n])] >= 2
        ]
        # interval merge (pos covers [pos, pos+n-1]; touching merges)
        spans = []
        for p in hits:
            if spans and p <= spans[-1][1] + 1:
                spans[-1] = (spans[-1][0], max(spans[-1][1], p + n - 1))
            else:
                spans.append((p, p + n - 1))
        for s, e in spans:
            out.append((did, s, e, e - s + 1))
    return sorted(out)


def _naive_chunks(texts, size, stride):
    out = []
    for did, t in enumerate(texts):
        toks = t.split(" ")
        L = len(toks)
        m = max(1, L - size + 1)
        starts = list(range(1, m + 1, stride))
        if starts[-1] != m:
            starts.append(m)
        for idx, s in enumerate(starts):
            chunk = toks[s - 1 : s - 1 + size]
            out.append((did, idx, s, len(chunk), " ".join(chunk)))
    return sorted(out)


def test_spans_fuzz_vs_naive(spark, tmp_path):
    rnd = random.Random(SEED)
    for trial in range(3):
        texts = _corpus(rnd)
        sf = _write(tmp_path, texts, f"s{trial}")
        got = sorted(
            (r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"])
            for r in dedup.duplicate_spans(spark, sf, n=4).collect()
        )
        assert got == _naive_spans(texts, 4), f"trial {trial}"


def test_chunks_fuzz_vs_naive(spark, tmp_path):
    rnd = random.Random(SEED + 1)
    for trial, (size, stride) in enumerate([(8, 8), (8, 5), (16, 3)]):
        texts = _corpus(rnd)
        sf = _write(tmp_path, texts, f"c{trial}")
        got = sorted(
            (
                r["doc_id"],
                r["chunk_idx"],
                r["chunk_start"],
                r["chunk_tokens"],
                r["chunk_text"],
            )
            for r in pipeline.chunk_documents(
                spark, sf, size=size, stride=stride
            ).collect()
        )
        assert got == _naive_chunks(texts, size, stride), f"trial {trial}"
