"""Hybrid sparse+dense retrieval (RRF fusion): planted-relevance and
plan-shape gates for :func:`basenine_spark.ops.similarity.hybrid_rrf_search`.

The exact-values check lives in the driver oracle (`search_hybrid_rrf`);
here we pin the *semantics* RRF is supposed to deliver — a document
relevant on BOTH axes outranks single-axis documents — and the scale
shape (query/stat sides broadcast; the only corpus-sized shuffle is the
term-filtered tf aggregate).
"""

import pytest

from basenine_spark.ops import similarity

SF = "/root/testdata/sf0.01"


def _planted_dir(spark, tmp_path):
    """Corpus where, for query doc 0 ('alpha beta gamma', embedding e0):
      * doc 10 shares tokens only (sparse hit, orthogonal embedding)
      * doc 11 has a near-identical embedding only (dense hit, no tokens)
      * doc 12 shares tokens AND embedding (should win the fusion)
      * docs 13+ are noise on both axes.
    """
    out = str(tmp_path / "hybrid_sf")
    docs = [
        (0, "alpha beta gamma", "q"),
        (10, "alpha beta gamma delta", "s"),
        (11, "zz yy xx ww", "d"),
        (12, "alpha beta gamma epsilon", "b"),
    ] + [(13 + i, f"noise{i} filler{i} pad{i} junk{i}", "n") for i in range(20)]
    embs = []
    for doc_id, _text, kind in docs:
        if kind in ("q", "d", "b"):
            v = [1.0, 0.05 * (doc_id % 3), 0.0, 0.0]
        elif kind == "s":
            v = [0.0, 0.0, 1.0, 0.0]
        else:
            v = [0.0, 0.0, 0.0, 1.0]
        embs.append((doc_id, [float(x) for x in v], 0))
    spark.createDataFrame(
        [(d, t, s, len(t)) for d, t, s in docs],
        "doc_id long, text string, source string, n_chars int",
    ).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    spark.createDataFrame(
        embs, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(f"{out}/embeddings.parquet")
    return out

def test_both_axes_doc_wins_fusion(spark, tmp_path):
    sf = _planted_dir(spark, tmp_path)
    rows = similarity.hybrid_rrf_search(
        spark, sf, n_queries=1, q_terms=8, depth=20, k=10
    ).collect()
    ranks = {r["doc_id"]: r["rank"] for r in rows if r["query_id"] == 0}
    rrfs = {r["doc_id"]: r["rrf"] for r in rows if r["query_id"] == 0}
    assert 12 in ranks and 10 in ranks and 11 in ranks
    # doc 12 is ranked on both lists -> strictly higher fused score
    assert rrfs[12] > rrfs[10] and rrfs[12] > rrfs[11]
    assert ranks[12] < ranks[10] and ranks[12] < ranks[11]


def test_self_match_excluded(spark, tmp_path):
    sf = _planted_dir(spark, tmp_path)
    rows = similarity.hybrid_rrf_search(spark, sf, n_queries=1).collect()
    assert all(r["doc_id"] != r["query_id"] for r in rows)


def test_rank_list_shape(spark):
    rows = similarity.hybrid_rrf_search(spark, SF, k=10).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert len(by_q) == 10
    for q, rs in by_q.items():
        got = sorted(r["rank"] for r in rs)
        assert got == list(range(1, len(rs) + 1)), f"rank gaps for q{q}"
        srt = sorted(rs, key=lambda r: r["rank"])
        rrfs = [r["rrf"] for r in srt]
        assert rrfs == sorted(rrfs, reverse=True)


def test_plan_shape_broadcasts_and_no_python(spark):
    plan = (
        similarity.hybrid_rrf_search(spark, SF)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # query terms / idf / stats / query vectors ride broadcasts
    assert "BroadcastExchange" in plan
    # pure JVM end-to-end: no Python eval stages on this path
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the corpus is never cartesian-joined against itself: the only
    # nested-loop joins are broadcast ones with bounded small sides
    # (1-row stats, n_queries-row query sides)
    assert "CartesianProduct" not in plan

def test_query_side_broadcast_envelope_gate(spark):
    # VERDICT r7: the dense leg is a BNLJ bounded only by n_queries —
    # the guard must fail fast before planning an n_queries x corpus
    # nested loop for non-broadcast-sized query batches.
    with pytest.raises(ValueError, match="broadcast envelope"):
        similarity.hybrid_rrf_search(spark, SF, n_queries=10_000)
    # deliberate override still works
    df = similarity.hybrid_rrf_search(
        spark, SF, n_queries=11, max_broadcast_queries=11
    )
    assert df.columns == ["query_id", "doc_id", "rrf", "rank"]
