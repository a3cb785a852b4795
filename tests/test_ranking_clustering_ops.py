"""Round-5 additions: BM25 relevance ranking, k-means embedding
clustering, and SemDeDup-style semantic deduplication.

BM25 is differentially pinned against its DuckDB oracle at sf0.001
(same comparison the driver runs at sf0.01); the clustering/semdedup
entries are rows-only for the driver (iterative algorithms), so their
semantics — determinism, cluster invariants, planted-near-dup
elimination, keep-order — are pinned here.
"""

import json
import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from basenine_spark.ops import similarity, text
from basenine_spark.registry import ORACLES, SPARK_QUERIES

SF = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    yield con
    con.close()


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(json.dumps([repr(row[i]) for i in order]) for row in rows)


# -- BM25 --------------------------------------------------------------


def test_bm25_matches_duckdb_oracle(spark, duck):
    sdf = SPARK_QUERIES["text_bm25_topk"](spark, SF)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    cur = duck.execute(ORACLES["text_bm25_topk"])
    dcols = [d[0] for d in cur.description]
    drows = cur.fetchall()
    assert sorted(scols) == sorted(dcols)
    assert _canon(srows, scols) == _canon(drows, dcols)


def test_bm25_hand_computed_tiny_corpus(spark, tmp_path):
    """One-term sanity check against the textbook formula: two docs,
    the one with the higher tf (at equal length) scores higher, and the
    absolute score matches a hand evaluation of Okapi BM25."""
    docs = pa.table(
        {
            "doc_id": [0, 1, 2],
            "text": [
                "spark spark beats disk",      # tf=2, dl=4
                "spark is a query engine",     # tf=1, dl=5
                "no relevant terms here now",  # tf=0
            ],
            "lang": ["en"] * 3,
            "source": ["t"] * 3,
            "n_chars": [22, 23, 24],
        }
    )
    d = tmp_path / "tiny"
    d.mkdir()
    pq.write_table(docs, str(d / "documents.parquet"))
    out = text.bm25_topk(spark, str(d), terms=("spark",), k=10).collect()
    # doc 2 has no query terms: absent from the ranking
    assert [r["doc_id"] for r in out] == [0, 1]
    n, df_t, avgdl = 3, 2, (4 + 5 + 5) / 3.0
    idf = math.log(1 + (n - df_t + 0.5) / (df_t + 0.5))

    def bm25(tf, dl):
        return idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))

    assert out[0]["bm25"] == pytest.approx(round(bm25(2, 4), 4), abs=1e-9)
    assert out[1]["bm25"] == pytest.approx(round(bm25(1, 5), 4), abs=1e-9)
    assert [r["rank"] for r in out] == [1, 2]


# -- k-means clustering ------------------------------------------------


def test_embed_clusters_deterministic_and_complete(spark):
    a = similarity.embed_clusters(spark, SF, k=8, iters=3).collect()
    b = similarity.embed_clusters(spark, SF, k=8, iters=3).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]  # no RNG anywhere
    total = spark.read.parquet(f"{SF}/embeddings.parquet").count()
    assert len(a) == total  # every vector assigned
    clusters = {r["cluster"] for r in a}
    assert clusters <= set(range(8))
    assert len(clusters) > 1  # the data is not degenerate
    assert all(r["dist"] >= 0.0 for r in a)


def test_embed_clusters_iterations_reduce_inertia(spark):
    def inertia(iters):
        rows = similarity.embed_clusters(spark, SF, k=8, iters=iters).collect()
        return sum(r["dist"] ** 2 for r in rows)

    assert inertia(4) <= inertia(1) + 1e-6  # Lloyd's monotonicity


# -- SemDeDup ----------------------------------------------------------


def _write_embeddings(tmp_path, vecs):
    t = pa.table(
        {
            "vec_id": list(range(len(vecs))),
            "embedding": pa.array(
                [list(map(float, v)) for v in vecs],
                type=pa.list_(pa.float32()),
            ),
            "label": [0] * len(vecs),
        }
    )
    d = tmp_path / "sem"
    d.mkdir(exist_ok=True)
    pq.write_table(t, str(d / "embeddings.parquet"))
    return str(d)


def test_semantic_dedup_drops_planted_near_dups(spark, tmp_path):
    """10 seeded base vectors, each followed by 2 noisy copies
    (cosine > 0.999): survivors are exactly the 10 lowest-id originals
    (greedy keep order = ascending vec_id — the SemDeDup determinism
    contract)."""
    rng = np.random.RandomState(7)
    base = rng.randn(10, 64)
    # bases first (ids 0-9), then the noisy copies (ids 10-29): the
    # deterministic lowest-id k-means init then seeds from distinct
    # vectors (an init drawn from a run of near-identical vectors can
    # split a dup group across clusters — the documented reason SemDeDup
    # uses k ≪ N and meaningful cluster sizes)
    vecs = [base[i] for i in range(10)]
    for i in range(10):
        for _ in range(2):
            vecs.append(base[i] + rng.randn(64) * 1e-3)
    sf_dir = _write_embeddings(tmp_path, vecs)
    out = similarity.semantic_dedup(
        spark, sf_dir, k=4, iters=2, threshold=0.99
    ).collect()
    # survivors: exactly the 10 lowest-id originals
    assert [r["vec_id"] for r in out] == list(range(10))


def test_semantic_dedup_threshold_one_keeps_everything(spark, tmp_path):
    rng = np.random.RandomState(3)
    sf_dir = _write_embeddings(tmp_path, rng.randn(30, 64))
    out = similarity.semantic_dedup(
        spark, sf_dir, k=4, iters=2, threshold=1.1
    ).collect()
    assert len(out) == 30  # nothing exceeds an impossible threshold


def test_semantic_dedup_on_driver_table_is_deterministic(spark):
    a = similarity.semantic_dedup(spark, SF, threshold=0.35).collect()
    b = similarity.semantic_dedup(spark, SF, threshold=0.35).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    # survivors are a subset of the corpus, in ascending id order
    ids = [r["vec_id"] for r in a]
    assert ids == sorted(ids)


# -- unigram surprisal -------------------------------------------------


def test_surprisal_matches_duckdb_oracle(spark, duck):
    sdf = SPARK_QUERIES["text_unigram_surprisal"](spark, SF)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    cur = duck.execute(ORACLES["text_unigram_surprisal"])
    dcols = [d[0] for d in cur.description]
    drows = cur.fetchall()
    assert sorted(scols) == sorted(dcols)
    assert _canon(srows, scols) == _canon(drows, dcols)


def test_surprisal_rare_tokens_rank_first(spark, tmp_path):
    """A doc made of corpus-unique tokens must out-surprise docs made
    of the corpus's most common token."""
    docs = pa.table(
        {
            "doc_id": [0, 1, 2],
            "text": [
                "common common common common",
                "common common common rareword",
                "unique1 unique2 unique3 unique4",
            ],
            "lang": ["en"] * 3,
            "source": ["t"] * 3,
            "n_chars": [10, 11, 12],
        }
    )
    d = tmp_path / "sup"
    d.mkdir()
    pq.write_table(docs, str(d / "documents.parquet"))
    out = text.unigram_surprisal(spark, str(d), k=10).collect()
    assert [r["doc_id"] for r in out] == [2, 1, 0]
    assert out[0]["surprisal"] > out[1]["surprisal"] > out[2]["surprisal"]


def test_semantic_dedup_cluster_cap_bounds_tasks(spark, tmp_path):
    """The skew guard: with a tiny max_cluster_size every grouped task
    stays within the cap, the result remains deterministic, and
    survivors are a superset of the uncapped run (sub-partitioning can
    only MISS near-dup pairs, never drop extra docs)."""
    rng = np.random.RandomState(11)
    base = rng.randn(6, 64)
    vecs = [base[i] for i in range(6)]
    for i in range(6):
        for _ in range(4):
            vecs.append(base[i] + rng.randn(64) * 1e-3)
    sf_dir = _write_embeddings(tmp_path, vecs)
    uncapped = similarity.semantic_dedup(
        spark, sf_dir, k=2, iters=2, threshold=0.99
    ).collect()
    capped = similarity.semantic_dedup(
        spark, sf_dir, k=2, iters=2, threshold=0.99, max_cluster_size=5
    ).collect()
    capped2 = similarity.semantic_dedup(
        spark, sf_dir, k=2, iters=2, threshold=0.99, max_cluster_size=5
    ).collect()
    assert [tuple(r) for r in capped] == [tuple(r) for r in capped2]
    assert {r["vec_id"] for r in uncapped} <= {r["vec_id"] for r in capped}
    # the guard still removes most dups (each sub-partition dedups
    # internally): far fewer survivors than the 30 inputs
    assert len(capped) < 30


def test_surprisal_min_count_caps_vocab_keeps_ranking_sane(spark, tmp_path):
    """min_count drops rare tokens from the probability table; docs
    dense in capped-out (rare) tokens still rank at the top via the
    fixed OOV surprisal, and min_count=1 equals the exact path."""
    docs = pa.table(
        {
            "doc_id": [0, 1, 2],
            "text": [
                "common common common common common common",
                "common common rare1 rare2",
                "rare3 rare4 rare5 rare6",
            ],
            "lang": ["en"] * 3,
            "source": ["t"] * 3,
            "n_chars": [10, 11, 12],
        }
    )
    d = tmp_path / "cap"
    d.mkdir()
    pq.write_table(docs, str(d / "documents.parquet"))
    exact = text.unigram_surprisal(spark, str(d), k=10).collect()
    capped = text.unigram_surprisal(spark, str(d), k=10, min_count=2).collect()
    # ordering identical here: rare-dense docs stay on top either way
    assert [r["doc_id"] for r in exact] == [2, 1, 0]
    assert [r["doc_id"] for r in capped] == [2, 1, 0]
    # the all-common doc is scored from the (uncapped) exact counts
    assert capped[-1]["surprisal"] == exact[-1]["surprisal"]
    # all-rare doc under the cap scores the fixed OOV surprisal
    import math

    total = 14  # 8 common + 6 rare tokens
    assert capped[0]["surprisal"] == round(-math.log((2 - 0.5) / total), 4)


def _zipf_docs(tmp_path, name="zipf"):
    """Planted Zipf corpus: a 20-token head carrying >99 % of the
    token mass plus a long tail of singleton tokens — the vocabulary
    shape the top_v cap is designed for (the driver's synthetic corpus
    is uniform-31-token, where ANY cap removes head mass)."""
    import random

    rng = random.Random(13)
    head = [f"h{i}" for i in range(20)]
    texts = []
    for d in range(120):
        n = 60
        toks = [head[min(int(rng.paretovariate(1.1)) % 20, 19)] for _ in range(n)]
        if d % 10 == 0:  # every 10th doc is rare-dense (the review queue)
            toks[:12] = [f"tail{d}_{j}" for j in range(12)]
        texts.append(" ".join(toks))
    docs = pa.table(
        {
            "doc_id": list(range(len(texts))),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["t"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    )
    d = tmp_path / name
    d.mkdir()
    pq.write_table(docs, str(d / "documents.parquet"))
    return str(d)


def test_surprisal_topv_broadcast_default_agrees_with_exact(spark, tmp_path):
    """The documented 100 TB default (top_v head vocabulary + forced
    broadcast join) against the exact oracle baseline: on a corpus with
    a genuine Zipf tail, capping to the head keeps >=95 % top-k
    agreement, and the plan shows the broadcast (the corpus token
    stream is never shuffled on the token key)."""
    sf = _zipf_docs(tmp_path)
    exact = [r["doc_id"] for r in text.unigram_surprisal(spark, sf, k=40).collect()]
    bdf = text.unigram_surprisal(spark, sf, k=40, top_v=20)
    bounded = [r["doc_id"] for r in bdf.collect()]
    agree = len(set(exact) & set(bounded)) / len(exact)
    assert agree >= 0.95, f"top-k agreement {agree}"
    # every rare-dense planted doc surfaces in both
    planted = {d for d in range(120) if d % 10 == 0}
    assert planted <= set(exact) and planted <= set(bounded)
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        bdf.explain("formatted")
    assert "BroadcastHashJoin" in buf.getvalue()


def test_surprisal_topv_mass_rule_on_driver_corpus(spark):
    """At sf0.01 the sizing rule ('cap to the head carrying >=99 % of
    token mass') selects the full 31-token vocabulary — uniform corpora
    have no tail to cut — and the bounded form then agrees with the
    exact form exactly. The rule, not a fixed V, is the contract."""
    sf = "/root/testdata/sf0.01"
    counts = sorted(
        (
            r["cnt"]
            for r in spark.read.parquet(f"{sf}/documents.parquet")
            .selectExpr("explode(split(text, ' ')) AS token")
            .where("token <> '' AND token IS NOT NULL")
            .groupBy("token")
            .count()
            .withColumnRenamed("count", "cnt")
            .collect()
        ),
        reverse=True,
    )
    total = sum(counts)
    acc, v = 0, 0
    for c in counts:
        acc += c
        v += 1
        if acc >= 0.99 * total:
            break
    exact = [r["doc_id"] for r in text.unigram_surprisal(spark, sf, k=100).collect()]
    bounded = [
        r["doc_id"]
        for r in text.unigram_surprisal(spark, sf, k=100, top_v=v).collect()
    ]
    agree = len(set(exact) & set(bounded)) / len(exact)
    assert agree >= 0.95, f"mass-rule V={v}, agreement {agree}"


def test_bigram_topv_unk_mapping_keeps_order_signal(spark, tmp_path):
    """The class-LM bounded bigram still sees word order: a shuffled
    copy of an in-order doc out-surprises it under top_v too, and the
    bounded plan broadcasts the vocabulary membership join."""
    common = ("the cat sat on the mat and the dog ran to the cat " * 6).split()
    texts = [" ".join(common)] * 8
    texts.append(" ".join(common))  # in-order twin
    shuffled = list(common)
    import random

    random.Random(5).shuffle(shuffled)
    texts.append(" ".join(shuffled))  # same multiset, scrambled
    docs = pa.table(
        {
            "doc_id": list(range(len(texts))),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["t"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    )
    d = tmp_path / "ord"
    d.mkdir()
    pq.write_table(docs, str(d / "documents.parquet"))
    bdf = text.bigram_surprisal(spark, str(d), k=20, top_v=8)
    rows = {r["doc_id"]: r["surprisal"] for r in bdf.collect()}
    assert rows[len(texts) - 1] > rows[len(texts) - 2]
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        bdf.explain("formatted")
    assert "BroadcastHashJoin" in buf.getvalue()


# -- bigram surprisal --------------------------------------------------


def test_bigram_surprisal_matches_duckdb_replay(spark, duck):
    """Differential vs a DuckDB replay of the same bigram-LM math
    (lag-pair counts, context totals, mean -ln conditional p)."""
    from basenine_spark.ops.text import bigram_surprisal

    sdf = bigram_surprisal(spark, SF)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    cur = duck.execute(
        """
        WITH toks AS (
          SELECT doc_id, l AS toks FROM (
            SELECT doc_id, string_split(text, ' ') AS l
            FROM documents WHERE text IS NOT NULL
          )
        ), pairs AS (
          SELECT doc_id, toks[i.i] AS prev, toks[i.i + 1] AS cur
          FROM toks, UNNEST(range(1, len(toks))) AS i(i)
        ), big AS (
          SELECT prev, cur, count(*) AS c2 FROM pairs GROUP BY prev, cur
        ), ctx AS (
          SELECT prev, sum(c2) AS c1 FROM big GROUP BY prev
        ), scored AS (
          SELECT p.doc_id,
                 round(avg(-ln(b.c2 / CAST(x.c1 AS DOUBLE))), 4)
                   AS surprisal,
                 count(*) AS n_bigrams
          FROM pairs p
          JOIN big b ON p.prev = b.prev AND p.cur = b.cur
          JOIN ctx x ON p.prev = x.prev
          GROUP BY p.doc_id
        )
        SELECT doc_id, surprisal, n_bigrams,
               row_number() OVER (ORDER BY surprisal DESC, doc_id) AS rank
        FROM scored ORDER BY surprisal DESC, doc_id LIMIT 100
        """
    )
    dcols = [d[0] for d in cur.description]
    drows = cur.fetchall()
    assert sorted(scols) == sorted(dcols)
    assert _canon(srows, scols) == _canon(drows, dcols)


def test_bigram_surprisal_flags_shuffled_word_order(spark, tmp_path):
    """The signal unigram scoring cannot see: two docs with IDENTICAL
    token multisets — one in the corpus-common order, one shuffled —
    get the same unigram score but the shuffled one out-surprises on
    bigrams."""
    from basenine_spark.ops.text import bigram_surprisal, unigram_surprisal

    base = "the quick brown fox jumps over the lazy dog"
    shuffled = "dog the over lazy jumps fox brown the quick"
    docs = pa.table(
        {
            "doc_id": [0, 1, 2, 3, 4],
            "text": [base, base, base, base, shuffled],
            "lang": ["en"] * 5,
            "source": ["t"] * 5,
            "n_chars": [len(base)] * 4 + [len(shuffled)],
        }
    )
    d = tmp_path / "big"
    d.mkdir()
    pq.write_table(docs, str(d / "documents.parquet"))
    uni = {r["doc_id"]: r["surprisal"] for r in unigram_surprisal(spark, str(d), k=10).collect()}
    assert uni[4] == uni[0]  # unigram is blind to order
    big = bigram_surprisal(spark, str(d), k=10).collect()
    assert big[0]["doc_id"] == 4  # shuffled doc ranks first
    scores = {r["doc_id"]: r["surprisal"] for r in big}
    assert scores[4] > scores[0]
