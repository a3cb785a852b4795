"""Randomized differential fuzz for the hybrid-retrieval oracle pair
(`search_hybrid_rrf` vs its DuckDB SQL) and the corpus-composition
pairs: small-vocabulary pseudo-random corpora with dense gram
collisions and tie-prone embeddings, Spark plan vs the REGISTERED
oracle SQL run by DuckDB on the same parquet — the exact comparison
the driver performs, exercised across many corpora instead of one."""

import random

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

from basenine_spark.registry import ORACLES, SPARK_QUERIES

SEED = 20260814
VOCAB = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]


def _write_corpus(tmp_path, rnd, tag, n_docs):
    d = tmp_path / f"fuzz{tag}"
    d.mkdir()
    texts, srcs = [], []
    for i in range(n_docs):
        ln = rnd.randint(0, 12)
        texts.append(" ".join(rnd.choice(VOCAB) for _ in range(ln)))
        srcs.append(f"s{rnd.randint(0, 3)}")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n_docs), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * n_docs),
                "source": pa.array(srcs, pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        d / "documents.parquet",
    )
    # tie-prone embeddings: components from a tiny discrete set so
    # distinct docs collide on rounded cosine and exercise tie-breaks
    embs = [
        [float(rnd.choice((0.0, 0.5, 1.0))) for _ in range(4)]
        for _ in range(n_docs)
    ]
    # avoid all-zero vectors (cosine undefined → NULL sim on both
    # engines, but DuckDB 0/0 vs Spark 0/0 both yield NULL/NaN noise
    # that is not the subject here)
    embs = [e if any(e) else [1.0, 0.0, 0.0, 0.0] for e in embs]
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(n_docs), pa.int64()),
                "embedding": pa.array(embs, pa.list_(pa.float32())),
                "label": pa.array([0] * n_docs, pa.int32()),
            }
        ),
        d / "embeddings.parquet",
    )
    return str(d)


def _compare(spark, sf_dir, name):
    sdf = SPARK_QUERIES[name](spark, sf_dir)
    srows = [r.asDict() for r in sdf.collect()]
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    cur = con.execute(ORACLES[name])
    ocols = [d[0] for d in cur.description]
    orows = [dict(zip(ocols, r)) for r in cur.fetchall()]
    assert sorted(sdf.columns) == sorted(ocols), name
    ss = sorted(tuple(repr(r[c]) for c in sorted(sdf.columns)) for r in srows)
    oo = sorted(tuple(repr(r[c]) for c in sorted(ocols)) for r in orows)
    assert ss == oo, (
        f"{name} diverged on fuzzed corpus {sf_dir}: "
        f"{len(ss)}/{len(oo)} rows; first diff: "
        f"{next(((a, b) for a, b in zip(ss, oo) if a != b), 'row count')}"
    )


def test_hybrid_and_composition_fuzz(spark, tmp_path):
    rnd = random.Random(SEED)
    for trial in range(4):
        sf = _write_corpus(tmp_path, rnd, trial, n_docs=rnd.randint(12, 30))
        for name in (
            "search_hybrid_rrf",
            "pipeline_novelty_curve",
            "pipeline_source_overlap",
        ):
            _compare(spark, sf, name)
