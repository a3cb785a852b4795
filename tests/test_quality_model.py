"""Weak-label quality classifier: held-out separation on a planted
two-vocabulary corpus, sane probabilities and coverage on the sf
corpus."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from basenine_spark.ops import quality_model

SF = "/root/testdata/sf0.001"


def _write_docs(tmp_path, rows):
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "lang": pa.array(["en"] * len(rows)),
                "source": pa.array([r[2] for r in rows], pa.string()),
                "n_chars": pa.array(
                    [len(r[1]) if r[1] else 0 for r in rows], pa.int64()
                ),
            }
        ),
        d / "documents.parquet",
    )
    return str(d)


def _auc(pos_scores, neg_scores):
    wins = ties = 0
    for p in pos_scores:
        for n in neg_scores:
            if p > n:
                wins += 1
            elif p == n:
                ties += 1
    total = len(pos_scores) * len(neg_scores)
    return (wins + 0.5 * ties) / total


def test_separates_planted_vocabularies(spark, tmp_path):
    # two disjoint vocabularies; the "wiki" slice and unlabeled docs
    # drawn from the good vocab must outscore the bad-vocab docs
    good_vocab = [f"good{i}" for i in range(40)]
    bad_vocab = [f"bad{i}" for i in range(40)]

    def doc(vocab, seed, n=30):
        return " ".join(vocab[(seed * 7 + j * 3) % len(vocab)] for j in range(n))

    rows = []
    did = 0
    for i in range(30):  # reference slice (positives)
        rows.append((did, doc(good_vocab, i), "wiki"))
        did += 1
    for i in range(30):  # unlabeled good docs (held out from training pos)
        rows.append((did, doc(good_vocab, 100 + i), "webA"))
        did += 1
    for i in range(60):  # bad docs (some sampled as negatives)
        rows.append((did, doc(bad_vocab, i), "webB"))
        did += 1
    sf = _write_docs(tmp_path, rows)
    scored = {
        r["doc_id"]: r["quality_prob"]
        for r in quality_model.quality_model_scores(
            spark, sf, reference_source="wiki"
        ).collect()
    }
    held_out_good = [scored[d] for d in range(30, 60)]
    bad = [scored[d] for d in range(60, 120)]
    auc = _auc(held_out_good, bad)
    assert auc >= 0.9, f"held-out AUC {auc:.3f} < 0.9"


def test_sf_corpus_coverage_and_range(spark):
    rows = quality_model.quality_model_scores(spark, SF).collect()
    import duckdb

    con = duckdb.connect()
    (n_docs,) = con.execute(
        f"SELECT count(*) FROM '{SF}/documents.parquet' "
        "WHERE text IS NOT NULL"
    ).fetchone()
    con.close()
    assert len(rows) == n_docs
    for r in rows:
        assert 0.0 <= r["quality_prob"] <= 1.0


def test_reference_slice_scores_high_on_itself(spark, tmp_path):
    # sanity: with cleanly separable data the reference slice's own
    # mean probability is near 1
    good = [f"g{i}" for i in range(20)]
    bad = [f"b{i}" for i in range(20)]
    rows = [(i, " ".join(good), "wiki") for i in range(20)]
    rows += [(20 + i, " ".join(bad), "web") for i in range(40)]
    sf = _write_docs(tmp_path, rows)
    scored = quality_model.quality_model_scores(
        spark, sf, reference_source="wiki"
    ).collect()
    wiki = [r["quality_prob"] for r in scored if r["source"] == "wiki"]
    web = [r["quality_prob"] for r in scored if r["source"] == "web"]
    assert min(wiki) > max(web)
