"""NFKC normalization (confusable-duplicate goldens) and the dedup
threshold operating curve (consistency with the verified pair
generator, monotonicity)."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from basenine_spark.ops import dedup, text

SF = "/root/testdata/sf0.001"


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
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        d / "documents.parquet",
    )
    return str(d)


def test_nfkc_collapses_confusables(spark, tmp_path):
    texts = [
        "Hello file world",          # canonical
        "Ｈｅｌｌｏ ﬁle world",       # full-width + ligature + case
        "Héllo file world",    # combining accent -> DIFFERENT
        "hello FILE world",          # casefold twin
    ]
    sf = _write_docs(tmp_path, texts)
    rows = {
        r["doc_id"]: r["dup_cnt"]
        for r in text.normalized_dedup(spark, sf).collect()
    }
    # 0, 1, 3 collapse (NFKC+casefold); the accented doc stays distinct
    assert rows == {0: 3, 2: 1}


def test_nfkc_null_passthrough_and_idempotence(spark, tmp_path):
    sf = _write_docs(tmp_path, ["ﬁle ①②③"])
    df = text.normalize_nfkc(
        spark.read.parquet(f"{sf}/documents.parquet")
    )
    once = df.select("text_norm").collect()[0][0]
    assert once == "file 123"
    twice = text.normalize_nfkc(
        df.select(F.col("text_norm").alias("text"))
    ).collect()[0]["text_norm"]
    assert twice == once


def test_operating_curve_consistent_with_pair_generator(spark):
    curve = {
        r["threshold"]: (r["n_pairs"], r["n_docs_in_pairs"])
        for r in dedup.dedup_operating_curve(
            spark, SF, grid=(0.4, 0.6, 0.8)
        ).collect()
    }
    for t in (0.4, 0.6, 0.8):
        pairs = dedup.ngram_jaccard_pairs(spark, SF, threshold=0.4).filter(
            F.col("jaccard") >= t
        )
        rows = pairs.collect()
        docs = {r["doc_a"] for r in rows} | {r["doc_b"] for r in rows}
        assert curve[t] == (len(rows), len(docs)), f"t={t}"


def test_operating_curve_monotone(spark):
    rows = sorted(
        dedup.dedup_operating_curve(spark, SF).collect(),
        key=lambda r: r["threshold"],
    )
    assert rows[0]["n_pairs"] > 0
    for a, b in zip(rows, rows[1:]):
        assert a["n_pairs"] >= b["n_pairs"]
        assert a["n_docs_in_pairs"] >= b["n_docs_in_pairs"]


def test_operating_curve_grid_below_tmin_rejected(spark):
    with pytest.raises(ValueError):
        dedup.dedup_operating_curve(spark, SF, t_min=0.5, grid=(0.4,))
