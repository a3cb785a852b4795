"""Curation pipeline composition + embedding quantization.

End-to-end values are hash-verified by the driver oracle
(`pipeline_curate`, `pipeline_funnel`, `embedding_quantize`); these
tests pin the funnel invariants, the composed-plan shape, and the
quantization code range.
"""

from pyspark.sql import functions as F

from basenine_spark.ops import pipeline, similarity

SF = "/root/testdata/sf0.001"


def test_funnel_is_monotone(spark):
    rows = pipeline.curation_funnel(spark, SF).collect()
    assert rows, "funnel empty"
    for r in rows:
        assert r["n_in"] >= r["n_quality"] >= r["n_kept"] >= 0, r


def test_curate_consistent_with_funnel(spark):
    survivors = pipeline.curate_documents(spark, SF)
    total_kept = survivors.count()
    funnel_kept = (
        pipeline.curation_funnel(spark, SF)
        .agg(F.sum("n_kept"))
        .collect()[0][0]
    )
    assert total_kept == funnel_kept


def test_curate_survivors_pass_quality_gates(spark):
    bad = (
        pipeline.curate_documents(spark, SF)
        .filter(
            (F.col("n_tokens") < 30)
            | (F.col("n_tokens") > 1000)
            | (F.col("n_chars") < 100)
        )
        .count()
    )
    assert bad == 0


def test_curate_plan_pushes_quality_gate_to_scan(spark):
    # the composed pipeline must not defeat pushdown: the n_chars gate
    # reaches the documents Parquet scan
    plan = (
        pipeline.curate_documents(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "GreaterThanOrEqual(n_chars,100)" in plan, plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_embedding_quantize_ranges(spark):
    df = similarity.embedding_quantize(spark, SF)
    rows = df.collect()
    assert rows
    for r in rows:
        assert r["qmax"] > r["qmin"]
        assert r["norm"] > 0
        # 64 dims, codes in [0, 255]: checksum bounded, and both
        # extremes (0 and 255) exist so the sum is strictly inside
        assert 255 <= r["code_sum"] <= 255 * 63


def test_pack_sequences_bins(spark):
    rows = pipeline.pack_sequences(spark, SF, budget_tokens=512).collect()
    assert rows
    by_source = {}
    for r in rows:
        by_source.setdefault(r["source"], []).append(r)
    for source, rs in by_source.items():
        rs.sort(key=lambda r: r["doc_id"])
        # offsets are the exclusive prefix sums in doc_id order
        cum = 0
        for r in rs:
            assert r["start_offset"] == cum, (source, r)
            assert r["bin_id"] == cum // 512
            cum += r["n_tokens"]
        # bin ids are non-decreasing and start at 0
        assert rs[0]["bin_id"] == 0


def test_pack_sequences_single_shuffle(spark):
    plan = (
        pipeline.pack_sequences(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_release_manifest_composition(spark):
    """The release manifest covers exactly the mixture-sampled subset
    of curation survivors: totals reconcile and re-runs are
    bit-identical (content-stable hashes everywhere)."""
    from basenine_spark.ops import pipeline

    sf = "/root/testdata/sf0.001"
    m1 = pipeline.release_manifest(spark, sf).collect()
    m2 = pipeline.release_manifest(spark, sf).collect()
    assert sorted(map(tuple, m1)) == sorted(map(tuple, m2))
    n_released = sum(r["n_docs"] for r in m1)
    n_curated = pipeline.curate_documents(spark, sf).count()
    assert 0 < n_released <= n_curated
    assert all(0 <= r["shard_id"] < 16 for r in m1)
    assert all(r["min_doc_id"] <= r["max_doc_id"] for r in m1)


def test_curation_empty_survivor_set(spark, tmp_path):
    """Every document failing the quality gates must yield an empty —
    not erroring — funnel: the dedup/clustering stages see zero rows."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from basenine_spark.ops import pipeline as pl

    texts = ["tiny", "also tiny"]  # all below min_tokens/min_chars
    table = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * 2, pa.string()),
            "source": pa.array(["s"] * 2, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(table, str(tmp_path / "documents.parquet"))
    assert pl.curate_documents(spark, str(tmp_path)).count() == 0
    funnel = {r["source"]: r for r in pl.curation_funnel(spark, str(tmp_path)).collect()}
    assert funnel["s"]["n_in"] == 2
    assert funnel["s"]["n_quality"] == 0
    assert funnel["s"]["n_kept"] == 0
    assert pl.release_manifest(spark, str(tmp_path)).count() == 0


def test_epoch_order_reproducible_and_seed_sensitive(spark):
    """RNG-free epoch shuffle: same seed → identical order; different
    seed → a different permutation; every doc appears exactly once with
    per-shard contiguous seq starting at 1."""
    from basenine_spark.ops.pipeline import epoch_order

    sf = "/root/testdata/sf0.001"
    a = epoch_order(spark, sf, seed="epoch0").collect()
    b = epoch_order(spark, sf, seed="epoch0").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    c = epoch_order(spark, sf, seed="epoch1").collect()
    pos_a = {r["doc_id"]: (r["shard"], r["seq"]) for r in a}
    pos_c = {r["doc_id"]: (r["shard"], r["seq"]) for r in c}
    assert set(pos_a) == set(pos_c)  # same corpus
    assert pos_a != pos_c  # re-shuffled
    # per-shard seqs are 1..n contiguous
    from collections import defaultdict

    by_shard = defaultdict(list)
    for r in a:
        by_shard[r["shard"]].append(r["seq"])
    for seqs in by_shard.values():
        assert sorted(seqs) == list(range(1, len(seqs) + 1))


def test_webdataset_shards_roundtrip(spark, tmp_path):
    """Tar shard export: every synthesized media sample lands in its
    content-stable shard as a payload + JSON-metadata member pair, the
    payloads roundtrip byte-exact, members are in epoch order, and
    re-export is byte-identical (zeroed tar metadata)."""
    import hashlib
    import json
    import os
    import tarfile

    from basenine_spark.ops.multimodal import synth_media_table
    from basenine_spark.ops.pipeline import write_webdataset_shards

    sf = "/root/testdata/sf0.001"
    dest = str(tmp_path / "wds")
    stats = write_webdataset_shards(spark, sf, dest).collect()
    n_media = synth_media_table(spark, sf).count()
    assert sum(r["n_members"] for r in stats) == n_media

    payloads = {
        int(r["doc_id"]): bytes(r["payload"])
        for r in synth_media_table(spark, sf).collect()
    }
    seen = 0
    for fn in sorted(os.listdir(dest)):
        with tarfile.open(os.path.join(dest, fn)) as tf:
            names = tf.getnames()
            data_members = [n for n in names if not n.endswith(".json")]
            meta_members = [n for n in names if n.endswith(".json")]
            assert len(data_members) == len(meta_members)
            for name in data_members:
                key = int(name.split(".")[0])
                body = tf.extractfile(name).read()
                assert body == payloads[key]  # byte-exact payload
                meta = json.loads(
                    tf.extractfile(f"{name.split('.')[0]}.json").read()
                )
                assert meta["doc_id"] == key
                assert meta["n_bytes"] == len(body)
                seen += 1
    assert seen == n_media

    # reproducibility: re-export produces byte-identical tars
    def digest(d):
        out = {}
        for fn in sorted(os.listdir(d)):
            with open(os.path.join(d, fn), "rb") as f:
                out[fn] = hashlib.md5(f.read()).hexdigest()
        return out

    d1 = digest(dest)
    dest2 = str(tmp_path / "wds2")
    write_webdataset_shards(spark, sf, dest2).collect()
    assert digest(dest2) == d1


def test_webdataset_read_back_roundtrips(spark, tmp_path):
    """write → read roundtrip through the binaryFile + tarfile source:
    every sample comes back with its exact payload and metadata."""
    from basenine_spark.ops.multimodal import synth_media_table
    from basenine_spark.ops.pipeline import (
        read_webdataset_shards,
        write_webdataset_shards,
    )

    sf = "/root/testdata/sf0.001"
    dest = str(tmp_path / "wds_rt")
    write_webdataset_shards(spark, sf, dest).collect()
    back = read_webdataset_shards(spark, dest).collect()
    orig = {
        int(r["doc_id"]): (r["media_type"], bytes(r["payload"]))
        for r in synth_media_table(spark, sf).collect()
    }
    assert len(back) == len(orig)
    for r in back:
        mt, payload = orig[int(r["doc_id"])]
        assert r["media_type"] == mt
        assert bytes(r["payload"]) == payload
        assert r["n_bytes"] == len(payload)


def test_curate_lsh_path_is_consistent_with_exact(spark):
    """The one-flag 100 TB switch: LSH-curated survivors are a
    deterministic set that (a) passes the same quality/exact-dedup
    gates and (b) differs from the exact-PPJoin result only by LSH
    recall — every doc the LSH path removes is removed by the exact
    path too (candidates are verified with exact Jaccard, so LSH can
    only MISS near-dup pairs, never invent them)."""
    from basenine_spark.ops.pipeline import curate_documents

    sf = "/root/testdata/sf0.001"
    exact = {r["doc_id"] for r in curate_documents(spark, sf).collect()}
    lsh_a = {
        r["doc_id"]
        for r in curate_documents(spark, sf, near_dup="lsh").collect()
    }
    lsh_b = {
        r["doc_id"]
        for r in curate_documents(spark, sf, near_dup="lsh").collect()
    }
    assert lsh_a == lsh_b  # deterministic
    assert exact <= lsh_a  # LSH only misses pairs => keeps a superset


def test_release_delta_matches_duckdb_replay(spark):
    """The nightly-ingest delta manifest hash-matches a DuckDB replay
    of admission dedup → content-stable shard → per-shard aggregate."""
    import duckdb

    from basenine_spark.ops.pipeline import release_delta

    sf = "/root/testdata/sf0.01"
    out = sorted(tuple(r) for r in release_delta(spark, sf).collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    rows = con.execute(
        """
        WITH d AS (
          SELECT doc_id, source, text, md5(text) AS h,
                 len(string_split(text, ' '))::BIGINT AS n_tokens
          FROM documents WHERE text IS NOT NULL
        ), corpus AS (
          SELECT h FROM d WHERE doc_id % 2 = 0
        ), admitted AS (
          SELECT doc_id, source, n_tokens FROM d b
          WHERE doc_id % 2 = 1
            AND NOT EXISTS (SELECT 1 FROM corpus c WHERE c.h = b.h)
        )
        SELECT (strpos('0123456789abcdef',
                  substring(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 1))
                - 1)::BIGINT AS shard_id,
               count(*) AS n_new_docs,
               sum(n_tokens) AS new_tokens,
               count(DISTINCT source) AS n_sources
        FROM admitted GROUP BY 1 ORDER BY 1
        """
    ).fetchall()
    con.close()
    assert out == sorted((int(a), int(b), int(c), int(d)) for a, b, c, d in rows)
