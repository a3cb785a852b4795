"""End-to-end training-data curation pipeline: quality filter → exact
dedup → near-dup removal, composed as ONE declarative plan.

This is the composition story for the LLM-pipeline surface: the
individual operators (:mod:`.text`, :mod:`.dedup`) are useful alone,
but a pretraining corpus run chains them — and in Spark the chain stays
a single lazy plan, so Catalyst pushes the cheap quality predicates
*below* everything else: documents that fail the token/char gates are
dropped at the Parquet scan and never tokenize, hash, or shingle.

Scale shape per stage (100 TB corpus):

1. quality gate — map-only, evaluated in the scan stage;
2. exact dedup — one keyed shuffle carrying (md5, min_id), documents
   survive via a semi join on their own (hash, id), never re-shuffling
   text;
3. near-dup removal — the PPJoin pair generator + min-label clustering
   from :mod:`.dedup` (keyed joins only), applied to the already-thinned
   survivor set, then an anti join against the non-canonical members.

The driver oracle (``pipeline_curate``) replays the whole funnel in
DuckDB including the recursive-CTE transitive closure, so the composed
result — not just each stage — is hash-verified.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from . import dedup
from .util import stable_round


def curate_documents(
    spark: SparkSession,
    sf_dir: str,
    min_tokens: int = 30,
    max_tokens: int = 1000,
    min_chars: int = 100,
    n: int = 3,
    threshold: float = 0.4,
    near_dup: str = "exact",
) -> DataFrame:
    """The curated corpus: documents that pass the quality gates, are
    the canonical copy of their exact-duplicate group, and are the
    canonical member (minimum doc_id) of their near-duplicate cluster.

    ``near_dup`` picks the pair generator: ``"exact"`` (PPJoin exact
    n-gram Jaccard — the oracle-verified baseline at test scale) or
    ``"lsh"`` (MinHash-LSH banding — the documented 100 TB path, where
    recall is the only approximation). The funnel around it is
    identical, so switching the flag switches the scale story without
    touching the pipeline.

    Returns (doc_id, source, n_tokens, n_chars) per surviving doc.
    """
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.col("text"), " "))
    quality = docs.withColumn("n_tokens", n_tokens).filter(
        (F.col("n_tokens") >= min_tokens)
        & (F.col("n_tokens") <= max_tokens)
        & (F.col("n_chars") >= min_chars)
    )

    # exact dedup: keep the min doc_id per distinct text — the shuffle
    # carries (hash, min_id); the semi join brings back full rows
    hashed = quality.withColumn("content_hash", F.md5("text"))
    keepers = hashed.groupBy("content_hash").agg(
        F.min("doc_id").alias("doc_id")
    )
    # cached: read twice (cluster build + final anti join); the eager
    # label-propagation loop inside duplicate_clusters would otherwise
    # recompute the quality+dedup stages every round
    unique_docs = hashed.join(
        keepers, ["content_hash", "doc_id"], "leftsemi"
    ).drop("content_hash").cache()

    # near-dup removal: non-canonical cluster members (cluster_id is the
    # min doc_id of each connected component) are anti-joined away
    if near_dup == "lsh":
        clusters = dedup.duplicate_clusters_lsh(
            spark, sf_dir, n=n, threshold=threshold, docs=unique_docs
        )
    elif near_dup == "exact":
        clusters = dedup.duplicate_clusters(
            spark, sf_dir, n=n, threshold=threshold, docs=unique_docs
        )
    else:
        raise ValueError(f"unknown near_dup method: {near_dup!r}")
    non_canonical = clusters.filter(
        F.col("doc_id") != F.col("cluster_id")
    ).select("doc_id")
    return unique_docs.join(non_canonical, "doc_id", "left_anti").select(
        "doc_id",
        "source",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        "n_chars",
    )


def curation_funnel(
    spark: SparkSession,
    sf_dir: str,
    **kwargs,
) -> DataFrame:
    """Per-source funnel counts: documents in, after quality, after the
    full curation — the monitoring view a production pipeline alerts
    on (a stage suddenly dropping 90% of a source is a data bug)."""
    docs = load_table(spark, sf_dir, "documents")
    survivors = curate_documents(spark, sf_dir, **kwargs)
    n_tokens = F.size(F.split(F.col("text"), " "))
    min_tokens = kwargs.get("min_tokens", 30)
    max_tokens = kwargs.get("max_tokens", 1000)
    min_chars = kwargs.get("min_chars", 100)
    per_source = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_in"),
        F.sum(
            (
                (n_tokens >= min_tokens)
                & (n_tokens <= max_tokens)
                & (F.col("n_chars") >= min_chars)
            ).cast("bigint")
        ).alias("n_quality"),
    )
    kept = survivors.groupBy("source").agg(F.count(F.lit(1)).alias("n_kept"))
    return per_source.join(kept, "source", "left").select(
        "source",
        "n_in",
        "n_quality",
        F.coalesce(F.col("n_kept"), F.lit(0)).alias("n_kept"),
    )


def pack_sequences(
    spark: SparkSession,
    sf_dir: str,
    budget_tokens: int = 512,
) -> DataFrame:
    """Greedy sequential sequence packing: assign documents (in doc_id
    order, per source) to training-batch bins of ``budget_tokens``.

    ``bin_id = floor((cumulative_tokens - n_tokens) / budget)`` — the
    standard streaming-packing rule: a document goes into the bin its
    *starting* offset falls in, so bins overflow by at most one
    document (no look-ahead, deterministic, resumable from a token
    offset).

    Scale shape: one window per source partition (running sum over
    doc_id order) — a single hash shuffle on ``source``; no global
    ordering bottleneck because packing is per-source by design (mixing
    sources inside a bin is what curriculum sampling does later).
    """
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.col("text"), " ")).cast("bigint")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    with_cum = docs.select(
        "doc_id",
        "source",
        n_tokens.alias("n_tokens"),
    ).withColumn("cum_tokens", F.sum("n_tokens").over(w))
    return with_cum.select(
        "doc_id",
        "source",
        "n_tokens",
        ((F.col("cum_tokens") - F.col("n_tokens")) / budget_tokens)
        .cast("bigint")
        .alias("bin_id"),
        (F.col("cum_tokens") - F.col("n_tokens")).alias("start_offset"),
    )


def chunk_documents(
    spark: SparkSession,
    sf_dir: str,
    size: int = 64,
    stride: int = 48,
    docs: DataFrame | None = None,
) -> DataFrame:
    """Overlapping token-window chunking — the RAG/pretraining prep
    step that turns each document into fixed-size chunks with
    ``size - stride`` tokens of overlap, tail-aligned so every token is
    covered and (for documents longer than ``size``) every chunk is
    exactly ``size`` tokens.

    Chunk starts are ``1, 1+stride, …`` up to ``L - size + 1``, plus a
    final tail-aligned start at ``L - size + 1`` when the stride
    doesn't land there exactly; a document with ``L <= size`` yields a
    single chunk. Chunk identity is ``(doc_id, chunk_idx)`` — stable
    under corpus growth because it derives only from the document's own
    token count.

    Scale shape: pure map-only — the start list is a per-row
    ``sequence`` + ``posexplode`` and the chunk text a ``slice`` +
    ``array_join``, all JVM expressions in the scan stage; no shuffle,
    no Python, output size ~``L/stride`` rows per document.
    """
    if size <= 0 or stride <= 0 or stride > size:
        raise ValueError("need 0 < stride <= size")
    if docs is None:
        docs = load_table(spark, sf_dir, "documents")
    toks = docs.filter(F.col("text").isNotNull()).select(
        "doc_id", F.split(F.col("text"), " ").alias("toks")
    )
    m = F.greatest(F.lit(1), F.size("toks") - size + 1)
    base = F.sequence(F.lit(1), m, F.lit(stride))
    starts = F.when(
        F.element_at(base, -1) != m, F.concat(base, F.array(m))
    ).otherwise(base)
    return (
        toks.select(
            "doc_id",
            "toks",
            F.posexplode(starts).alias("chunk_idx", "chunk_start"),
        )
        .select(
            "doc_id",
            F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
            F.col("chunk_start").cast("bigint").alias("chunk_start"),
            F.least(
                F.lit(size), F.size("toks") - F.col("chunk_start") + 1
            )
            .cast("bigint")
            .alias("chunk_tokens"),
            F.array_join(
                F.slice(F.col("toks"), F.col("chunk_start"), F.lit(size)),
                " ",
            ).alias("chunk_text"),
        )
    )


def shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 16-way shard assignment for training-data export,
    summarized as a per-shard manifest (the sidecar file a dataset
    release ships so a trainer can plan reads without listing objects).

    Shard identity is content-stable — the first hex nibble of
    ``md5('shard:' || doc_id)`` — so re-runs, retries, and other
    engines assign identically (same contract as
    :mod:`basenine_spark.ops.sampling`), and adding documents never
    moves existing ones between shards.  At 100 TB the assignment is a
    map-only expression evaluated in the scan stage; the manifest
    aggregation is one keyed shuffle carrying 16 groups of partial
    (count, sum, min, max) state.  The actual export is
    ``df.write.partitionBy('shard_id')`` over the same expression.
    """
    docs = load_table(spark, sf_dir, "documents")
    shard = F.expr(
        "instr('0123456789abcdef',"
        " substring(md5(concat('shard:', cast(doc_id as string))), 1, 1)) - 1"
    ).cast("bigint")
    n_tokens = F.size(F.split(F.col("text"), " ")).cast("bigint")
    return (
        docs.select(
            shard.alias("shard_id"),
            F.col("doc_id"),
            n_tokens.alias("n_tokens"),
            F.col("source"),
        )
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
            F.countDistinct("source").alias("n_sources"),
        )
        .orderBy("shard_id")
    )


def release_manifest(
    spark: SparkSession,
    sf_dir: str,
    weights: dict[str, float] | None = None,
    default_weight: float = 0.03125,
    budget: int = 200,
    salt: str = "rel",
    near_dup: str = "exact",
) -> DataFrame:
    """The full dataset-release funnel as ONE declarative plan:
    curate (quality → exact dedup → near-dup removal) → mixture-sample
    the survivors to target source weights → summarize the release as a
    per-shard export manifest.

    This is the end-to-end composition a training-data release actually
    runs, and the whole chain stays lazy: the quality gates are pushed
    to the documents scan, the mixture thresholds derive from *curated*
    per-source counts (a source that lost mass to dedup clamps toward
    keep-all rather than silently under-delivering), and the shard
    assignment is the same content-stable hash as
    :func:`shard_manifest` — append-stable across releases.

    The driver oracle replays the entire funnel in DuckDB, including
    the recursive-CTE near-dup closure, the mixture thresholds, and the
    shard grouping — the composed result is hash-verified end-to-end.
    """
    from .sampling import mixture_filter

    survivors = curate_documents(spark, sf_dir, near_dup=near_dup)
    sampled = mixture_filter(
        survivors, weights, default_weight, budget, salt
    )
    shard = F.expr(
        "instr('0123456789abcdef',"
        " substring(md5(concat('shard:', cast(doc_id as string))), 1, 1)) - 1"
    ).cast("bigint")
    return (
        sampled.select(
            shard.alias("shard_id"), "doc_id", "n_tokens"
        )
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .orderBy("shard_id")
    )


def write_training_shards(
    spark: SparkSession, sf_dir: str, dest: str
) -> str:
    """Materialize the shard layout :func:`shard_manifest` plans:
    documents written as ``shard_id``-partitioned Parquet using the
    same content-stable assignment expression, so the manifest and the
    physical layout can never disagree.  A trainer reads
    ``dest/shard_id=N`` directories directly (partition pruning), and
    because assignment is append-stable, an incremental release only
    rewrites shards that actually received documents.
    """
    docs = load_table(spark, sf_dir, "documents")
    shard = F.expr(
        "instr('0123456789abcdef',"
        " substring(md5(concat('shard:', cast(doc_id as string))), 1, 1)) - 1"
    ).cast("bigint")
    (
        docs.withColumn("shard_id", shard)
        .repartition(F.col("shard_id"))
        .write.partitionBy("shard_id")
        .mode("overwrite")
        .parquet(dest)
    )
    return dest


def epoch_order(
    spark: SparkSession,
    sf_dir: str,
    seed: str = "epoch0",
    shards: int = 16,
) -> DataFrame:
    """Deterministic epoch ordering: the RNG-free "shuffle" a dataset
    release publishes so every trainer reads the documents in the same
    pseudo-random order for a given epoch seed, with no shared state
    and no actual random source.

    Each document's epoch position derives from a content-stable hash
    of ``seed || doc_id``: shard = hash mod ``shards`` (which training
    worker reads it), ``seq`` = the document's rank inside its shard
    under the same hash (the read order).  Changing ``seed`` re-shuffles
    globally; re-running with the same seed reproduces the epoch
    bit-for-bit — on this engine, on DuckDB, anywhere md5 exists.

    Scale shape: the hash is a map-only expression in the scan stage;
    the only shuffle is the shard-keyed exchange for the per-shard
    rank, and each task sorts just its own shard's slice (corpus/shards
    rows) — no global sort anywhere.  ``shards`` must divide 16 (shard
    identity is a hex-nibble slice of the hash, so the same expression
    is one substring in ANSI SQL — no base conversion anywhere).
    """
    from pyspark.sql import Window

    if 16 % shards != 0:
        raise ValueError("shards must divide 16 (hex-nibble sharding)")
    docs = load_table(spark, sf_dir, "documents")
    h = F.md5(F.concat(F.lit(seed + ":"), F.col("doc_id").cast("string")))
    nibble = (
        F.instr(F.lit("0123456789abcdef"), F.substring(F.col("h"), 1, 1)) - 1
    ).cast("bigint")
    w = Window.partitionBy("shard").orderBy(
        F.col("h").asc(), F.col("doc_id").asc()
    )
    return (
        docs.select("doc_id", h.alias("h"))
        .withColumn("shard", F.pmod(nibble, F.lit(shards)))
        .withColumn("seq", F.row_number().over(w).cast("bigint"))
        .select("doc_id", "shard", "seq")
    )


def write_webdataset_shards(
    spark: SparkSession,
    sf_dir: str,
    dest: str,
    shards: int = 16,
) -> DataFrame:
    """WebDataset-style tar shard export for multimodal payloads: the
    sequential-read container format multimodal training loaders
    consume (one ``.tar`` per shard; each sample is a pair of members
    ``{key}.{ext}`` + ``{key}.json`` metadata, keys in epoch order).

    Spark-first shape: shard assignment reuses the content-stable
    hex-nibble expression (`shard_manifest` — manifest and physical
    layout can never disagree), rows are ``repartition(shard)``-ed and
    sorted within partitions by the epoch hash, and each executor task
    streams ITS shard's members into ``dest/shard-NNNN.tar`` with the
    stdlib ``tarfile`` over ``mapInPandas`` — payload bytes never visit
    the driver, one tar per task, no shuffle beyond the shard exchange.
    Tar metadata (mtime/uid) is zeroed so re-runs are byte-identical.

    Returns the (shard, n_members, n_bytes) accounting DataFrame (the
    written manifest rows, one per non-empty shard).
    """
    import json as _json
    from typing import Iterator as _It

    from .multimodal import synth_media_table

    media = synth_media_table(spark, sf_dir)
    h = F.md5(F.concat(F.lit("epoch0:"), F.col("doc_id").cast("string")))
    nib = (
        F.instr(F.lit("0123456789abcdef"), F.substring(h, 1, 1)) - 1
    ).cast("int")
    shard = F.pmod(nib, F.lit(shards))
    rows = (
        media.withColumn("shard", shard)
        .withColumn("h", h)
        .repartition(shards, "shard")
        .sortWithinPartitions("shard", "h", "doc_id")
    )
    schema = "shard int, n_members bigint, n_bytes bigint"

    def write_tars(batches: _It) -> _It:
        import os
        import tarfile
        import time as _time

        import pandas as pd

        EXT = {"audio/wav": "wav", "image/bmp": "bmp", "text/plain": "txt"}
        tars: dict[int, tarfile.TarFile] = {}
        counts: dict[int, list[int]] = {}
        os.makedirs(dest, exist_ok=True)

        def tar_for(s: int) -> tarfile.TarFile:
            if s not in tars:
                tars[s] = tarfile.open(
                    os.path.join(dest, f"shard-{s:04d}.tar"), "w"
                )
                counts[s] = [0, 0]
            return tars[s]

        def add(tf, name: str, data: bytes) -> int:
            info = tarfile.TarInfo(name)
            info.size = len(data)
            info.mtime = 0  # reproducible bytes
            import io

            tf.addfile(info, io.BytesIO(data))
            return len(data)

        for pdf in batches:
            for _, r in pdf.iterrows():
                s = int(r["shard"])
                tf = tar_for(s)
                key = f"{int(r['doc_id']):012d}"
                payload = bytes(r["payload"])
                ext = EXT.get(r["media_type"], "bin")
                n = add(tf, f"{key}.{ext}", payload)
                meta = _json.dumps(
                    {
                        "doc_id": int(r["doc_id"]),
                        "media_type": r["media_type"],
                        "n_bytes": len(payload),
                    },
                    separators=(",", ":"),
                ).encode()
                n += add(tf, f"{key}.json", meta)
                counts[s][0] += 1
                counts[s][1] += n
        for tf in tars.values():
            tf.close()
        if counts:
            yield pd.DataFrame(
                [(s, c[0], c[1]) for s, c in sorted(counts.items())],
                columns=["shard", "n_members", "n_bytes"],
            )

    return rows.select(
        "shard", "doc_id", "media_type", "payload"
    ).mapInPandas(write_tars, schema=schema)


def read_webdataset_shards(spark: SparkSession, src: str) -> DataFrame:
    """WebDataset tar source: read the shard directory
    :func:`write_webdataset_shards` produces (or any WebDataset-style
    layout of ``{key}.{ext}`` + ``{key}.json`` member pairs) back into
    (doc_id, media_type, n_bytes, payload) rows.

    Spark-first shape: the tar files arrive via the built-in
    ``binaryFile`` source (one row per shard file, split across
    executors by Spark's file scheduler), and each task untars ITS
    shards with the stdlib ``tarfile`` inside ``mapInPandas`` — member
    bytes never visit the driver, and a 10k-shard corpus parallelizes
    across however many executors scan it.  Sequential tar reads are
    the point of the format: one open stream per shard, no seeks.
    """
    import json as _json
    from typing import Iterator as _It

    schema = (
        "doc_id bigint, media_type string, n_bytes bigint, payload binary"
    )

    def untar(batches: _It) -> _It:
        import io
        import tarfile

        import pandas as pd

        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                with tarfile.open(
                    fileobj=io.BytesIO(bytes(content))
                ) as tf:
                    metas: dict[str, dict] = {}
                    datas: dict[str, tuple] = {}
                    for member in tf.getmembers():
                        stem, ext = member.name.rsplit(".", 1)
                        body = tf.extractfile(member).read()
                        if ext == "json":
                            metas[stem] = _json.loads(body)
                        else:
                            datas[stem] = body
                    for stem, body in datas.items():
                        meta = metas.get(stem, {})
                        rows.append(
                            (
                                int(meta.get("doc_id", int(stem))),
                                meta.get("media_type", "application/octet-stream"),
                                len(body),
                                body,
                            )
                        )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "media_type", "n_bytes", "payload"],
            )

    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.tar")
        .load(src)
        .select("content")
        .mapInPandas(untar, schema=schema)
    )


def pack_balanced(
    spark: SparkSession, sf_dir: str, n_bins: int = 16
) -> DataFrame:
    """Token-balanced packing into a FIXED number of bins — the
    distributed-training shard layout where every worker should chew
    the same token mass (a skewed shard is a straggler every epoch).
    Classic LPT-family heuristic, made order-deterministic: rank
    documents by token count DESCENDING (ties by doc_id) and deal them
    serpentine (boustrophedon) — round r left-to-right, round r+1
    right-to-left — so each bin receives one doc per round and the
    big-doc rounds alternate which bins get the larger ends.  All
    integer arithmetic on the global rank: ``round = (rank-1) div n``,
    ``pos = (rank-1) mod n``, ``bin = pos`` on even rounds else
    ``n-1-pos`` — bit-identical on any engine.

    Versus :func:`pack_sequences` (sequential token-budget bins, bin
    COUNT grows with the corpus): here the bin count is fixed and the
    OBJECTIVE is balance.  The global rank is one
    ``row_number`` over (n_tokens, doc_id) — a full-corpus window, so
    at 100 TB the rank comes from the same distributed two-pass
    range-partition construction as ``equi_depth_histogram`` (the
    assignment math is rank-only, so the substitution is mechanical);
    at registry scale the single window is the oracle baseline.

    Output: (doc_id, n_tokens, rank, bin_id), bin_id in [0, n_bins).
    """
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    sized = docs.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_tokens"),
    )
    w = Window.orderBy(F.col("n_tokens").desc(), F.col("doc_id").asc())
    ranked = sized.withColumn("rank", F.row_number().over(w).cast("bigint"))
    r0 = F.col("rank") - 1
    rnd = (r0 / n_bins).cast("bigint")
    pos = r0 % n_bins
    bin_id = F.when(rnd % 2 == 0, pos).otherwise(n_bins - 1 - pos)
    return ranked.select(
        "doc_id", "n_tokens", "rank", bin_id.cast("int").alias("bin_id")
    )


def corpus_datasheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus datasheet — the "datasheets for datasets"
    summary a release ships with: document / token / character volume,
    language spread, and the exact-duplicate footprint (documents whose
    content hash appears more than once ANYWHERE in the corpus, so
    cross-source mirror pollution is visible in every source it
    touches, not just the one holding the canonical copy).

    Plan: one map-only pass derives (source, lang, tokens, chars,
    md5); the duplicate flag is a hash-keyed partial-agg + window (the
    exact_dedup shuffle shape); the rollup is one source-keyed agg.
    Every stage partial-aggregates, nothing driver-side.

    Output: (source, n_docs, n_tokens, n_chars, n_langs, n_dup_docs,
    dup_ratio) — one row per source, ratio rounded to 6.
    """
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    base = docs.select(
        "doc_id",
        "source",
        "lang",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_toks"),
        F.col("n_chars").cast("bigint").alias("n_chars"),
        F.md5("text").alias("h"),
    )
    flagged = base.withColumn(
        "dup", F.count(F.lit(1)).over(Window.partitionBy("h")) > 1
    )
    return (
        flagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").alias("n_tokens"),
            F.sum("n_chars").alias("n_chars"),
            F.count_distinct("lang").alias("n_langs"),
            F.sum(F.when(F.col("dup"), 1).otherwise(0)).alias("n_dup_docs"),
        )
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "n_chars",
            "n_langs",
            "n_dup_docs",
            stable_round(
                F.col("n_dup_docs") / F.col("n_docs").cast("double"), 6
            ).alias("dup_ratio"),
        )
    )


def release_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental release manifest: the per-shard delta a nightly
    ingest publishes — which shards received how many genuinely-new
    documents (and token mass), so consumers refresh only the shards
    that changed instead of re-reading the release.

    Composition: admission dedup (:func:`~basenine_spark.ops.dedup.
    incremental_new_docs` — content-hash anti join against the corpus)
    → the SAME content-stable shard expression as
    :func:`shard_manifest` (append-stable: existing documents never
    move, so a delta is purely additive) → a 16-group aggregate.  The
    whole chain is one lazy plan; at 100 TB the only wide stages are
    the hash-keyed anti join and the 16-group manifest aggregate.
    """
    admitted = dedup.incremental_new_docs(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_tokens"),
    )
    shard = F.expr(
        "instr('0123456789abcdef',"
        " substring(md5(concat('shard:', cast(doc_id as string))), 1, 1)) - 1"
    ).cast("bigint")
    return (
        admitted.join(docs, "doc_id")
        .select(shard.alias("shard_id"), "doc_id", "n_tokens", "source")
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_new_docs"),
            F.sum("n_tokens").alias("new_tokens"),
            F.count_distinct("source").alias("n_sources"),
        )
        .orderBy("shard_id")
    )


def release_balanced(
    spark: SparkSession,
    sf_dir: str,
    cap: int = 15,
    n: int = 8,
    salt: str = "cap",
) -> DataFrame:
    """Balanced-release composition: per-source domain cap →
    duplicated-substring scrub (on the capped survivor set) →
    content-stable train/val/test split → per-(split, source) manifest.
    The publication a domain-balanced, substring-deduped dataset ships,
    chained as ONE lazy plan so Catalyst shares the scan and pushes the
    cap's semi join below the (expensive) gram stages — only survivors
    ever tokenize or hash.

    Manifest columns: split, source, n_docs, n_tokens (whitespace
    tokens of the SCRUBBED text), removed_tokens. Every stage is the
    already-verified operator (`sample_source_cap`,
    `dedup_scrub_spans`, `sample_splits`); the pytest oracle replays
    the whole composition in DuckDB, so the composed result — not just
    each stage — is differentially pinned.
    """
    from .dedup import scrub_duplicate_spans
    from .sampling import source_cap, split_assign

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    capped = source_cap(spark, sf_dir, cap=cap, salt=salt, docs=docs).select(
        "doc_id", "source"
    )
    survivors = docs.join(capped.select("doc_id"), "doc_id", "left_semi")
    scrubbed = scrub_duplicate_spans(spark, sf_dir, n=n, docs=survivors)
    splits = split_assign(spark, sf_dir).select("doc_id", "split")
    clean_tokens = F.size(
        F.filter(F.split(F.col("clean_text"), " "), lambda w: w != "")
    ).cast("bigint")
    return (
        scrubbed.join(capped, "doc_id")
        .join(splits, "doc_id")
        .groupBy("split", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(clean_tokens).alias("n_tokens"),
            F.sum("removed_tokens").alias("removed_tokens"),
        )
        .orderBy("split", "source")
    )


def curriculum_order(
    spark: SparkSession,
    sf_dir: str,
    stages: int = 4,
    seed: str = "cur0",
) -> DataFrame:
    """Curriculum schedule: partition the corpus into quality stages
    (easy → hard by stopword-ratio quartile — higher stop_ratio ≈
    simpler prose first) and give every document a deterministic
    position inside its stage via the seeded content hash — the
    reproducible "which documents does the trainer see in phase s"
    schedule, an epoch ordering (:func:`epoch_order`) stratified by a
    difficulty signal.

    Stage assignment is an ``ntile`` over the (score, doc_id) order —
    NOTE: an unpartitioned ntile plans a single-partition sort (the
    exact-quartile reference semantics; at crawl scale swap the stage
    boundary for an ``approx_value_quantiles`` threshold, keeping the
    map-only bucket comparison). The within-stage rank is a
    stage-keyed window over the seeded hash. RNG-free end to end: same
    corpus + seed ⇒ identical schedule on any engine.

    Output: (doc_id, stage 1..stages, seq 1.. within stage).
    """
    from pyspark.sql import Window

    from .text import quality_score

    q = quality_score(spark, sf_dir).filter(F.col("n_tokens") > 0)
    w_stage = Window.orderBy(
        F.col("stop_ratio").desc(), F.col("doc_id").asc()
    )
    h = F.md5(F.concat(F.lit(seed + ":"), F.col("doc_id").cast("string")))
    staged = q.select(
        "doc_id",
        F.ntile(stages).over(w_stage).alias("stage"),
        h.alias("h"),
    )
    w_seq = Window.partitionBy("stage").orderBy(
        F.col("h").asc(), F.col("doc_id").asc()
    )
    return staged.select(
        "doc_id",
        "stage",
        F.row_number().over(w_seq).cast("bigint").alias("seq"),
    )


# -- corpus composition: novelty curve + source overlap ---------------------


def _source_grams(spark: SparkSession, sf_dir: str, n: int) -> DataFrame:
    """(source, gram64) distinct pairs — the per-source n-gram sets the
    composition analytics below share.  Grams are 64-bit hashed
    (:func:`..dedup.hashed_shingle_sets`), so the shuffle carries 8-byte
    longs; counts agree with the string-gram DuckDB oracles modulo
    negligible collisions (same argument as dedup_ngram_jaccard)."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    hsets = dedup.hashed_shingle_sets(docs.select("doc_id", "text"), n)
    return (
        hsets.join(docs.select("doc_id", "source"), "doc_id")
        .select("source", F.explode("shingles").alias("gram"))
        .distinct()
    )


def source_novelty_curve(
    spark: SparkSession, sf_dir: str, n: int = 3
) -> DataFrame:
    """Greedy marginal n-gram coverage per source — the corpus-selection
    signal behind facility-location/coverage-based data curation: walk
    sources in lexicographic order and credit each gram to its FIRST
    holder, so ``novel_grams`` is exactly the new gram mass source *s*
    adds on top of every earlier source and ``novelty_ratio`` is the
    fraction of *s*'s gram set nobody before it contributed.  A source
    whose ratio ~0 is redundant with the corpus prefix; a high ratio
    marks distributional novelty worth up-weighting.

    Scale shape: one (source, gram64) distinct shuffle over the corpus,
    then two bounded aggregates (per-gram min-source, per-source
    counts) and an |S|-row join — no pairwise blowup at any corpus
    size.

    Output: (source, total_grams, novel_grams, novelty_ratio).
    """
    g = _source_grams(spark, sf_dir, n)
    totals = g.groupBy("source").agg(F.count(F.lit(1)).alias("total_grams"))
    novel = (
        g.groupBy("gram")
        .agg(F.min("source").alias("source"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("novel_grams"))
    )
    return (
        totals.join(novel, "source", "left")
        .select(
            "source",
            "total_grams",
            F.coalesce(F.col("novel_grams"), F.lit(0)).alias("novel_grams"),
            stable_round(
                F.coalesce(F.col("novel_grams"), F.lit(0)).cast("double")
                / F.col("total_grams").cast("double"),
                6,
            ).alias("novelty_ratio"),
        )
    )


def source_overlap_matrix(
    spark: SparkSession,
    sf_dir: str,
    n: int = 3,
    max_holders: int | None = None,
) -> DataFrame:
    """Pairwise n-gram Jaccard between sources — the corpus-composition
    heatmap (which crawl snapshots / dumps overlap, where a new source
    is mostly re-scraped mass).  Exact: ``|A∩B|`` is counted by joining
    the per-source gram postings on the gram key, never by comparing
    documents pairwise.

    Scale: a gram held by *h* sources emits ``h·(h-1)/2`` pair rows, so
    corpus-universal grams dominate the shuffle when |S| is large.
    ``max_holders`` drops grams held by more than that many sources
    before pairing — such grams carry no discriminative signal (they
    raise every pair's intersection equally) and the cap bounds the
    fanout at ``max_holders²`` per gram.  The default (None) is the
    exact form the DuckDB oracle mirrors; a crawl-scale run with
    thousands of sources sets the cap.

    Output: (source_a, source_b, inter, jaccard) for a < b with
    inter > 0.
    """
    g = _source_grams(spark, sf_dir, n)
    if max_holders is not None:
        holders = g.groupBy("gram").agg(F.count(F.lit(1)).alias("h"))
        g = (
            g.join(holders.filter(F.col("h") <= max_holders), "gram")
            .drop("h")
        )
    sz = g.groupBy("source").agg(F.count(F.lit(1)).alias("sz"))
    a = g.select(F.col("source").alias("source_a"), "gram")
    b = g.select(F.col("source").alias("source_b"), "gram")
    inter = (
        a.join(b, "gram")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sz_a = sz.select(F.col("source").alias("source_a"), F.col("sz").alias("sz_a"))
    sz_b = sz.select(F.col("source").alias("source_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(F.broadcast(sz_a), "source_a")
        .join(F.broadcast(sz_b), "source_b")
        .select(
            "source_a",
            "source_b",
            "inter",
            stable_round(
                F.col("inter").cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast("double"),
                6,
            ).alias("jaccard"),
        )
    )


def loso_ablation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-source-out corpus ablation: for every source, the
    composition statistics the corpus would have WITHOUT that source —
    the standard first question of a data-ablation study ("what does
    dropping this crawl do to the mix?") answered for all sources at
    once.

    Output (one row per source): ``n_docs_excl`` / ``n_tokens_excl``
    / ``n_chars_excl`` (corpus size without the source),
    ``avg_chars_excl`` (mean document length without it; NULL when the
    source IS the whole corpus), and ``n_langs_excl`` (how many
    languages survive its removal).

    Scale design: one scan aggregates to a per-(source, lang) rollup;
    per-source stats, corpus totals, and language totals are all
    re-aggregations of that rollup (bounded: |sources| × |langs|).
    The totals are a 1-row broadcast; nothing rescans the documents.
    A language survives source ``s``'s removal iff its total doc count
    exceeds its count inside ``s`` — computed from the same rollup, so
    the answer is exact even for languages entirely absent from ``s``.
    NULL source/lang are coalesced to ``'(null)'`` sentinels before
    grouping (join keys must never be NULL — r6 nulls-fuzz class).
    """
    docs = load_table(spark, sf_dir, "documents").select(
        F.coalesce(F.col("source"), F.lit("(null)")).alias("source"),
        F.coalesce(F.col("lang"), F.lit("(null)")).alias("lang"),
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_tok"),
        F.col("n_chars").cast("bigint").alias("n_chars"),
    )
    sl = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("n_toks"),
        F.sum("n_chars").alias("n_chars"),
    )
    # the rollup feeds five branches (per-source, totals, per-lang,
    # killed-langs, lang count); without a materialization boundary
    # each branch re-tokenizes the full corpus (5 scans in the
    # physical plan). The rollup is bounded (|sources| x |langs|), so
    # pin it once — documents is then read exactly once.
    sl = sl.localCheckpoint(eager=False)
    per_source = sl.groupBy("source").agg(
        F.sum("n_docs").alias("s_docs"),
        F.sum("n_toks").alias("s_toks"),
        F.sum("n_chars").alias("s_chars"),
    )
    totals = sl.agg(
        F.sum("n_docs").alias("t_docs"),
        F.sum("n_toks").alias("t_toks"),
        F.sum("n_chars").alias("t_chars"),
    )
    lang_tot = sl.groupBy("lang").agg(F.sum("n_docs").alias("l_docs"))
    # languages source s would kill: lang entirely inside s
    killed = (
        sl.join(F.broadcast(lang_tot), "lang")
        .filter(F.col("n_docs") == F.col("l_docs"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_killed"))
    )
    n_langs = lang_tot.agg(F.count(F.lit(1)).alias("t_langs"))
    return (
        per_source.crossJoin(F.broadcast(totals))
        .crossJoin(F.broadcast(n_langs))
        .join(F.broadcast(killed), "source", "left")
        .select(
            "source",
            (F.col("t_docs") - F.col("s_docs")).cast("bigint").alias("n_docs_excl"),
            (F.col("t_toks") - F.col("s_toks")).cast("bigint").alias("n_tokens_excl"),
            (F.col("t_chars") - F.col("s_chars")).cast("bigint").alias("n_chars_excl"),
            stable_round(
                F.try_divide(
                    (F.col("t_chars") - F.col("s_chars")).cast("double"),
                    (F.col("t_docs") - F.col("s_docs")).cast("double"),
                ),
                6,
            ).alias("avg_chars_excl"),
            (
                F.col("t_langs") - F.coalesce(F.col("n_killed"), F.lit(0))
            ).cast("bigint").alias("n_langs_excl"),
        )
        .orderBy("source")
    )
