"""Graph centrality over the k-NN neighborhood graph — the
"connectivity quality" signal for embedding-space curation: documents
whose neighborhoods are dense and well-connected (hubs of a semantic
cluster) score high; isolated outliers score low.

PageRank (Page et al. 1999, public) as pure keyed dataflow: one
edges-join-ranks shuffle + one dst-keyed aggregation per iteration,
with per-round ``localCheckpoint`` lineage truncation (same plan-growth
discipline as the label-propagation clustering loop — without it the
logical plan nests one join deeper per iteration). Dangling mass
(nodes with no out-edges) is redistributed uniformly each round INSIDE
the dataflow: the 1-row dangling-sum aggregate broadcast-cross-joins
onto the rank update, so an iteration is exactly one job — the two
keyed shuffles plus a scalar side-branch — with no driver-side
``collect`` anywhere in the loop body. At 1000 executors each
iteration is two keyed shuffles over the (bounded, ~k x N) edge list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import similarity
from .util import stable_round


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iters: int = 10,
) -> DataFrame:
    """PageRank over a directed edge list (src, dst). Returns
    (node, rank) for every node appearing as src or dst; ranks sum to
    1 (rounded to 6 decimals in the output so accumulation order can't
    leak into comparisons)."""
    edges = edges.select("src", "dst")
    out_deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    has_out = out_deg.select(F.col("src").alias("node"), F.lit(True).alias("out_ok"))
    # nodes tagged ONCE with whether they have out-edges — the dangling
    # indicator rides along in the rank vector so the per-iteration
    # dangling mass is a conditional aggregate, not a join
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .join(has_out, "node", "left")
        .select("node", F.coalesce("out_ok", F.lit(False)).alias("out_ok"))
    ).cache()
    n_nodes = nodes.count()
    # weighted edges: contribution fraction per out-edge
    wedges = edges.join(out_deg, "src").select(
        "src", "dst", (F.lit(1.0) / F.col("deg")).alias("w")
    ).cache()
    wedges.count()  # materialize once; reused every iteration
    ranks = nodes.select("node", "out_ok", F.lit(1.0 / n_nodes).alias("rank"))
    for _ in range(iters):
        contribs = (
            wedges.join(
                ranks.select(F.col("node").alias("src"), "rank"), "src"
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("rank") * F.col("w")).alias("contrib"))
        )
        # dangling mass stays IN the dataflow: a 1-row aggregate
        # broadcast-cross-joined onto the update, evaluated inside the
        # same job as the checkpoint — no driver action in the loop
        dangling = ranks.filter(~F.col("out_ok")).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm")
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                "out_ok",
                (
                    F.lit((1.0 - damping) / n_nodes)
                    + F.lit(damping) * F.col("dm") / n_nodes
                    + F.lit(damping) * F.coalesce(F.col("contrib"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)  # truncate per-round lineage
        )
    nodes.unpersist()
    wedges.unpersist()
    return ranks.select("node", stable_round(F.col("rank"), 6).alias("rank"))


def knn_pagerank(
    spark: SparkSession,
    sf_dir: str,
    k: int = 5,
    iters: int = 8,
    tables: int = 12,
    bits: int = 8,
) -> DataFrame:
    """Centrality of every embedding in its k-NN graph: compose
    :func:`..similarity.knn_graph` (directed top-k edges) with
    :func:`pagerank`. Output: (node, rank)."""
    edges = similarity.knn_graph(
        spark, sf_dir, k=k, tables=tables, bits=bits
    ).select("src", "dst")
    return pagerank(edges, iters=iters)
