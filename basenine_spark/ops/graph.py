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


def pagerank_contract(
    spark: SparkSession,
    sf_dir: str,
    k: int = 5,
    iters: int = 5,
    damping: float = 0.85,
    tol: float = 1e-9,
) -> DataFrame:
    """Driver-verified contract for :func:`knn_pagerank` (never
    driver-checked in rounds 1-11): the distributed rank vector is
    diffed against an INDEPENDENT driver-side numpy power iteration
    over the collected edge list — same damping, same dangling-mass
    redistribution, same iteration count, a different execution
    substrate entirely.

    The edge list is bounded by construction (N×k rows — the same
    bounded-collect class as the count-gated union-find fast path),
    the node universe and both vectors are one small collect each.
    Ranks are compared at the op's emitted stable_round(.,6)
    resolution with ``tol`` absorbing the distributed sum's
    accumulation-order ulps: ``n_rank_mismatch`` = 0, and the numpy
    vector's total mass must stay 1 within ``tol`` every iteration
    (``n_mass_violations`` = 0). Ballast: ``n_vecs`` (SQL-derivable;
    the graph's node count depends on the LSH bucketing and is
    asserted only to be positive)."""
    import numpy as np

    from .util import timed_phase

    with timed_phase("build"):
        edges_df = similarity.knn_graph(spark, sf_dir, k=k).select(
            "src", "dst"
        ).localCheckpoint(eager=True)

    n_vecs = similarity.load_embeddings(spark, sf_dir).count()
    if edges_df.limit(1).count() == 0:
        # degenerate input (empty graph): zero violations over zero
        # nodes, not a 1.0/0 crash — the contract row stays comparable
        return spark.createDataFrame(
            [(int(n_vecs), 0, 0)],
            "n_vecs bigint, n_mass_violations bigint,"
            " n_rank_mismatch bigint",
        )

    with timed_phase("build"):
        ranks_df = pagerank(edges_df, damping=damping, iters=iters)
        got = {r["node"]: r["rank"] for r in ranks_df.collect()}

    with timed_phase("verify"):
        edges = [(r["src"], r["dst"]) for r in edges_df.collect()]

        nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
        idx = {n: i for i, n in enumerate(nodes)}
        n = len(nodes)
        out_deg = np.zeros(n)
        for s, _ in edges:
            out_deg[idx[s]] += 1
        rank = np.full(n, 1.0 / n)
        mass_viol = 0
        for _ in range(iters):
            contrib = np.zeros(n)
            for s, d in edges:
                contrib[idx[d]] += rank[idx[s]] / out_deg[idx[s]]
            dangling = rank[out_deg == 0].sum()
            rank = (
                (1.0 - damping) / n
                + damping * dangling / n
                + damping * contrib
            )
            if abs(rank.sum() - 1.0) > tol:
                mass_viol += 1

        # compare the emitted (stable-rounded) rank against the RAW
        # numpy rank: emitted is within 0.5 ulp of the distributed raw
        # value and the two raw vectors agree within tol, so the bound
        # below cannot false-positive at a rounding-grid boundary
        # (comparing two independently-rounded values could differ by a
        # full grid step)
        scale = 1e6
        mism = 0
        for node, emitted in got.items():
            if abs(emitted - rank[idx[node]]) > 0.5 / scale + tol:
                mism += 1
        mism += len(set(nodes) - set(got))  # node sets must agree too

    return spark.createDataFrame(
        [(int(n_vecs), int(mass_viol), int(mism))],
        "n_vecs bigint, n_mass_violations bigint, n_rank_mismatch bigint",
    )
