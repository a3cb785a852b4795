"""Plan-shape assertions: the properties that make operators survive a
100 TB scale-up, checked against the actual physical plans.

VERDICT r1 item 4: every near-dup/similarity operator must be bucketed
by construction — no cartesian product anywhere in the plan.
"""

import re

import pytest

from basenine_spark.ops import dedup, relational, similarity
from basenine_spark.bfl.compiler import compile_filter
from basenine_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize(
    "builder",
    [
        lambda s: dedup.ngram_jaccard_pairs(s, SF, n=3, threshold=0.4),
        lambda s: dedup.minhash_lsh_pairs(s, SF, n=3, threshold=0.4),
        lambda s: dedup.simhash_near_pairs(s, SF),
        lambda s: similarity.ann_topk_lsh(s, SF),
        lambda s: similarity.embedding_near_dup(s, SF),
    ],
    ids=["ngram_jaccard", "minhash_lsh", "simhash", "ann_lsh", "emb_near_dup"],
)
def test_no_cartesian_product_in_pair_generators(spark, builder):
    plan = _plan(builder(spark))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_ann_topk_broadcasts_queries_not_corpus(spark):
    # brute-force ANN: the deliberate nested-loop join must broadcast
    # the (small) query side — scanning the corpus exactly once
    plan = _plan(similarity.ann_topk(spark, SF))
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_dim_joins_are_broadcast(spark):
    plan = _plan(relational.mktsegment_orders(spark, SF))
    assert "BroadcastHashJoin" in plan
    plan2 = _plan(relational.supplier_nation_rollup(spark, SF))
    assert plan2.count("BroadcastHashJoin") >= 2


def test_bfl_filter_reaches_parquet_scan(spark):
    events = load_table(spark, SF, "events")
    comp = compile_filter('event_type == "click" and value > 10', events)
    plan = _plan(events.filter(comp.predicate))
    m = re.search(r"PushedFilters: \[(.*?)\]", plan, re.S)
    assert m and "EqualTo(event_type,click)" in m.group(1), plan
    assert "GreaterThan(value,10.0)" in m.group(1)


def test_top_revenue_uses_take_ordered(spark):
    plan = _plan(relational.top_revenue_orders(spark, SF))
    assert "TakeOrderedAndProject" in plan, plan


def test_limit_collapses_to_take_ordered(spark):
    from basenine_spark.engine.db import BasenineDB

    events = load_table(spark, SF, "events")
    db = BasenineDB.from_dataframe(spark, events, id_col="event_id")
    plan = _plan(db.query("value > 10 and limit(50)"))
    assert "TakeOrderedAndProject" in plan, plan


def test_redact_typed_fast_has_no_python_stage(spark):
    # schema-static redact compiles to withField/lit projections —
    # whole-stage codegen, never a Python evaluator in the plan
    from basenine_spark.registry import SPARK_QUERIES

    plan = _plan(SPARK_QUERIES["redact_typed_fast"](spark, SF))
    for node in ("MapInPandas", "BatchEvalPython", "ArrowEvalPython"):
        assert node not in plan, plan
    # and the compilable conjunct still reaches the parquet reader
    m = re.search(r"PushedFilters: \[(.*?)\]", plan, re.S)
    assert m and "EqualTo(event_type,error)" in m.group(1), plan


def test_no_session_conf_mutation_in_loaders(spark):
    # VERDICT r2 "what's wrong" #2: loaders/query builders must not
    # flip session config (a concurrent reader could observe it)
    import inspect

    from basenine_spark.sources import tables

    src = inspect.getsource(tables)
    assert not re.search(r"\.conf\.set\(", src), "loader mutates session config"


def test_bm25_filters_explode_before_shuffle_and_takes_ordered(spark):
    from basenine_spark.ops import text

    plan = _plan(text.bm25_topk(spark, SF))
    assert "CartesianProduct" not in plan
    # top-k must be per-partition heaps, not a global sort
    assert "TakeOrderedAndProject" in plan
    # the tiny idf side is a broadcast build
    assert "BroadcastHashJoin" in plan


def test_embed_clusters_assignment_is_map_only(spark):
    from basenine_spark.ops import similarity

    plan = _plan(similarity.embed_clusters(spark, SF))
    # one assignment pass: no join, no aggregate exchange over the
    # corpus — the only wide node is the final presentation orderBy
    assert "Join" not in plan, plan
    assert "HashAggregate" not in plan, plan


def test_semantic_dedup_confines_quadratic_work_to_cluster_groups(spark):
    from basenine_spark.ops import similarity

    plan = _plan(similarity.semantic_dedup(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the per-cluster greedy stage is a grouped-pandas node keyed on
    # the cluster id
    assert "FlatMapGroupsInPandas" in plan


def test_surprisal_partial_aggregates_and_takes_ordered(spark):
    from basenine_spark.ops import text

    plan = _plan(text.unigram_surprisal(spark, SF))
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan


# -- round-6 operators ------------------------------------------------------


def test_boilerplate_pushes_notnull_and_partial_aggregates(spark):
    from basenine_spark.ops import text as text_ops

    plan = _plan(text_ops.boilerplate_ratio(spark, SF))
    # text IS NOT NULL reaches the parquet scan
    assert "PushedFilters" in plan and "IsNotNull(text)" in plan
    # the df count and per-doc rollup both partial-aggregate
    assert plan.count("HashAggregate") >= 4
    assert "CartesianProduct" not in plan


def test_datasheet_single_scan_shape(spark):
    from basenine_spark.ops import pipeline as pipe_ops

    plan = _plan(pipe_ops.corpus_datasheet(spark, SF))
    assert "IsNotNull(text)" in plan
    assert "CartesianProduct" not in plan
    # the dup flag is a window over the hash key, not a self-join
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_exact_stratified_broadcasts_quotas(spark):
    from basenine_spark.ops import sampling as samp_ops

    plan = _plan(samp_ops.exact_stratified_sample(spark, SF))
    # the |sources|-row quota table broadcasts; the corpus is ranked
    # with ONE source-keyed window
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_pack_balanced_is_rank_plus_map(spark):
    from basenine_spark.ops import pipeline as pipe_ops

    plan = _plan(pipe_ops.pack_balanced(spark, SF))
    # no join at all — the serpentine math is pure projection over the
    # global rank
    for node in ("Join", "CartesianProduct", "Generate"):
        assert node not in plan, node
