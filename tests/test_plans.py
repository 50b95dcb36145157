"""Physical-plan regression tests: the properties that make the
declared queries scale — predicate pushdown into the parquet scan,
column pruning, broadcast of dimension tables — asserted on
.explain('formatted') output so a refactor can't silently regress them."""

from __future__ import annotations

import re


from fluvio_demo_apps_rust_spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"


def _formatted(spark, name: str) -> str:
    df = REGISTRY[name].fn(spark, SF)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def test_q01_pushdown_and_pruning(spark):
    plan = _formatted(spark, "q01_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan
    # projection pruned to the 7 needed columns — no full-row scan
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m and len(m.group(1).split(",")) <= 7
    assert "l_comment" not in plan


def test_q05_star_join_broadcasts_dims(spark):
    plan = _formatted(spark, "q05_nation_volume")
    # all four dimension joins broadcast; no shuffle (sort-merge) join
    assert plan.count("BroadcastHashJoin") >= 4
    assert "SortMergeJoin" not in plan
    # the region filter is pushed into its scan
    assert "EqualTo(r_name,ASIA)" in plan


def _nodes(plan: str, name: str) -> int:
    """Count physical operators by their '(n) Name' detail headers."""
    return len(re.findall(rf"^\(\d+\) {name}\s*$", plan, re.M))


def test_llm_dedup_exact_single_shuffle(spark):
    plan = _formatted(spark, "llm_dedup_exact")
    # one hash-aggregate pair around one exchange: partial agg map-side
    assert _nodes(plan, "Exchange") == 1
    assert _nodes(plan, "HashAggregate") == 2


def test_events_window_partial_agg(spark):
    plan = _formatted(spark, "q30_events_tumbling")
    # tumbling window is a groupBy: map-side partial aggregation present
    assert _nodes(plan, "HashAggregate") >= 2
    # filter on event time pushed to scan
    assert "PushedFilters" in plan


def test_ann_lsh_no_cartesian(spark):
    plan = _formatted(spark, "llm_ann_lsh")
    # the scale path must join on the bucket key, not cross-product
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_simhash_pairs_no_cartesian(spark):
    # candidate pairs come from the 4x15-bit band equi-join, never the
    # all-pairs cross product the oracle-equivalent naive form implies
    plan = _formatted(spark, "llm_simhash_pairs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_embedding_neardup_no_cartesian(spark):
    # candidate pairs come from the banded hyperplane-signature
    # equi-join (LSH proposes, exact cosine disposes)
    plan = _formatted(spark, "llm_embedding_neardup")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q62_antijoin_filter_pushdown(spark):
    plan = _formatted(spark, "q62_idle_rich_customers")
    # NOT EXISTS → anti join, never a nested-loop; the priority filter
    # reaches the orders scan and the projection is pruned to o_custkey
    assert "CartesianProduct" not in plan
    assert "EqualTo(o_orderpriority,1-URGENT)" in plan
    m = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert "o_custkey:bigint,o_orderpriority:string" in m  # 2-col pruned scan


def test_q60_part_filter_pushdown(spark):
    plan = _formatted(spark, "q60_min_cost_supplier")
    assert "LessThanOrEqual(p_size,5)" in plan
    assert "CartesianProduct" not in plan
