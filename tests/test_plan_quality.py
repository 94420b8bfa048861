"""Physical-plan quality gates (SURVEY.md §4): the optimizations that
matter at 100 TB must be visible in the executed plan, not assumed.

- filters reach the parquet scan (PushedFilters)
- scans are column-pruned to what the query projects
- small dimensions broadcast (no sort-merge join for dim joins)
- global top-k compiles to TakeOrderedAndProject (no full sort)
"""

from __future__ import annotations

import re

import pytest

from etl_spark.queries import LOCAL_QUERIES

SF = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    return (
        LOCAL_QUERIES[name](spark, SF)._jdf.queryExecution().executedPlan().toString()
    )


def scan_lines(plan: str) -> list[str]:
    return [l for l in plan.splitlines() if "FileScan parquet" in l]


def test_filter_pushdown_reaches_scan(spark):
    plan = plan_of(spark, "agg_pricing_summary")
    scans = scan_lines(plan)
    assert any("l_shipdate" in l and "PushedFilters: [" in l for l in scans)
    assert any(re.search(r"PushedFilters: \[.*LessThanOrEqual\(l_shipdate", l) for l in scans)


def test_column_pruning(spark):
    plan = plan_of(spark, "agg_pricing_summary")
    for l in scan_lines(plan):
        # 7 of 11 lineitem columns needed; the rest must not be read
        assert "l_orderkey" not in l and "l_partkey" not in l and "l_suppkey" not in l


def test_dim_joins_broadcast(spark):
    plan = plan_of(spark, "join_region_revenue")
    assert plan.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in plan


def test_segment_filter_pushed_into_dim_scan(spark):
    plan = plan_of(spark, "join_topk_revenue")
    assert any(
        "c_mktsegment" in l and "EqualTo(c_mktsegment,BUILDING)" in l
        for l in scan_lines(plan)
    )
    assert "TakeOrderedAndProject(limit=10" in plan


def test_topk_avoids_global_sort(spark):
    plan = plan_of(spark, "topk_expensive_orders")
    assert "TakeOrderedAndProject(limit=15" in plan
    assert "Exchange rangepartitioning" not in plan  # no full distributed sort


def test_anti_semi_joins_stay_joins(spark):
    for name in ("join_anti_idle_customers", "join_semi_segment_counts"):
        plan = plan_of(spark, name)
        assert "LeftAnti" in plan or "LeftSemi" in plan


@pytest.mark.parametrize(
    "name",
    [
        "agg_pricing_summary",
        "window_top3_orders",
        "dedup_minhash_signatures",
        "docs_quality",
        "mm_features",
        "ann_ivf_kmeans_topk",
    ],
)
def test_no_per_row_python_in_query_surface(spark, name):
    assert "BatchEvalPython" not in plan_of(spark, name)


def test_ivf_kmeans_assignment_is_jvm_expression(spark):
    # the oracle-checked IVF path computes cell assignment as codegen'd
    # fold expressions over centroid literals — no Python at all in the
    # per-row plan (the driver-side sample fit is the only Python)
    plan = plan_of(spark, "ann_ivf_kmeans_topk")
    assert "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan


def test_bucketed_embedding_neardup_is_equi_join(spark):
    # the oracle-checked SCALE path must bucket-join, never all-pairs
    plan = plan_of(spark, "dedup_embedding_neardup_bucketed")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Join" in plan  # it IS a join — on the sign-LSH bucket key


def test_simhash64_banding_is_equi_join(spark):
    plan = plan_of(spark, "dedup_simhash64_pairs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Join" in plan  # band equi-join on (band, word value)
