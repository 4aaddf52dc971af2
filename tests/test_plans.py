"""Physical-plan assertions: the scale properties (pushdown, pruning,
broadcast, partial aggregation) must actually appear in the executed plans,
not just in design notes. Guards against plan regressions."""

from __future__ import annotations

import os

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q1_pushdown_and_column_pruning(spark):
    from griddb_spark import workload

    plan = _plan(workload.QUERIES["q1_pricing_summary"](spark, SF_DIR))
    # shipdate filter reaches the parquet reader
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # scan reads only the referenced columns, not all 16 lineitem columns
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_orderkey" not in read_schema and "l_comment" not in read_schema
    # partial aggregation before the exchange (map-side combine)
    assert "partial_sum" in plan or "partial_avg" in plan


def test_join_5way_broadcasts_dims(spark):
    from griddb_spark import workload

    plan = _plan(workload.QUERIES["join_inner_5way"](spark, SF_DIR))
    # small dimensions must broadcast — a shuffle join of nation/region
    # against the fact table would be a 100 TB-scale bug
    assert plan.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in plan or plan.count("SortMergeJoin") <= 1


def test_group_by_range_single_window_no_extra_shuffle(spark):
    from griddb_spark import workload

    plan = _plan(workload.QUERIES["range_15m_fill_linear"](spark, SF_DIR))
    # fill scaffold joins broadcast; the only wide ops are the bucket agg
    # exchange and the (tiny, lattice-sized) window sort
    assert "BroadcastHashJoin" in plan
    assert plan.count("Exchange") <= 3


def test_topk_uses_take_ordered(spark):
    from griddb_spark import workload

    plan = _plan(workload.QUERIES["sort_topk"](spark, SF_DIR))
    # ORDER BY + LIMIT must compile to TakeOrdered (per-partition top-k +
    # merge), never a global sort
    assert "TakeOrderedAndProject" in plan


def test_asof_join_is_single_sort(spark):
    from griddb_spark import workload

    plan = _plan(workload.QUERIES["asof_join_users"](spark, SF_DIR))
    # the union-scaffold as-of join: one window, no nested-loop join
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
