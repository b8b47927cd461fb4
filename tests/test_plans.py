"""Physical-plan regression tests: the scale posture (broadcasts, pruning,
bounded shuffles) is asserted, not assumed — a refactor that silently turns
a broadcast join into a sort-merge join or widens a scan fails here."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_DIR


def plan_of(spark, name: str) -> str:
    df = entrymod.queries()[name](spark, SF_DIR)
    jvm = spark._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_dim_join_broadcasts_all_dims(spark):
    s = plan_of(spark, "dim_join")
    assert "BroadcastHashJoin" in s
    assert "SortMergeJoin" not in s  # dims are bounded → never shuffle the fact


def test_search_filter_prunes_columns(spark):
    s = plan_of(spark, "search_filter")
    assert "ReadSchema: struct<p_partkey:bigint,p_name:string,p_type:string>" in s
    assert "Exchange" not in s  # pure scan+filter: embarrassingly parallel


def test_latest_per_key_single_shuffle(spark):
    s = plan_of(spark, "latest_per_key")
    # exactly one exchange node (the window's hash partitioning) …
    assert s.count(") Exchange") == 1
    # … preceded by WindowGroupLimit(Partial): per-map-partition top-1 runs
    # BEFORE the shuffle, so only one row per key per partition moves
    assert "WindowGroupLimit" in s
    assert "SortMergeJoin" not in s  # no self-join on max(ts) (SURVEY J1)


def test_asof_anchor_is_broadcast_not_collect(spark):
    s = plan_of(spark, "asof_lookup")
    # the max-ts anchor joins via broadcast nested loop of a 1-row aggregate
    assert "BroadcastNestedLoopJoin" in s or "BroadcastExchange" in s


def test_kpis_partial_aggregation(spark):
    s = plan_of(spark, "kpis")
    # two-phase agg: map-side partial before the single-row final
    assert "partial_count" in s or "partial_max" in s


def test_cosine_topk_broadcasts_queries(spark):
    s = plan_of(spark, "cosine_topk")
    assert "BroadcastNestedLoopJoin" in s  # corpus side never shuffles
    assert "CartesianProduct" not in s


def test_global_sort_is_range_partitioned(spark):
    s = plan_of(spark, "global_sort")
    # unlimited ORDER BY must distribute via range partitioning (sampled
    # boundaries), not collapse to a single partition or a top-k operator
    assert "rangepartitioning" in s
    assert "TakeOrderedAndProject" not in s


def test_simhash_pairs_join_on_band_key(spark):
    s = plan_of(spark, "simhash_pairs")
    # the pair search must equi-join on the LSH band key, not all-pairs
    # within bare `source` (the O(n²)-per-block anti-pattern)
    assert "band_val" in s and "band_id" in s
    assert "CartesianProduct" not in s and "BroadcastNestedLoopJoin" not in s


def test_tpch_q1_pushes_filter_and_prunes(spark):
    s = plan_of(spark, "tpch_q1")
    # the shipdate predicate must reach the parquet scan, and the scan must
    # not read columns the query never touches (e.g. l_orderkey)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in s
    assert "l_orderkey" not in s.split("ReadSchema")[1].split("\n")[0]


def test_tpch_q5_broadcasts_all_dims(spark):
    s = plan_of(spark, "tpch_q5")
    # snowflake dims (customer/supplier/nation/region) all broadcast; the
    # only sort-merge-eligible join is lineitem⋈orders (both fact-sized)
    assert s.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in s


def test_tpch_q3_top_k_not_global_sort(spark):
    s = plan_of(spark, "tpch_q3")
    assert "TakeOrderedAndProject" in s  # LIMIT 10 must not range-sort


def test_entry_uses_broadcast_dim(spark):
    df = entrymod.entry(spark)
    jvm = spark._jvm
    s = df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "BroadcastHashJoin" in s
    assert "TakeOrderedAndProject" in s or "Sort" in s
