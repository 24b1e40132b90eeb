"""Physical-plan regression tests: pin the plan properties the headline
queries' performance depends on (SCALE.md's plan audit, made executable).
A logical-plan edit that silently reintroduces a shuffle, drops a
broadcast, or blocks filter pushdown fails HERE, not in a later round's
benchmark.

Plans are taken AFTER execution so AQE's final choices (not the static
estimate) are asserted.
"""

from __future__ import annotations

import os

import pytest

from flinkrealtimedatawarehouse_spark import tables

SF_SMALL = os.path.join(
    os.path.dirname(tables.DEFAULT_SF_DIR.rstrip("/")), "sf0.001"
)


def _executed_plan(df) -> str:
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def plans(spark):
    """Execute each asserted query once and keep the final plans."""
    from flinkrealtimedatawarehouse_spark.benchqueries import pipeline, warehouse

    return {
        "j4": _executed_plan(warehouse.q_j4(spark, SF_SMALL)),
        "u2": _executed_plan(warehouse.q_u2(spark, SF_SMALL)),
        "a12": _executed_plan(warehouse.q_a12(spark, SF_SMALL)),
        "dp6": _executed_plan(pipeline.q_cosine_topk(spark, SF_SMALL)),
    }


def test_star_join_broadcasts_all_dims(plans):
    """J4: the dim chain must stay 3x broadcast joins — a fallback to
    sort-merge on any dim means a full fact shuffle per dim at scale."""
    plan = plans["j4"]
    assert plan.count("BroadcastHashJoin") >= 3, plan
    assert "SortMergeJoin" not in plan, plan


def test_star_join_prunes_and_pushes_fact_scan(plans):
    """J4: the orders scan must read a pruned schema with pushed filters
    — a scan of all 9 columns for a 4-column query is a regression."""
    plan = plans["j4"]
    assert "PushedFilters: [IsNotNull" in plan, plan
    assert "ReadSchema" in plan, plan


def test_union_form_is_not_cached(plans):
    """U2: the 7-way union deliberately re-scans (SCALE.md: a fact-table
    cache neither fits at 100 TB nor beats pruned pushed-down scans) —
    an InMemoryTableScan here means someone re-added the cache."""
    assert "InMemoryTableScan" not in plans["u2"], plans["u2"]


def test_union_branches_push_their_filters(plans):
    """U2: every branch's event_type predicate must reach its scan."""
    plan = plans["u2"]
    assert plan.count("PushedFilters: [") >= 6, plan
    assert "EqualTo(event_type" in plan, plan


def test_grain_rollup_is_one_expand_per_aggregation(plans):
    """A12: GROUPING SETS must plan as Expand + partial/final agg — one
    scan, one exchange — not per-grain unioned scans."""
    plan = plans["a12"]
    assert "Expand" in plan, plan
    # one shuffle for the agg (plus possibly AQE reads); never 4+ scans
    assert plan.count("Scan parquet") <= 2, plan


def test_cosine_topk_partial_limit_before_exchange(plans):
    """dp6: the per-probe top-k must apply WindowGroupLimit map-side so
    the exchange carries k rows per probe per partition, not the whole
    scored corpus."""
    plan = plans["dp6"]
    assert "WindowGroupLimit" in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan  # probe side broadcast
