"""Plan-regression guards: assert the physical plans keep the properties
the engine's 100 TB posture depends on (pushdown, pruning, broadcast,
partial aggregation). A correctness-preserving change that silently loses
one of these is a perf bug — catch it here."""

from __future__ import annotations

import pytest

from data_pipeline_who_gho_spark.plans.analytics import (
    a1_star_join_revenue,
    a2_filter_like,
    agg_pricing_summary,
)
from data_pipeline_who_gho_spark.plans.etl_ops import etl_upsert_merge

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_and_pruning(spark):
    plan = _plan(a2_filter_like(spark, SF))
    assert "PushedFilters: [" in plan and "StringStartsWith(p_type,PROMO)" in plan
    # column pruning: p_brand is not referenced -> must not be read
    assert "p_brand" not in plan


def test_star_join_broadcasts_dims(spark):
    plan = _plan(a1_star_join_revenue(spark, SF))
    assert plan.count("BroadcastHashJoin") >= 3  # nation/region/customer at least
    assert "SortMergeJoin" not in plan  # nothing should fall back at this sf
    assert "partial_sum" in plan  # map-side combine before the exchange


def test_pricing_summary_partial_agg(spark):
    plan = _plan(agg_pricing_summary(spark, SF))
    assert "partial_sum" in plan and "partial_count" in plan
    assert plan.count("Exchange hashpartitioning") == 1  # single shuffle


def test_upsert_antijoin_prunes_to_keys(spark):
    plan = _plan(etl_upsert_merge(spark, SF))
    assert "LeftAnti" in plan
    # the anti-join's build side must only carry the key column
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan
