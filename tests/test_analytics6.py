"""Unit + plan tests for the sixth analytics batch (EWMA, PageRank)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipeline_who_gho_spark.plans.analytics6 import (
    EWMA_ALPHA,
    PR_ITERS,
    PR_SCALE,
    ewma_user_value,
    pagerank_customer_supplier,
)

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_ewma_matches_hand_fold(spark):
    rows = ewma_user_value(spark, SF).collect()
    assert len(rows) > 0
    # recompute one user's EWMA by hand from the raw events
    from data_pipeline_who_gho_spark.sources.catalog import load_table

    uid = rows[0]["user_id"]
    ev = (
        load_table(spark, SF, "events")
        .filter(F.col("user_id") == uid)
        .select("ts", "event_id", "value")
        .orderBy("ts", "event_id")
        .collect()
    )
    acc = ev[0]["value"]
    for r in ev[1:]:
        acc = r["value"] * EWMA_ALPHA + acc * (1 - EWMA_ALPHA)
    assert rows[0]["ewma"] == acc  # bit-exact: identical fold order
    assert rows[0]["n_events"] == len(ev)


def test_ewma_single_shuffle(spark):
    plan = _plan(ewma_user_value(spark, SF))
    # one exchange for the user_id aggregate; the fold is map-side
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_pagerank_mass_and_determinism(spark):
    df = pagerank_customer_supplier(spark, SF)
    rows = df.collect()
    assert 0 < len(rows) <= 100
    # fixed-point ranks: every rank ≥ the damping floor, all integers
    floor = 15 * PR_SCALE // 100
    assert all(r["rank"] >= floor for r in rows)
    assert all(r["node_type"] in ("customer", "supplier") for r in rows)
    # deterministic: re-running yields the identical ranking
    again = pagerank_customer_supplier(spark, SF).collect()
    assert [(r["node"], r["rank"]) for r in rows] == [
        (r["node"], r["rank"]) for r in again
    ]


def test_pagerank_iterations_shape(spark):
    plan = _plan(pagerank_customer_supplier(spark, SF))
    # each of the PR_ITERS iterations aggregates contributions by dst;
    # partial aggregation must be present (map-side combine of mass)
    assert "partial_sum" in plan
    assert plan.count("HashAggregate") >= PR_ITERS


def test_interp_linear_fill_edge_cases(spark):
    """Constructed frame pinning the interpolation contract: observation
    rows keep their value, interior gaps interpolate in EVENT TIME,
    leading gaps backfill, trailing gaps carry forward."""
    import datetime as dt

    from data_pipeline_who_gho_spark.plans import analytics6 as A6
    from pyspark.sql import functions as F

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def row(eid, sec, etype, val):
        return (eid, t0 + dt.timedelta(seconds=sec), 1, etype, val)

    ev = spark.createDataFrame(
        [
            row(1, 0, "click", 99.0),   # leading gap -> backfill 10.0
            row(2, 10, "view", 10.0),   # observation
            row(3, 40, "click", 99.0),  # 3/4 of the way 10 -> 30: 25.0
            row(4, 50, "view", 30.0),   # observation
            row(5, 60, "click", 99.0),  # trailing gap -> carry 30.0
        ],
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE",
    )
    orig = A6.load_table
    A6.load_table = lambda spark_, sf_, name: ev
    try:
        got = {
            r["event_id"]: r["filled"]
            for r in A6.interp_linear_fill(spark, "ignored").collect()
        }
    finally:
        A6.load_table = orig
    assert got == {1: 10.0, 2: 10.0, 3: 25.0, 4: 30.0, 5: 30.0}


def test_interp_linear_fill_no_observations_user(spark):
    """A user with zero 'view' observations yields NULL fills, not a
    crash or a borrowed neighbor value."""
    import datetime as dt

    from data_pipeline_who_gho_spark.plans import analytics6 as A6

    t0 = dt.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [
            (1, t0, 7, "click", 5.0),
            (2, t0 + dt.timedelta(seconds=9), 7, "error", 6.0),
            (3, t0, 8, "view", 1.0),
        ],
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE",
    )
    orig = A6.load_table
    A6.load_table = lambda spark_, sf_, name: ev
    try:
        rows = {
            r["event_id"]: r["filled"]
            for r in A6.interp_linear_fill(spark, "ignored").collect()
        }
    finally:
        A6.load_table = orig
    assert rows[1] is None and rows[2] is None and rows[3] == 1.0
