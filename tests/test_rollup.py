"""Incremental rollup maintenance (operators/rollup) + analytics5
invariants: the merge must be lossless, associative, and
arrival-order-independent — the properties an incremental materialized
view depends on."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipeline_who_gho_spark.operators.rollup import merge_rollups, rollup_aggregate
from data_pipeline_who_gho_spark.plans.analytics5 import (
    event_transitions,
    fuzzy_match_docs,
)
from data_pipeline_who_gho_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"

KEYS = ["o_orderpriority"]
KINDS = {"n": "count", "rev": "sum", "hi": "max", "lo": "min"}


def _measures():
    return {
        "n": ("count", F.lit(1)),
        "rev": ("sum", F.col("o_totalprice").cast("decimal(14,2)")),
        "hi": ("max", F.col("o_totalprice")),
        "lo": ("min", F.col("o_totalprice")),
    }


def _norm(df):
    return sorted(
        (r["o_orderpriority"], r["n"], float(r["rev"]), r["hi"], r["lo"])
        for r in df.collect()
    )


def test_merge_equals_full_recompute(spark):
    orders = load_table(spark, SF, "orders")
    full = _norm(rollup_aggregate(orders, KEYS, _measures()))
    a = orders.filter(F.col("o_orderkey") % 3 == 0)
    b = orders.filter(F.col("o_orderkey") % 3 != 0)
    merged = merge_rollups(
        rollup_aggregate(a, KEYS, _measures()),
        rollup_aggregate(b, KEYS, _measures()),
        KEYS,
        KINDS,
    )
    assert _norm(merged) == full


def test_merge_is_order_independent_and_associative(spark):
    orders = load_table(spark, SF, "orders")
    parts = [orders.filter(F.col("o_orderkey") % 3 == i) for i in range(3)]
    states = [rollup_aggregate(p, KEYS, _measures()) for p in parts]
    left = merge_rollups(merge_rollups(states[0], states[1], KEYS, KINDS), states[2], KEYS, KINDS)
    right = merge_rollups(states[0], merge_rollups(states[2], states[1], KEYS, KINDS), KEYS, KINDS)
    assert _norm(left) == _norm(right)


def test_empty_delta_is_identity(spark):
    orders = load_table(spark, SF, "orders")
    state = rollup_aggregate(orders, KEYS, _measures())
    empty = rollup_aggregate(orders.filter(F.lit(False)), KEYS, _measures())
    assert _norm(merge_rollups(state, empty, KEYS, KINDS)) == _norm(state)


def test_unknown_kind_rejected(spark):
    orders = load_table(spark, SF, "orders")
    with pytest.raises(ValueError, match="avg"):
        rollup_aggregate(orders, KEYS, {"x": ("avg", F.col("o_totalprice"))})
    state = rollup_aggregate(orders, KEYS, _measures())
    with pytest.raises(ValueError, match="avg"):
        merge_rollups(state, state, KEYS, {"n": "avg"})


def test_transition_probabilities_normalize(spark):
    rows = event_transitions(spark, SF).collect()
    by_from: dict[str, float] = {}
    for r in rows:
        by_from[r["from_type"]] = by_from.get(r["from_type"], 0.0) + r["p"]
    for total in by_from.values():
        assert abs(total - 1.0) < 1e-9


def test_fuzzy_pairs_are_canonical_and_bounded(spark):
    rows = fuzzy_match_docs(spark, SF).collect()
    for r in rows:
        assert r["id_a"] < r["id_b"]
        assert 0 <= r["dist"] <= 5


class TestSketchRollup:
    """Mergeable HLL distinct-count rollups: union ≡ one-pass, tolerance
    contract vs exact, incremental refresh without history rescan."""

    def test_union_equals_one_pass(self, spark):
        from data_pipeline_who_gho_spark.operators.rollup import (
            merge_sketch_rollups,
            sketch_estimate,
            sketch_rollup,
        )
        from data_pipeline_who_gho_spark.sources.catalog import load_table
        from pyspark.sql import functions as F

        orders = load_table(spark, "/root/testdata/sf0.01", "orders")
        h1 = orders.filter(F.year("o_orderdate") <= 1997)
        h2 = orders.filter(F.year("o_orderdate") > 1997)

        one_pass = sketch_rollup(orders, ["o_orderstatus"], "o_custkey")
        merged = merge_sketch_rollups(
            sketch_rollup(h1, ["o_orderstatus"], "o_custkey"),
            sketch_rollup(h2, ["o_orderstatus"], "o_custkey"),
            ["o_orderstatus"],
        )
        a = {r["o_orderstatus"]: r["distinct_estimate"]
             for r in sketch_estimate(one_pass).collect()}
        b = {r["o_orderstatus"]: r["distinct_estimate"]
             for r in sketch_estimate(merged).collect()}
        # the union keeps the accuracy bound; estimates may differ by
        # representation-promotion noise, far inside the ~1.6% rse
        for k in a:
            assert abs(a[k] - b[k]) / a[k] < 0.02

    def test_estimate_within_tolerance_of_exact(self, spark):
        from data_pipeline_who_gho_spark.operators.rollup import (
            sketch_estimate,
            sketch_rollup,
        )
        from data_pipeline_who_gho_spark.sources.catalog import load_table
        from pyspark.sql import functions as F

        orders = load_table(spark, "/root/testdata/sf0.01", "orders")
        est = {r["o_orderstatus"]: r["distinct_estimate"]
               for r in sketch_estimate(
                   sketch_rollup(orders, ["o_orderstatus"], "o_custkey")
               ).collect()}
        exact = {r["o_orderstatus"]: r["n"]
                 for r in orders.groupBy("o_orderstatus")
                 .agg(F.countDistinct("o_custkey").alias("n")).collect()}
        for k, n in exact.items():
            assert abs(est[k] - n) / n < 0.05  # default lgK=12 ⇒ ~1.6% rse


def test_fuzzy_passjoin_equals_quadratic_definition(spark, tmp_path):
    """The PassJoin segment filter must find exactly the pairs the
    quadratic block-join definition finds — including edits that SHIFT
    later segments (indels), edits at segment boundaries, and short
    docs on the fallback path."""
    from pyspark.sql import functions as F

    from data_pipeline_who_gho_spark.plans.analytics5 import (
        _BLOCK_LEN,
        _MAX_DIST,
        _PREFIX_LEN,
        fuzzy_match_docs,
    )

    head = "BLOCKHEAD_12"  # the 12-char block
    base = head + "abcdefghijklmnopqrstuvwxyz0123456789ABCDEFGHIJKL"  # 60 chars
    rows = [
        (0, base),
        (1, base[:20] + "XX" + base[22:]),            # 2 substitutions
        # on fixed-60 prefixes an indel also desyncs the tail, so a
        # 2-char indel costs ~4 total — inside the threshold, and it
        # SHIFTS every later segment (the case pure banding misses)
        (2, base[:15] + base[17:] + "YY"),            # 2-char deletion
        (3, base[:30] + "zz" + base[30:58]),          # 2-char insertion
        (4, base[:12] + "Q" * 48),                    # same block, far suffix
        (5, head + "abcdefg"),                        # short doc (fallback path)
        (6, head + "abcdefgh"),                       # short, dist 1 from #5
        (7, "OTHERBLOCK__" + base[12:]),              # different block
    ]
    docs = [(i, t, "en", "web", len(t)) for i, t in rows]
    spark.createDataFrame(
        docs, "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    got = {(r["id_a"], r["id_b"]): r["dist"]
           for r in fuzzy_match_docs(spark, str(tmp_path)).collect()}

    # quadratic reference computed inline
    import itertools

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                         prev + (ca != cb))
        return dp[len(b)]

    want = {}
    for (ia, ta), (ib, tb) in itertools.combinations(rows, 2):
        pa, pb = ta[:_PREFIX_LEN], tb[:_PREFIX_LEN]
        if ta[:_BLOCK_LEN] == tb[:_BLOCK_LEN]:
            d = lev(pa, pb)
            if d <= _MAX_DIST:
                want[(min(ia, ib), max(ia, ib))] = d
    assert got == want
    assert (0, 1) in got and (0, 2) in got and (0, 3) in got
    assert (5, 6) in got          # short fallback found the pair
    assert (0, 4) not in got      # far suffix pruned AND verified out
