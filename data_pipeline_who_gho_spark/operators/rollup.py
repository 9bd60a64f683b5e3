"""Incremental rollup maintenance: merge partial aggregates instead of
recomputing from raw facts.

Generalizes the reference's idempotent-load posture (`etl/load.py:30-52`
merges *rows*; this merges *aggregate state*): a materialized rollup at
(keys → sum/count/min/max) is refreshed from a delta batch by
aggregating only the delta and combining partials — the algebraic
(self-merging) aggregate property Catalyst itself exploits for
partial_sum map-side combine, applied across batches.

Scale posture: refreshing a 100 TB fact's daily rollup touches only the
delta partitions plus the (tiny) rollup table — a union + one group-by
on the rollup key, never a rescan of history. Derived measures (avg =
sum/count) are computed at read time from merged primitives; only
algebraic primitives are stored (avg itself does not merge).
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_AGG = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
_MERGE = {
    "sum": F.sum,
    "count": F.sum,  # counts merge by summing partial counts
    "min": F.min,
    "max": F.max,
}


def rollup_aggregate(
    df: DataFrame, keys: list[str], measures: Mapping[str, tuple[str, Column]]
) -> DataFrame:
    """Aggregate raw rows into rollup state.

    ``measures`` maps output column → (kind, input expression) with kind
    in {sum, count, min, max}.
    """
    aggs = []
    for out, (kind, expr) in measures.items():
        if kind not in _AGG:
            raise ValueError(f"unsupported rollup measure kind: {kind}")
        aggs.append(_AGG[kind](expr).alias(out))
    return df.groupBy(*keys).agg(*aggs)


def merge_rollups(
    state: DataFrame, delta: DataFrame, keys: list[str], kinds: Mapping[str, str]
) -> DataFrame:
    """Combine two rollup states (same schema) into one: union the
    partials and re-reduce each measure with its merge function.
    Associative + commutative, so any batch arrival order yields the
    same rollup — the idempotent-refresh guarantee."""
    aggs = []
    for out, kind in kinds.items():
        if kind not in _MERGE:
            raise ValueError(f"unsupported rollup measure kind: {kind}")
        aggs.append(_MERGE[kind](F.col(out)).alias(out))
    return state.unionByName(delta).groupBy(*keys).agg(*aggs)


def sketch_rollup(
    df: DataFrame, keys: list[str], col: str, out: str = "distinct_sketch"
) -> DataFrame:
    """COUNT DISTINCT rollup state: one mergeable HyperLogLog sketch per
    group (``hll_sketch_agg``, Apache DataSketches binary form).

    Distinct counts are NOT algebraic — partial counts cannot be summed —
    which is exactly why 100 TB rollups store sketches instead: sketch
    union preserves the accuracy bound (the union's relative standard
    error is the same ~1.6% at the default lgK=12 as a single pass over
    the combined raw data; the estimate may differ by noise because the
    union can promote the internal HLL representation), so refreshing
    from a delta batch never rescans history, and coarser groupings
    (monthly → yearly → total) derive from the same states via further
    unions.
    """
    return df.groupBy(*keys).agg(F.hll_sketch_agg(col).alias(out))


def merge_sketch_rollups(
    state: DataFrame, delta: DataFrame, keys: list[str], out: str = "distinct_sketch"
) -> DataFrame:
    """Union two sketch-rollup states group-wise (``hll_union_agg``) —
    associative + commutative like ``merge_rollups``."""
    return (
        state.unionByName(delta)
        .groupBy(*keys)
        .agg(F.hll_union_agg(F.col(out)).alias(out))
    )


def sketch_estimate(df: DataFrame, out: str = "distinct_sketch") -> DataFrame:
    """Materialize the distinct-count estimates from sketch state."""
    return df.withColumn("distinct_estimate", F.hll_sketch_estimate(F.col(out)))
