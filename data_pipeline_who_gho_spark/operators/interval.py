"""Interval overlap self-join via time bucketing — the scale-safe plan
for "which intervals intersect?".

The naive theta join (``a.start <= b.end AND b.start <= a.end``) has no
equi-key, so Spark plans it as a nested-loop — O(n²) per key group. The
bucketed plan explodes each interval into the fixed-width time buckets
it spans, equi-joins on (key, bucket) — candidate volume is bounded by
bucket occupancy, not group size² — dedupes pairs (an overlapping pair
meets in every shared bucket), and verifies the exact overlap predicate.
Choose ``bucket_us`` near the typical interval span: too small multiplies
the explode, too big recreates the n² bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_overlap_join(
    df: DataFrame,
    key: str,
    id_col: str,
    start_us: str,
    end_us: str,
    bucket_us: int,
) -> DataFrame:
    """All pairs of intervals (closed endpoints, µs) overlapping within a
    key group. Returns (key, id_a, id_b, overlap_us) with id_a < id_b;
    overlap_us is the exact integer intersection length."""
    b = df.select(
        key,
        id_col,
        start_us,
        end_us,
        F.explode(
            F.sequence(
                # integer floor-div: double division truncation can be off
                # by one ulp at µs magnitudes, silently skewing buckets
                F.expr(f"{start_us} div {bucket_us}"),
                F.expr(f"{end_us} div {bucket_us}"),
            )
        ).alias("__b"),
    )
    a, c = b.alias("a"), b.alias("b")
    pairs = (
        a.join(
            c,
            (F.col(f"a.{key}") == F.col(f"b.{key}"))
            & (F.col("a.__b") == F.col("b.__b"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            # exact overlap check inside the join: false candidates die
            # before the dedup shuffle
            & (F.col(f"a.{start_us}") <= F.col(f"b.{end_us}"))
            & (F.col(f"b.{start_us}") <= F.col(f"a.{end_us}")),
        )
        .select(
            F.col(f"a.{key}").alias(key),
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            (
                F.least(F.col(f"a.{end_us}"), F.col(f"b.{end_us}"))
                - F.greatest(F.col(f"a.{start_us}"), F.col(f"b.{start_us}"))
            ).alias("overlap_us"),
        )
        .dropDuplicates([key, "id_a", "id_b"])
    )
    return pairs
