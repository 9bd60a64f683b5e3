"""Skew-handling utilities: salted two-phase aggregation and a salted
broadcast-side join — the manual fallbacks for when AQE's runtime skew
handling isn't available (e.g. non-join aggregations over pathological
keys at 100 TB).

Salting trades one shuffle for two balanced ones: phase 1 aggregates
(key, salt) — hot keys spread over ``salt_buckets`` reducers — phase 2
merges the partials per key. Correct for any algebraic aggregate
(sum/count/min/max); averages must be decomposed into sum+count by the
caller.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, Column]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs`` maps output column → (merge_fn_name, partial_expression),
    e.g. ``{"total": ("sum", F.sum(F.col("x"))), "n": ("sum", F.count(F.lit(1)))}``.
    The partial runs per (key, salt); the merge re-aggregates per key with
    the named function (sum/min/max).
    """
    # row-id salt: pure spreading — the salt value never affects results
    # because phase 2 merges across all salts of a key
    salted = df.withColumn("__salt", (F.monotonically_increasing_id() % salt_buckets).cast("int"))
    partial = salted.groupBy(*keys, "__salt").agg(
        *[expr.alias(f"__p_{name}") for name, (_, expr) in aggs.items()]
    )
    merge_fns = {"sum": F.sum, "min": F.min, "max": F.max}
    final = partial.groupBy(*keys).agg(
        *[
            merge_fns[fn](F.col(f"__p_{name}")).alias(name)
            for name, (fn, _) in aggs.items()
        ]
    )
    return final


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    salt_buckets: int = 16,
) -> DataFrame:
    """Salted equi-join for a skewed big side joined to a table too large
    to broadcast: salt the big side with a row-id bucket (pure spreading,
    never affects results), replicate the small side across all buckets,
    and join on keys + salt — each hot key's rows fan across
    ``salt_buckets`` reducers instead of one straggler task.

    Cost model: the small side shuffles ``salt_buckets`` times over —
    worth it exactly when the hot key's single-reducer time dominates.
    Only inner/left joins are salt-correct (a small-side row with no big
    match would otherwise surface once per replica); other join types
    raise.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner|left, got {how!r}")
    on = list(on)
    salted_big = big.withColumn(
        "__salt", (F.monotonically_increasing_id() % salt_buckets).cast("int")
    )
    replicated = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    ).withColumn("__salt", F.col("__salt").cast("int"))
    return salted_big.join(replicated, on + ["__salt"], how).drop("__salt")


def salted_join_hot_keys(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    hot_keys: DataFrame,
    how: str = "inner",
    salt_buckets: int = 16,
) -> DataFrame:
    """The production form of ``salted_join``: replicate the small side
    ONLY for the keys in ``hot_keys`` (caller-detected — e.g. from a
    count aggregate or a prior run's skew report); every other key
    joins plainly. Avoids paying ``salt_buckets``× replication on the
    whole small side when skew is concentrated in a handful of keys —
    at 100 TB the difference between "shuffle the dim 16×" and
    "shuffle 16 copies of three hot rows".

    ``hot_keys`` must contain exactly the ``on`` columns. Result is
    row-identical to the plain join (both branches partition the big
    side by hot-key membership, so no row joins twice)."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join_hot_keys supports inner|left, got {how!r}")
    on = list(on)
    hot = hot_keys.select(*on).distinct()
    big_hot = big.join(F.broadcast(hot), on, "left_semi")
    big_cold = big.join(F.broadcast(hot), on, "left_anti")
    small_hot = small.join(F.broadcast(hot), on, "left_semi")
    hot_joined = salted_join(big_hot, small_hot, on, how, salt_buckets)
    cold_joined = big_cold.join(small, on, how)
    return hot_joined.unionByName(cold_joined)
