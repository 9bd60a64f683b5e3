"""Slowly-changing-dimension Type 2 merge: history-preserving dimension
maintenance as ONE pure DataFrame plan.

The reference's warehouse overwrites dimension rows in place
(``INSERT .. ON CONFLICT DO UPDATE`` — etl/load.py:30-52), losing
history. SCD2 is the standard warehouse answer: each change CLOSES the
current version (stamps ``valid_to``, clears ``is_current``) and INSERTS
a new open version. The read-side complement (reconstructing islands
from an event log) is ``plans/analytics4.scd2_user_status``; this is the
write side that maintains such a table incrementally.

Plan shape (100 TB posture): one equi-join on the natural key between
the CURRENT slice and the change batch decides changed/unchanged/new —
historical (closed) rows pass through untouched via a cheap
``is_current`` filter, never joined. Attribute comparison is null-safe
(``<=>``) so NULL→value and value→NULL transitions version correctly.
Replaying the same batch is a no-op (idempotent): an incoming row
identical to the current version produces no new version.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HIGH_DATE = "9999-12-31 00:00:00"


def _attrs_differ(attrs: Sequence[str], left: str, right: str) -> Column:
    """Null-safe any-attribute-changed predicate."""
    same = reduce(
        lambda a, b: a & b,
        [F.col(f"{left}.{c}").eqNullSafe(F.col(f"{right}.{c}")) for c in attrs],
    )
    return ~same


def scd2_merge(
    target: DataFrame | None,
    changes: DataFrame,
    keys: Sequence[str],
    attrs: Sequence[str],
    effective_col: str = "effective_ts",
) -> DataFrame:
    """Apply a change batch to an SCD2 table.

    ``target`` columns: keys + attrs + ``valid_from``, ``valid_to``,
    ``is_current``; ``changes`` columns: keys + attrs + effective_col.
    ``changes`` must be key-unique (one version per key per batch —
    callers dedup to the latest change first, as with ``merge_upsert``).

    Returns the new table: closed history untouched, superseded current
    rows closed at the change's effective time, fresh versions opened,
    unchanged keys left as-is.

    Late-arriving changes (effective_ts < the current version's
    valid_from) are IGNORED: applying them would close the current row
    with valid_to < valid_from and open an overlapping version,
    corrupting as-of lookups. Out-of-order history requires a rebuild
    from the full change log, not an incremental merge.

    A change with effective_ts EXACTLY equal to the open version's
    valid_from but different attributes is a same-timestamp correction:
    versioning it would create a zero-width interval, so the open
    version's attributes are updated in place instead (no new version).
    Replay stays idempotent — re-applying the correction rewrites the
    same values.
    """
    out_cols = [*keys, *attrs, "valid_from", "valid_to", "is_current"]
    fresh = changes.select(
        *keys,
        *attrs,
        F.col(effective_col).alias("valid_from"),
        F.lit(HIGH_DATE).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    if target is None:
        return fresh.select(*out_cols)

    history = target.filter(~F.col("is_current"))
    current = target.filter(F.col("is_current")).alias("t")
    ch = changes.alias("c")
    joined = current.join(ch, on=list(keys), how="left")

    changed = (
        F.col(f"c.{effective_col}").isNotNull()
        & (F.col(f"c.{effective_col}") > F.col("t.valid_from"))  # late-arrival guard
        & _attrs_differ(attrs, "t", "c")
    )
    # same-timestamp correction: fix the open version in place rather
    # than opening a zero-width interval or silently dropping the change
    corrected = (
        F.col(f"c.{effective_col}").isNotNull()
        & (F.col(f"c.{effective_col}") == F.col("t.valid_from"))
        & _attrs_differ(attrs, "t", "c")
    )
    # current rows: close if superseded, correct in place on equal ts,
    # else pass through unchanged
    kept_current = joined.select(
        *keys,
        *[
            F.when(corrected, F.col(f"c.{c}")).otherwise(F.col(f"t.{c}")).alias(c)
            for c in attrs
        ],
        F.col("t.valid_from").alias("valid_from"),
        F.when(changed, F.col(f"c.{effective_col}")).otherwise(F.col("t.valid_to")).alias("valid_to"),
        F.when(changed, F.lit(False)).otherwise(F.col("t.is_current")).alias("is_current"),
    )
    # fresh versions: new keys, or keys whose attributes actually changed
    new_keys = ch.join(current, on=list(keys), how="left_anti").select(
        *keys, *[F.col(c) for c in attrs], F.col(effective_col)
    )
    changed_keys = (
        joined.filter(changed)
        .select(*keys, *[F.col(f"c.{c}").alias(c) for c in attrs], F.col(f"c.{effective_col}"))
    )
    fresh_versions = new_keys.unionByName(changed_keys).select(
        *keys,
        *attrs,
        F.col(effective_col).alias("valid_from"),
        F.lit(HIGH_DATE).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    return (
        history.select(*out_cols)
        .unionByName(kept_current.select(*out_cols))
        .unionByName(fresh_versions)
    )
