"""As-of (point-in-time) join — an operator core Spark lacks, composed
from built-in DataFrame ops (SURVEY brief: custom operators as
compositions first, Pandas UDFs only if semantics force it — they don't).

Semantics (backward as-of): for each left row, attach the single most
recent right row with ``right.ts <= left.ts`` within the same key group;
left rows with no prior right row keep nulls.

Plan shape: union the two tagged sides, one shuffle on the key, one
ordered window pass carrying the right side's payload forward
(``last(ignorenulls=True)``), then keep left rows. Cost = one shuffle +
one sort, independent of the time-gap distribution — strictly better
than the naive inequality join (which explodes to O(L·R) per key before
aggregation).

At 100 TB: partition by key, sort within partition — the same shape
Spark uses for window analytics; AQE splits skewed keys.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    ts: str = "ts",
    value_cols: Sequence[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join. ``value_cols`` are the right-side columns to
    carry (default: all non-key, non-ts columns). Ties (equal ts) take
    the right row (<= semantics), matching DuckDB/pandas ``merge_asof``.
    """
    on = list(on)
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in on and c != ts]

    l_tag = left.withColumn("__side", F.lit(1))
    # the whole right payload rides as ONE struct: last(ignorenulls) then
    # picks the latest right ROW atomically — a right row whose value
    # column is genuinely NULL still supersedes older rows (merge_asof /
    # DuckDB ASOF parity), and multiple value columns can never mix rows
    r_tag = right.select(
        *on,
        ts,
        F.struct(*[F.col(c) for c in value_cols]).alias("__payload"),
    ).withColumn("__side", F.lit(0))

    unioned = l_tag.withColumn("__payload", F.lit(None).cast(
        r_tag.schema["__payload"].dataType
    )).unionByName(r_tag, allowMissingColumns=True)
    # right rows (side 0) sort before left rows at the same ts ⇒ a right
    # row at exactly left.ts is visible to that left row (<= semantics)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(ts), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = unioned.withColumn(
        "__carried", F.last(F.col("__payload"), ignorenulls=True).over(w)
    )
    out = unioned.filter(F.col("__side") == 1)
    for c in value_cols:
        out = out.withColumn(f"{c}{suffix}", F.col("__carried").getField(c))
    return out.drop("__side", "__payload", "__carried")
