"""As-of (point-in-time) join — an operator core Spark lacks, composed
from built-in DataFrame ops (SURVEY brief: custom operators as
compositions first, Pandas UDFs only if semantics force it — they don't).

Semantics (backward as-of): for each left row, attach the single most
recent right row with ``right.ts <= left.ts`` within the same key group;
left rows with no prior right row keep nulls. Forward direction and a
match-gap tolerance (pandas ``merge_asof`` parity) are options; the
``right_order`` tiebreak column, when given, must be numeric.

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
    direction: str = "backward",
    tolerance_us: int | None = None,
    right_order: str | None = None,
) -> DataFrame:
    """As-of join. ``value_cols`` are the right-side columns to carry
    (default: all non-key, non-ts columns). Ties (equal ts) match in
    both directions (<= / >= semantics), like DuckDB/pandas
    ``merge_asof``.

    ``direction``: "backward" (latest right row at-or-before left.ts) or
    "forward" (earliest right row at-or-after). ``tolerance_us`` caps
    the match gap in microseconds — a match farther away yields NULLs,
    merge_asof's ``tolerance``. ``right_order`` names a right column
    that deterministically breaks ties between right rows sharing a
    timestamp (largest wins for backward, smallest for forward — the row
    "nearest" the left row in the window order); without it, equal-ts
    right rows are picked arbitrarily.

    Plan shape is direction-independent: the forward pass just negates
    the epoch-µs sort key, so both directions are the same single
    shuffle + one ordered window pass. ``"nearest"`` (merge_asof
    parity) runs BOTH ordered passes over the one shuffled union — same
    exchange, two sorts — and picks the closer match per left row
    atomically (equal distances resolve to the backward match).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    on = list(on)
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in on and c != ts]

    sign = 1 if direction == "backward" else -1
    l_tag = left.withColumn("__side", F.lit(1))
    # the whole right payload rides as ONE struct: last(ignorenulls) then
    # picks the latest right ROW atomically — a right row whose value
    # column is genuinely NULL still supersedes older rows (merge_asof /
    # DuckDB ASOF parity), and multiple value columns can never mix rows.
    # The right timestamp rides along for the tolerance check.
    r_tag = right.select(
        *on,
        ts,
        F.struct(
            *[F.col(c) for c in value_cols],
            F.unix_micros(F.col(ts)).alias("__r_us"),
        ).alias("__payload"),
        (F.col(right_order) if right_order else F.lit(0)).alias("__rord"),
    ).withColumn("__side", F.lit(0))

    unioned = (
        l_tag.withColumn(
            "__payload", F.lit(None).cast(r_tag.schema["__payload"].dataType)
        )
        .withColumn("__rord", F.lit(None).cast(r_tag.schema["__rord"].dataType))
        .unionByName(r_tag, allowMissingColumns=True)
    )
    # right rows (side 0) sort before left rows at the same ts ⇒ a right
    # row at exactly left.ts is visible to that left row (<= / >=
    # semantics). Among equal-ts right rows, __rord orders them so
    # last() picks the winner deterministically.
    def _carried(s: int):
        w = (
            Window.partitionBy(*on)
            .orderBy(
                (F.unix_micros(F.col(ts)) * F.lit(s)).alias("__skey"),
                F.col("__side"),
                (F.col("__rord") * F.lit(s)),
            )
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return F.last(F.col("__payload"), ignorenulls=True).over(w)

    if direction == "nearest":
        # both passes share the on-key exchange; the closer match wins,
        # equal distances resolve backward (and an equal-ts right row is
        # gap 0 in both passes, so backward's tiebreak pick applies)
        unioned = unioned.withColumn("__cb", _carried(1)).withColumn(
            "__cf", _carried(-1)
        )
        out = unioned.filter(F.col("__side") == 1)
        l_us = F.unix_micros(F.col(ts))
        gap_b = l_us - F.col("__cb.__r_us")
        gap_f = F.col("__cf.__r_us") - l_us
        use_b = F.col("__cb").isNotNull() & (
            F.col("__cf").isNull() | (gap_b <= gap_f)
        )
        chosen = F.when(use_b, F.col("__cb")).otherwise(F.col("__cf"))
        gap = F.when(use_b, gap_b).otherwise(gap_f)
        in_tol = (
            F.lit(True)
            if tolerance_us is None
            else gap <= F.lit(int(tolerance_us))
        )
        for c in value_cols:
            out = out.withColumn(
                f"{c}{suffix}", F.when(in_tol, chosen.getField(c))
            )
        return out.drop("__side", "__payload", "__cb", "__cf", "__rord")

    unioned = unioned.withColumn("__carried", _carried(sign))
    out = unioned.filter(F.col("__side") == 1)
    gap = (F.unix_micros(F.col(ts)) - F.col("__carried.__r_us")) * F.lit(sign)
    in_tol = (
        F.lit(True) if tolerance_us is None else gap <= F.lit(int(tolerance_us))
    )
    for c in value_cols:
        out = out.withColumn(
            f"{c}{suffix}",
            F.when(in_tol, F.col("__carried").getField(c)),
        )
    return out.drop("__side", "__payload", "__carried", "__rord")
