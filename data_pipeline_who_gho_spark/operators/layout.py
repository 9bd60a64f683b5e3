"""Z-order (Morton space-filling curve) clustering — multi-dimensional
data-skipping layout, the open-format equivalent of Delta's OPTIMIZE
ZORDER BY.

Why it matters at 100 TB: parquet row-group/file pruning works off
per-file min/max stats. Sorting by a single column gives perfect
pruning on that column and none on others; interleaving the bits of
two (or more) bucketed dimensions into one Morton key and range-
partitioning + sorting by it makes files cover small HYPER-RECTANGLES
of the key space, so predicates on EITHER dimension (or both) touch a
subset of files. ``tests/test_layout.py`` pins this: a rectangle
predicate over a z-clustered layout touches strictly fewer files than
over a single-column layout.

The bit-spreading kernel is plain integer shift/mask arithmetic —
identical in Spark and DuckDB — so z-values themselves sit under the
exact oracle gate (``zorder_event_cells``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# classic 16-bit → 32-bit bit-spread constants (x | x<<8 ... masked)
_SPREAD = [
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
]


def spread_bits16(c: Column) -> Column:
    """Spread the low 16 bits of ``c`` so bit i lands at position 2i."""
    # 64-bit arithmetic: the spread of 0xFFFF reaches bit 31 and the
    # y-side shift in morton2 reaches bit 32 — INT would wrap negative
    x = c.cast("long").bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def morton2(x: Column, y: Column) -> Column:
    """Interleave two 16-bit keys into one 32-bit Morton (Z-curve) key:
    even bits from x, odd bits from y."""
    return spread_bits16(x).bitwiseOR(F.shiftleft(spread_bits16(y), 1))


def spread_bits16_sql(expr: str) -> str:
    """The same spread kernel as ANSI/DuckDB SQL text (for oracles).
    The BIGINT cast mirrors the Spark kernel's `cast("long")`: an
    INT32 input would overflow DuckDB's left shift at 0x55555555<<1."""
    x = f"(CAST({expr} AS BIGINT) & 65535)"
    for shift, mask in _SPREAD:
        x = f"(({x} | ({x} << {shift})) & {mask})"
    return x


def morton2_sql(x_expr: str, y_expr: str) -> str:
    return f"({spread_bits16_sql(x_expr)} | ({spread_bits16_sql(y_expr)} << 1))"


def cluster_by_zorder(
    df: DataFrame, dims: Sequence[Column], n_partitions: int
) -> DataFrame:
    """Return ``df`` redistributed for multi-dimensional data skipping:
    range-partitioned and sorted within partitions by the Morton key of
    two bucketed dimension columns (each must already be in [0, 2^16)).

    Writing the result (one file per partition, or with
    ``maxRecordsPerFile``) yields files whose min/max stats cover small
    rectangles of (dim0, dim1) space — predicates on either dimension
    prune files. Purely a layout transform: row content is unchanged.
    """
    if len(dims) != 2:
        raise ValueError("cluster_by_zorder interleaves exactly 2 dimensions")
    z = morton2(dims[0], dims[1])
    return (
        df.withColumn("__z", z)
        .repartitionByRange(n_partitions, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
    )
