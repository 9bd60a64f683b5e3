"""Vector column kernels for embedding similarity (array<float> columns).

Built on Catalyst higher-order functions (zip_with / aggregate), so the
math runs JVM-side per-row with no shuffle and no Python boundary. Floats
are widened to double once; all accumulation is left-to-right, matching
the DuckDB oracle's list functions element order.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(v: Column | str) -> Column:
    col = F.col(v) if isinstance(v, str) else v
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
