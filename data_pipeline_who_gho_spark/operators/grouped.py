"""Grouped-map operator via ``applyInPandas`` — the batch escape hatch
for per-group algorithms that need the whole group in memory as a pandas
frame (per-entity model fits, resampling, group-local normalization).

Used sparingly by design: if the semantics fit window/agg expressions,
those stay JVM-side and win. The example here — per-group min-max
normalization — exists to pin the Arrow group-map mechanics (schema,
grouping, empty groups) with tests; swap the body for real per-group
models on a cluster.

Scale: one shuffle on the group key; each group must fit one executor's
memory — callers with mega-groups should pre-aggregate or salt first.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame


def normalize_per_group(df: DataFrame, key: str, value: str) -> DataFrame:
    """Min-max normalize ``value`` within each ``key`` group → [0, 1]
    (constant groups → 0.0)."""
    schema = f"{key} {dict(df.dtypes)[key]}, {value} double, normalized double"

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf[value].astype(float)
        lo, hi = v.min(), v.max()
        norm = (v - lo) / (hi - lo) if hi > lo else v * 0.0
        return pd.DataFrame({key: pdf[key], value: v, "normalized": norm})

    return df.select(key, value).groupBy(key).applyInPandas(fn, schema)
