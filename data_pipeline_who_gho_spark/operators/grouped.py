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


def cogroup_coverage(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_col: str,
    right_col: str,
) -> DataFrame:
    """Two-sided grouped-map via ``cogroup(...).applyInPandas`` — the
    escape hatch when BOTH sides of a key need to meet as pandas frames
    (per-entity reconciliation, custom as-of logic, model scoring against
    per-key reference data). Emits per-key counts and the value coverage
    ratio |left ∩ right| / |left| over the two column sets.

    Scale: both sides shuffle once on the key (co-partitioned by the
    cogroup), each key's pair of groups must fit one executor — same
    contract as applyInPandas, doubled.
    """
    schema = (
        f"{key} {dict(left.dtypes)[key]}, n_left long, n_right long, coverage double"
    )

    def fn(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        if lpdf.empty and rpdf.empty:
            return pd.DataFrame(columns=[key, "n_left", "n_right", "coverage"])
        k = lpdf[key].iloc[0] if not lpdf.empty else rpdf[key].iloc[0]
        lvals = set(lpdf[left_col]) if not lpdf.empty else set()
        rvals = set(rpdf[right_col]) if not rpdf.empty else set()
        cov = len(lvals & rvals) / len(lvals) if lvals else 0.0
        return pd.DataFrame(
            {
                key: [k],
                "n_left": [len(lpdf)],
                "n_right": [len(rpdf)],
                "coverage": [cov],
            }
        )

    return (
        left.select(key, left_col)
        .groupBy(key)
        .cogroup(right.select(key, right_col).groupBy(key))
        .applyInPandas(fn, schema)
    )
