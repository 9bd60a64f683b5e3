"""Q1/Q2: post-load data-quality gate.

Mirrors the DAG's two inline SQL assertions
(``dags/who_gho_etl_dag.py:194-206``): table non-empty, and zero nulls in
the declared key columns. Raising fails the run — same observable contract
as the reference's task failure + alert email.

Both checks are single aggregations; Spark plans them as partial+final
count with no data movement beyond one scalar per partition.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class DataQualityError(AssertionError):
    """A DQ constraint was violated (reference: raise → task fail → email)."""


def check_not_empty(df: DataFrame, name: str = "table") -> int:
    """Q1: SELECT COUNT(*) must be > 0 (who_gho_etl_dag.py:194-198)."""
    n = df.count()
    if n == 0:
        raise DataQualityError(f"DQ failed: {name} is empty")
    return n


def check_no_null_keys(df: DataFrame, keys: Sequence[str], name: str = "table") -> int:
    """Q2: zero rows with null in any key column (who_gho_etl_dag.py:200-206).

    Single pass: conditional count instead of a filter+count re-scan.
    """
    if not keys:
        raise ValueError("check_no_null_keys requires at least one key column")
    cond = None
    for k in keys:
        c = F.col(k).isNull()
        cond = c if cond is None else (cond | c)
    bad = df.select(F.count(F.when(cond, F.lit(1))).alias("bad")).first()["bad"]
    if bad:
        raise DataQualityError(f"DQ failed: {name} has {bad} rows with null keys {list(keys)}")
    return int(bad)


def run_dq_checks(df: DataFrame, keys: Sequence[str], name: str = "fact_observation") -> dict:
    """The reference's full DQ task (Q1 + Q2), fused into ONE scan: both
    metrics come from a single aggregation instead of the reference's two
    SQL statements — same fail-fast contract, half the table reads."""
    if not keys:
        raise ValueError("run_dq_checks requires at least one key column")
    cond = None
    for k in keys:
        c = F.col(k).isNull()
        cond = c if cond is None else (cond | c)
    row = df.select(
        F.count(F.lit(1)).alias("row_count"),
        F.count(F.when(cond, F.lit(1))).alias("null_key_rows"),
    ).first()
    if row["row_count"] == 0:
        raise DataQualityError(f"DQ failed: {name} is empty")
    if row["null_key_rows"]:
        raise DataQualityError(
            f"DQ failed: {name} has {row['null_key_rows']} rows with null keys {list(keys)}"
        )
    return {"row_count": row["row_count"], "null_key_rows": int(row["null_key_rows"])}


def observed_dq(df: DataFrame, keys: Sequence[str], name: str = "fact_observation"):
    """Zero-extra-pass DQ: attach both Q1/Q2 metrics as a Spark
    ``Observation`` so they are collected as a by-product of whatever
    action consumes ``df`` (typically the load write) — at 100 TB this
    saves the two post-load scans the reference's DQ task performs.

    Returns ``(observed_df, finish)``: run an action on ``observed_df``,
    then call ``finish()`` to validate (raising :class:`DataQualityError`
    on violation, like the eager checks) and get the metric dict.
    """
    from pyspark.sql import Observation

    if not keys:
        raise ValueError("observed_dq requires at least one key column")
    obs = Observation(f"dq_{name}")
    cond = None
    for k in keys:
        c = F.col(k).isNull()
        cond = c if cond is None else (cond | c)
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("row_count"),
        F.count(F.when(cond, F.lit(1))).alias("null_key_rows"),
    )

    def finish() -> dict:
        m = obs.get
        if m["row_count"] == 0:
            raise DataQualityError(f"DQ failed: {name} is empty")
        if m["null_key_rows"]:
            raise DataQualityError(
                f"DQ failed: {name} has {m['null_key_rows']} rows with null keys {list(keys)}"
            )
        return dict(m)

    return observed, finish
