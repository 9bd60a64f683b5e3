"""Table catalog over the driver-provided parquet fixtures.

The reference's catalog is a Postgres schema (``etl/models.py``); ours is
parquet-at-rest read through Spark's vectorized reader, which gives
predicate pushdown, column pruning and partition pruning for free via
Catalyst. Register once per session; every query plans against the views.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# Columns stored as parquet TIMESTAMP(NANOS), which Spark reads as long
# (nanosAsLong); converted to µs timestamps at load. DuckDB truncates the
# same way when fetching TIMESTAMP_NS, so oracle parity holds.
_NANOS_TS_COLUMNS = {"events": ["ts"]}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table. Parquet scan → pushdown/pruning come free."""
    if name in _NANOS_TS_COLUMNS:
        # dynamic conf: works even on sessions we didn't build (the
        # correctness driver hands us its own SparkSession)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for c in _NANOS_TS_COLUMNS.get(name, []):
        if isinstance(df.schema[c].dataType, T.LongType):
            # integer div (not /1000.0): epoch-nanos exceed double's 2^53
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register all fixture tables as temp views for the SQL surface (EP3)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
