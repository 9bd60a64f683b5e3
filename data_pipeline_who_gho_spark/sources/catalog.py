"""Table catalog over the driver-provided parquet fixtures.

The reference's catalog is a Postgres schema (``etl/models.py``); ours is
parquet-at-rest read through Spark's vectorized reader, which gives
predicate pushdown, column pruning and partition pruning for free via
Catalyst. Register once per session; every query plans against the views.
"""

from __future__ import annotations

import os
import threading

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


# Timestamp columns in the fixtures; generators have shipped them both as
# parquet TIMESTAMP(NANOS) (Spark reads as long under nanosAsLong) and as
# TIMESTAMP(MICROS, isAdjustedToUTC=false) (Spark 4 infers TIMESTAMP_NTZ).
# Both are normalized at load to TIMESTAMP_LTZ whose epoch-micros equal the
# stored naive value — exactly DuckDB's epoch_us on the same parquet, so
# oracle parity holds and unix_micros()-based plans work unchanged.
_TS_COLUMNS = {"events": ["ts"]}


# Set only while resolving the read (parquet footer → Spark schema is
# eager), then restored: leaking them into the session changes how OTHER
# tables' NTZ columns resolve (e.g. orders.o_orderdate flips NTZ→LTZ,
# altering its pushed filters). Deferred execution of the returned plan
# does not re-consult either conf — verified for both the nanos and the
# micros fixture encodings.
_READ_CONFS = {
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # read isAdjustedToUTC=false micros as LTZ (raw micros = epoch),
    # tz-independent — no session-zone shift is applied at scan time
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
}

# The confs are session-wide: a concurrent schema resolution on another
# thread (threaded driver, parallel bench) inside the set/restore window
# would see NTZ columns resolve as LTZ. Serialize the window.
_READ_CONF_LOCK = threading.Lock()


def ntz_as_utc(col):
    """Reinterpret a TIMESTAMP_NTZ wall clock as a UTC instant.

    NOT ``to_utc_timestamp(col, 'UTC')`` — Spark first implicitly casts
    NTZ→LTZ via the SESSION zone, after which to_utc_timestamp(·,'UTC')
    is the identity, leaving the value shifted by the session offset.
    ``convert_timezone`` moves the NTZ wall clock UTC→session zone first,
    so the implicit cast lands on the correct instant under any session
    timezone."""
    return F.convert_timezone(F.lit("UTC"), F.expr("current_timezone()"), col).cast(
        "timestamp"
    )


# Resolved-DataFrame memo: ``spark.read.parquet`` resolves the footer
# schema eagerly (a py4j round-trip plus a file read) and every query
# builder calls load_table 1-5 times, so a bench pass re-resolves the
# same ten fixture tables dozens of times per second of actual work.
# A DataFrame handle is an immutable logical plan — reusing it changes
# no semantics. Keyed by (applicationId, path, mtime_ns): a new session
# misses, and a rewritten fixture (tests regenerate parquet under tmp
# paths) bumps mtime and misses too. Bounded: drop wholesale past 512
# entries (handles are plan objects, not data; the bound only caps dead
# sessions' leftovers).
_TABLE_MEMO: dict[tuple[str, str, int], DataFrame] = {}
_TABLE_MEMO_MAX = 512


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table. Parquet scan → pushdown/pruning come free.

    Shared-handle contract (memoized): repeated loads of the same table
    return the IDENTICAL DataFrame object, so a self-join of two
    load_table results must ``.alias()`` each side and join via string
    conditions — attribute-style conditions (``a['c'] == b['c']``) on
    the shared handle would hit AMBIGUOUS_SELF_JOIN or compare a column
    with itself."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    try:
        mtime = os.stat(path).st_mtime_ns
    except OSError:
        mtime = -1
    key = (spark.sparkContext.applicationId, os.path.abspath(path), mtime)
    hit = _TABLE_MEMO.get(key)
    if hit is not None:
        return hit
    df = _load_table_uncached(spark, path, name)
    if len(_TABLE_MEMO) >= _TABLE_MEMO_MAX:
        _TABLE_MEMO.clear()
    _TABLE_MEMO[key] = df
    return df


def _load_table_uncached(spark: SparkSession, path: str, name: str) -> DataFrame:
    if name not in _TS_COLUMNS:
        return spark.read.parquet(path)
    # dynamic confs: work even on sessions we didn't build (the
    # correctness driver hands us its own SparkSession)
    with _READ_CONF_LOCK:
        prior: dict[str, str | None] = {}
        for k, v in _READ_CONFS.items():
            try:
                prior[k] = spark.conf.get(k)
            except Exception:
                prior[k] = None
            spark.conf.set(k, v)
        try:
            df = spark.read.parquet(path)
        finally:
            for k, old in prior.items():
                if old is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, old)
    for c in _TS_COLUMNS.get(name, []):
        if isinstance(df.schema[c].dataType, T.LongType):
            # integer div (not /1000.0): epoch-nanos exceed double's 2^53
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
        elif isinstance(df.schema[c].dataType, T.TimestampNTZType):
            # fallback if the scan already materialized NTZ (e.g. a view
            # registered before this conf was set)
            df = df.withColumn(c, ntz_as_utc(F.col(c)))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register all fixture tables as temp views for the SQL surface (EP3)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs


def spread_by_hash(df: DataFrame, *key_cols: str) -> DataFrame:
    """Spread an under-partitioned scan for expensive JVM map/agg work,
    hash-partitioned on a deterministic key.

    Same trigger as :func:`spread_for_python` (fixture parquet ships ONE
    row group per file, so a scan-fused stage runs on one core; at
    production scale the guard makes this a no-op), but for JVM
    expression stages: keyless ``repartition(n)`` pays the
    sort-before-repartition pass (SPARK-23207) that round-robin needs
    for retry determinism, while hashing a deterministic high-cardinality
    key skips the sort AND is retry-safe (guide §2.5 / SPARK-38388 —
    never derive the key from rand()). Measured: the keyless form kept
    only ~0.2 s of agg_pricing_summary's 1.0 s, the hash form 0.45 s."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target, F.xxhash64(*key_cols))
    return df


def spread_for_python(df: DataFrame) -> DataFrame:
    """Give a Python-heavy (mapInPandas / applyInPandas) stage enough
    partitions to use every core.

    Spark sizes parquet splits as max(openCostInBytes,
    totalSize/defaultParallelism): a small id/text table scans as 1-2
    splits, which is CORRECT for the scan but then caps the expensive
    Arrow stage built on top of it at 1-2 concurrent tasks — measured
    live: the whole synthesized-payload codec family was running on 1
    of 32 cores (flac_decode_stats 38 s at sf1 for ~2 s of actual
    codec work).  Repartitioning the narrow input (8-byte ids, or
    ids+text) is trivially cheap next to per-row Python work.

    Only acts when the scan is UNDER-partitioned: at production scale,
    where payload-bearing tables have real row-group parallelism, this
    is a no-op and the plan is unchanged."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
