"""Runtime-adaptivity guards: AQE skew-join splitting and runtime bloom
filters actually engage on this engine's session. These are the
cluster-scale safety nets the 100 TB posture leans on (salting in
operators/skew.py is the *planned* mitigation; AQE is the *runtime* one)
— a Spark upgrade or conf regression that silently disables them would
only surface in production, so pin them here.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import functions as F


@contextmanager
def _confs(spark, **kv):
    old = {}
    for k, v in kv.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_aqe_splits_skewed_join_partition(spark):
    """A 90%-hot key must trigger AQE's skew-join split (skew=true in the
    final adaptive plan) once the join is forced to sort-merge."""
    with _confs(
        spark,
        **{
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
            "spark.sql.adaptive.coalescePartitions.enabled": "false",
        },
    ):
        big = spark.range(0, 100000).select(
            F.when(F.col("id") % 10 < 9, F.lit(0)).otherwise(F.col("id")).alias("k"),
            F.concat(F.lit("x" * 48), F.col("id").cast("string")).alias("pad"),
        )
        right = spark.range(0, 100000).select(
            F.col("id").alias("k"), F.lit("r").alias("tag")
        )
        j = big.join(right, "k").select(F.substring("pad", 1, 1).alias("p"))
        assert len(j.collect()) == 100000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "SortMergeJoin(skew=true)" in plan
        assert "AQEShuffleRead skewed" in plan


def test_runtime_bloom_filter_injected_for_selective_dim(spark):
    """A selective filter on the dim side of a shuffle join must inject a
    bloom filter onto the fact side (pre-shuffle row pruning)."""
    with _confs(
        spark,
        **{
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        },
    ):
        dim = spark.range(0, 400000).select(
            F.col("id").alias("k"), (F.col("id") % 97).alias("attr")
        )
        fact = spark.range(0, 400000).select(
            (F.col("id") % 400000).alias("k"), F.col("id").alias("v")
        )
        q = fact.join(dim.filter(F.col("attr") == 3), "k")
        plan = q._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom" in plan.lower()
