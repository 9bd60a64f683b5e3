"""global_rank / ntile_from_rank: equivalence with the single-partition
window idiom, and the plan property that motivates them (no unpartitioned
window over the data)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from data_pipeline_who_gho_spark.operators.rank import global_rank, ntile_from_rank
from data_pipeline_who_gho_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def _scored(spark):
    return load_table(spark, SF, "events").select("event_id", "value")


def test_global_rank_matches_window_row_number(spark):
    df = _scored(spark)
    got = {
        (r["event_id"], r["rn"])
        for r in global_rank(df, ["value", "event_id"], partitions=8).collect()
    }
    w = Window.orderBy("value", "event_id")
    want = {
        (r["event_id"], r["rn"])
        for r in df.withColumn("rn", F.row_number().over(w).cast("long")).collect()
    }
    assert got == want


def test_ntile_from_rank_matches_window_ntile(spark):
    df = _scored(spark)
    ranked = global_rank(df, ["value", "event_id"], partitions=8)
    total = df.agg(F.count(F.lit(1)).alias("total"))
    got = {
        (r["event_id"], r["phase"])
        for r in ranked.crossJoin(F.broadcast(total))
        .select("event_id", ntile_from_rank(F.col("rn"), F.col("total"), 7).alias("phase"))
        .collect()
    }
    w = Window.orderBy("value", "event_id")
    want = {
        (r["event_id"], r["phase"])
        for r in df.withColumn("phase", F.ntile(7).over(w)).collect()
    }
    assert got == want


def test_global_rank_avoids_single_partition_window(spark):
    """The whole point: the only window in the plan is partitioned by
    the range-partition id, so ranking parallelizes. An unpartitioned
    `row_number() OVER (ORDER BY ...)` would show a windowspecdefinition
    with no partition expressions over the full data."""
    plan = global_rank(
        _scored(spark), ["value", "event_id"], partitions=8
    )._jdf.queryExecution().optimizedPlan().toString()
    for line in plan.splitlines():
        if "windowspecdefinition" in line and "__pid" not in line:
            # the offsets window runs over #partitions count rows only
            assert "__n" in line or "__off" in line, line


def test_ntile_from_rank_equals_ansi_ntile_across_shapes(spark):
    """Sweep the REAL ntile_from_rank expression against ANSI
    F.ntile for every corpus size 1..60 and several tile counts — the
    arithmetic two registered queries (perplexity_buckets,
    curriculum_phases) rest on. One Spark job per tile count, all
    shapes at once (rows partitioned by their synthetic total)."""
    from pyspark.sql import Window

    rows = [(total, rn) for total in range(1, 61) for rn in range(1, total + 1)]
    df = spark.createDataFrame(rows, "total INT, rn INT")
    for n in (2, 3, 5, 7):
        got = df.select(
            "total", "rn",
            ntile_from_rank(F.col("rn"), F.col("total"), n).alias("mine"),
        )
        w = Window.partitionBy("total").orderBy("rn")
        want = df.withColumn("ansi", F.ntile(n).over(w))
        joined = got.join(want, ["total", "rn"])
        assert joined.filter(F.col("mine") != F.col("ansi")).count() == 0


def test_reserved_temp_name_collision_raises(spark):
    """Both rank ops inject __pid/__lsum/... temp columns; a caller
    frame already carrying one must fail loudly, not corrupt sums
    (ADVICE r07)."""
    import pytest

    from data_pipeline_who_gho_spark.operators.rank import grouped_running_sum

    df = spark.createDataFrame([(1, 1, "a")], "k INT, v INT, __pid STRING")
    with pytest.raises(ValueError, match="__pid"):
        global_rank(df, ["k"])
    with pytest.raises(ValueError, match="__pid"):
        grouped_running_sum(df, ["k"], ["k"], "v")
    df2 = spark.createDataFrame([(1, 1, "a")], "k INT, v INT, __og_k STRING")
    with pytest.raises(ValueError, match="__og_k"):
        grouped_running_sum(df2, ["k"], ["k"], "v")
    # out_col/rank_col collisions count too
    df3 = spark.createDataFrame([(1, 1)], "k INT, rn INT")
    with pytest.raises(ValueError, match="rn"):
        global_rank(df3, ["k"])
