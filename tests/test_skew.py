from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_who_gho_spark.operators.skew import salted_agg


def test_salted_agg_matches_plain(spark):
    # heavily skewed: 90% of rows share one key
    rows = [("hot", float(i)) for i in range(900)] + [
        (f"k{i % 10}", float(i)) for i in range(100)
    ]
    df = spark.createDataFrame(rows, "k STRING, v DOUBLE")
    salted = salted_agg(
        df,
        ["k"],
        {
            "total": ("sum", F.sum(F.col("v").cast("decimal(18,2)"))),
            "n": ("sum", F.count(F.lit(1))),
            "vmax": ("max", F.max("v")),
        },
        salt_buckets=8,
    )
    plain = df.groupBy("k").agg(
        F.sum(F.col("v").cast("decimal(18,2)")).alias("total"),
        F.count(F.lit(1)).alias("n"),
        F.max("v").alias("vmax"),
    )
    s = {r["k"]: (r["total"], r["n"], r["vmax"]) for r in salted.collect()}
    p = {r["k"]: (r["total"], r["n"], r["vmax"]) for r in plain.collect()}
    assert s == p


def test_salted_agg_spreads_hot_key(spark):
    df = spark.createDataFrame([("hot", 1.0)] * 500, "k STRING, v DOUBLE")
    out = salted_agg(df, ["k"], {"n": ("sum", F.count(F.lit(1)))}, salt_buckets=4)
    assert out.collect() == [("hot", 500)] or out.first()["n"] == 500


def test_salted_join_matches_plain_join(spark):
    from data_pipeline_who_gho_spark.operators.skew import salted_join

    # skewed: 90% of left rows share one key
    left = spark.range(0, 2000).selectExpr(
        "id", "CASE WHEN id % 10 < 9 THEN 'hot' ELSE concat('k', id % 7) END AS k"
    )
    right = spark.createDataFrame(
        [("hot", 1.5), ("k1", 2.0), ("k3", 3.0), ("absent", 9.9)], "k STRING, w DOUBLE"
    )
    for how in ("inner", "left"):
        want = {(r["id"], r["w"]) for r in left.join(right, "k", how).collect()}
        got = {
            (r["id"], r["w"])
            for r in salted_join(left, right, ["k"], how=how, salt_buckets=8).collect()
        }
        assert got == want, how


def test_salted_join_rejects_right_outer(spark):
    import pytest as _pytest

    from data_pipeline_who_gho_spark.operators.skew import salted_join

    left = spark.range(5).selectExpr("id", "'a' AS k")
    right = spark.createDataFrame([("a", 1.0)], "k STRING, w DOUBLE")
    with _pytest.raises(ValueError):
        salted_join(left, right, ["k"], how="right")


def test_salted_join_spreads_hot_key(spark):
    """The physical join keys include the salt, so a hot key hashes to
    many reducers instead of one."""
    from data_pipeline_who_gho_spark.operators.skew import salted_join

    left = spark.range(0, 1000).selectExpr("id", "'hot' AS k")
    right = spark.createDataFrame([("hot", 1.0)], "k STRING, w DOUBLE")
    plan = salted_join(left, right, ["k"], salt_buckets=8)._jdf.queryExecution().optimizedPlan().toString()
    assert "__salt" in plan


def test_skew_safe_event_rollup_matches_plain(spark):
    """The registered rollup equals the single plain groupBy answer."""
    from data_pipeline_who_gho_spark.plans.scale_ops import (
        skew_safe_event_rollup,
    )
    from data_pipeline_who_gho_spark.sources.catalog import load_table

    sf = "/root/testdata/sf0.001"
    got = {r["event_type"]: r.asDict() for r in skew_safe_event_rollup(spark, sf).collect()}
    ev = load_table(spark, sf, "events")
    want = {
        r["event_type"]: r.asDict()
        for r in ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            F.sum(F.floor(F.col("value") * 1000000.0).cast("long"))
            .cast("long")
            .alias("value_micro_total"),
        )
        .collect()
    }
    assert got == want


def test_salted_join_enrich_partner_consistency(spark):
    """partner_events sums each joining user's total count, so the
    corpus-wide sum equals sum over users of user_events²."""
    from data_pipeline_who_gho_spark.plans.scale_ops import salted_join_enrich
    from data_pipeline_who_gho_spark.sources.catalog import load_table

    sf = "/root/testdata/sf0.001"
    rows = salted_join_enrich(spark, sf).collect()
    ev = load_table(spark, sf, "events")
    n = ev.count()
    assert sum(r["n_events"] for r in rows) == n
    sq = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.sum(F.col("c") * F.col("c")).alias("s"))
        .collect()[0]["s"]
    )
    assert sum(r["partner_events"] for r in rows) == sq


def test_salted_join_hot_keys_matches_plain(spark):
    """Hot-key-targeted salting is row-identical to the plain join for
    inner AND left joins, with hot keys spread and cold keys untouched."""
    from data_pipeline_who_gho_spark.operators.skew import salted_join_hot_keys

    left = spark.createDataFrame(
        [("hot", i) for i in range(300)]
        + [(f"k{i % 5}", i) for i in range(50)]
        + [("orphan", -1)],
        "k STRING, v INT",
    )
    right = spark.createDataFrame(
        [("hot", 100), ("k0", 1), ("k1", 2), ("k9", 9)], "k STRING, w INT"
    )
    hot = spark.createDataFrame([("hot",)], "k STRING")
    for how in ("inner", "left"):
        plain = {
            tuple(r) for r in left.join(right, ["k"], how).collect()
        }
        salted = {
            tuple(r)
            for r in salted_join_hot_keys(
                left, right, ["k"], hot, how=how, salt_buckets=4
            ).collect()
        }
        assert salted == plain, how


def test_salted_join_hot_keys_rejects_outer(spark):
    import pytest

    from data_pipeline_who_gho_spark.operators.skew import salted_join_hot_keys

    df = spark.createDataFrame([("a", 1)], "k STRING, v INT")
    with pytest.raises(ValueError):
        salted_join_hot_keys(df, df, ["k"], df.select("k"), how="full")
