"""Bucketed interval-overlap join: exactness vs the theta join,
bucket-boundary edges, and closed-endpoint semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_who_gho_spark.operators.interval import interval_overlap_join


def _pairs(df):
    return {(r["id_a"], r["id_b"], r["overlap_us"]) for r in df.collect()}


def test_interval_overlap_matches_theta_join(spark):
    import random

    rnd = random.Random(11)
    rows = []
    for i in range(300):
        s = rnd.randrange(0, 1_000_000)
        rows.append((i, f"k{i % 5}", s, s + rnd.randrange(0, 120_000)))
    df = spark.createDataFrame(rows, "id LONG, k STRING, s LONG, e LONG")
    got = _pairs(
        interval_overlap_join(df, key="k", id_col="id", start_us="s", end_us="e",
                              bucket_us=50_000)
    )
    a, b = df.alias("a"), df.alias("b")
    want = {
        (r["id_a"], r["id_b"], r["overlap_us"])
        for r in a.join(
            b,
            (F.col("a.k") == F.col("b.k"))
            & (F.col("a.id") < F.col("b.id"))
            & (F.col("a.s") <= F.col("b.e"))
            & (F.col("b.s") <= F.col("a.e")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            (
                F.least(F.col("a.e"), F.col("b.e"))
                - F.greatest(F.col("a.s"), F.col("b.s"))
            ).alias("overlap_us"),
        )
        .collect()
    }
    assert got == want


def test_interval_touching_endpoints_count_as_overlap(spark):
    # closed intervals: [0, 10] and [10, 20] share exactly the instant 10
    df = spark.createDataFrame(
        [(1, "k", 0, 10), (2, "k", 10, 20), (3, "k", 21, 30)],
        "id LONG, k STRING, s LONG, e LONG",
    )
    got = _pairs(
        interval_overlap_join(df, key="k", id_col="id", start_us="s", end_us="e",
                              bucket_us=7)
    )
    assert got == {(1, 2, 0)}


def test_interval_spanning_many_buckets_found_once(spark):
    # one long interval crosses many buckets; the pair appears exactly once
    df = spark.createDataFrame(
        [(1, "k", 0, 1000), (2, "k", 995, 999)],
        "id LONG, k STRING, s LONG, e LONG",
    )
    out = interval_overlap_join(df, key="k", id_col="id", start_us="s",
                                end_us="e", bucket_us=10)
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["overlap_us"] == 4
