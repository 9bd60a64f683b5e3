"""Z-order clustering: kernel correctness + measured file-skipping win."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipeline_who_gho_spark.operators.layout import (
    cluster_by_zorder,
    morton2,
    spread_bits16,
)
from data_pipeline_who_gho_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.01"


def _interleave_ref(x: int, y: int) -> int:
    z = 0
    for i in range(16):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_morton_kernel_matches_reference(spark):
    cases = [(0, 0), (1, 0), (0, 1), (65535, 65535), (12345, 54321), (255, 256)]
    df = spark.createDataFrame(cases, "x INT, y INT").withColumn(
        "z", morton2(F.col("x"), F.col("y"))
    )
    got = {(r["x"], r["y"]): r["z"] for r in df.collect()}
    for x, y in cases:
        assert got[(x, y)] == _interleave_ref(x, y)


def test_spread_masks_high_bits(spark):
    # only the low 16 bits participate: 2^16 + 3 spreads like 3
    df = spark.createDataFrame([(65539,)], "x INT").select(
        spread_bits16(F.col("x")).alias("s")
    )
    assert df.collect()[0]["s"] == 0b101


def test_zorder_layout_skips_files(spark, tmp_path):
    """A rectangle predicate on (user bucket, day) must touch strictly
    fewer files under z-order than under an unrelated single-column
    sort — the measurable form of multi-dimensional data skipping."""
    ev = load_table(spark, SF, "events").select(
        "event_id", "user_id", F.dayofyear("ts").alias("day")
    )
    n_files = 32

    plain = ev.repartitionByRange(n_files, "event_id")  # layout blind to (user, day)
    zed = cluster_by_zorder(ev, [F.col("user_id"), F.col("day")], n_files)

    paths = {}
    for name, df in [("plain", plain), ("zorder", zed)]:
        p = str(tmp_path / name)
        df.write.mode("overwrite").parquet(p)
        paths[name] = p

    # fixture ranges: user_id 0..149, day-of-year 1..30
    pred = (
        (F.col("user_id") >= 10) & (F.col("user_id") < 20)
        & (F.col("day") >= 5) & (F.col("day") < 12)
    )

    def files_touched(path: str) -> int:
        return (
            spark.read.parquet(path)
            .filter(pred)
            .select(F.input_file_name().alias("f"))
            .distinct()
            .count()
        )

    # same rows either way (layout is content-preserving) ...
    assert (
        spark.read.parquet(paths["plain"]).filter(pred).count()
        == spark.read.parquet(paths["zorder"]).filter(pred).count()
        > 0
    )
    # ... but the z-clustered layout confines them to few files
    assert files_touched(paths["zorder"]) < files_touched(paths["plain"])


def test_cluster_requires_two_dims(spark):
    ev = load_table(spark, SF, "events")
    with pytest.raises(ValueError):
        cluster_by_zorder(ev, [F.col("user_id")], 8)
