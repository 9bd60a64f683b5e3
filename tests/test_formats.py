"""File-format surface: CSV / JSON / ORC round-trips through the engine's
readers (SURVEY §2c: the reference only used JSON intermediates; Spark
gives the rest natively — verify they behave with our schemas)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_who_gho_spark.schemas import RAW_OBSERVATION


def _obs_df(spark, raw_observations):
    return spark.createDataFrame(raw_observations, RAW_OBSERVATION)


def test_json_roundtrip_with_schema(spark, tmp_path, raw_observations):
    df = _obs_df(spark, raw_observations)
    p = str(tmp_path / "obs_json")
    df.write.json(p)
    back = spark.read.schema(RAW_OBSERVATION).json(p)
    assert back.count() == len(raw_observations)
    # missing-field tolerance: absent fields surface as nulls (T2 parity)
    partial = spark.read.schema(RAW_OBSERVATION).json(
        spark.sparkContext.parallelize(['{"Id": "9", "IndicatorCode": "Z"}'])
    )
    row = partial.first()
    assert row["Id"] == "9" and row["Value"] is None


def test_csv_roundtrip(spark, tmp_path, raw_observations):
    df = _obs_df(spark, raw_observations)
    p = str(tmp_path / "obs_csv")
    df.write.option("header", True).csv(p)
    back = spark.read.schema(RAW_OBSERVATION).option("header", True).csv(p)
    assert back.count() == len(raw_observations)
    assert back.filter(F.col("TimeDim") == "2020-2020").count() == 1


def test_orc_roundtrip(spark, tmp_path, raw_observations):
    df = _obs_df(spark, raw_observations)
    p = str(tmp_path / "obs_orc")
    df.write.orc(p)
    back = spark.read.orc(p)
    assert back.count() == len(raw_observations)
    assert back.schema == df.schema


def test_corrupt_json_quarantine(spark, tmp_path):
    """DLQ pattern: corrupt records surface in _corrupt_record instead of
    failing the read (the rejected_record side-channel at the scan)."""
    from pyspark.sql import types as T

    schema = T.StructType(RAW_OBSERVATION.fields + [T.StructField("_corrupt_record", T.StringType(), True)])
    lines = ['{"Id": "1", "IndicatorCode": "X"}', "{not json at all"]
    df = spark.read.schema(schema).option("columnNameOfCorruptRecord", "_corrupt_record").json(
        spark.sparkContext.parallelize(lines)
    )
    rows = df.collect()
    good = [r for r in rows if r["_corrupt_record"] is None]
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert len(good) == 1 and len(bad) == 1


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """Schema evolution at the scan: batches written before a column
    existed read back as NULL for that column under mergeSchema — the
    L1 'migration' story for parquet-at-rest (new columns never require
    rewriting history)."""
    from pyspark.sql import functions as F

    p = str(tmp_path / "evolving")
    v1 = spark.createDataFrame([(1, "a")], "id INT, name STRING")
    v1.write.parquet(p + "/batch=1")
    v2 = spark.createDataFrame([(2, "b", 9.5)], "id INT, name STRING, score DOUBLE")
    v2.write.parquet(p + "/batch=2")

    merged = spark.read.option("mergeSchema", "true").parquet(p)
    assert set(merged.columns) >= {"id", "name", "score"}
    rows = {r["id"]: r for r in merged.collect()}
    assert rows[1]["score"] is None   # pre-evolution rows -> NULL
    assert rows[2]["score"] == 9.5
    # and the evolved column is filterable with pushdown intact
    assert merged.filter(F.col("score") > 9).count() == 1
