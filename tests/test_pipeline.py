"""End-to-end pipeline: extract→transform→validate→load→DQ on fixture
parquet; re-run idempotency; reject side-channel populated."""

from __future__ import annotations

import pytest

from data_pipeline_who_gho_spark.pipeline import PipelineConfig, run_pipeline
from data_pipeline_who_gho_spark.schemas import RAW_OBSERVATION


@pytest.fixture()
def sources(spark, tmp_path, raw_observations, raw_indicators, raw_countries):
    src = tmp_path / "src"
    spark.createDataFrame(raw_observations, RAW_OBSERVATION).write.parquet(str(src / "obs"))
    spark.createDataFrame(raw_indicators).write.parquet(str(src / "ind"))
    spark.createDataFrame(raw_countries).write.parquet(str(src / "cty"))
    return src


def _cfg(tmp_path, src, **kw):
    return PipelineConfig(
        warehouse_dir=str(tmp_path / "wh"),
        source_observations=str(src / "obs") + "/",
        source_indicators=str(src / "ind"),
        source_countries=str(src / "cty"),
        **kw,
    )


def test_pipeline_end_to_end(spark, tmp_path, sources):
    cfg = _cfg(tmp_path, sources)
    cfg.source_observations = str(sources / "obs")
    metrics = run_pipeline(spark, cfg)
    # 6 raw obs: 1 dup dropped, 1 null-key dropped -> 4 in the fact table
    assert metrics["row_count"] == 4
    assert metrics["null_key_rows"] == 0

    fact = spark.read.parquet(str(tmp_path / "wh" / "fact_observation"))
    assert fact.filter("observation_id = '3'").first()["time_dim"] == 2020
    dim_i = spark.read.parquet(str(tmp_path / "wh" / "dim_indicator"))
    assert dim_i.count() == 2
    dim_c = spark.read.parquet(str(tmp_path / "wh" / "dim_country"))
    assert dim_c.count() == 3


def test_pipeline_idempotent(spark, tmp_path, sources):
    cfg = _cfg(tmp_path, sources)
    cfg.source_observations = str(sources / "obs")
    cfg.full_reingest = True
    m1 = run_pipeline(spark, cfg)
    m2 = run_pipeline(spark, cfg)
    assert m1 == m2  # re-run is a no-op on the fact table


def test_pipeline_all_null_ids_uses_composite_key(spark, tmp_path, raw_observations):
    # clean_observations' composite-key fallback must flow through to the
    # upsert key — null observation_ids would otherwise crash the dup
    # guard or duplicate on re-run
    recs = [{**r, "Id": None} for r in raw_observations]
    src = tmp_path / "src_nullid"
    spark.createDataFrame(recs, RAW_OBSERVATION).write.parquet(str(src))
    cfg = PipelineConfig(
        warehouse_dir=str(tmp_path / "wh_nullid"),
        source_observations=str(src),
        full_reingest=True,
    )
    m1 = run_pipeline(spark, cfg)
    m2 = run_pipeline(spark, cfg)  # idempotent on the natural key
    assert m1 == m2 == {"row_count": 4, "null_key_rows": 0}


def test_pipeline_limit(spark, tmp_path, sources):
    cfg = _cfg(tmp_path, sources)
    cfg.source_observations = str(sources / "obs")
    cfg.limit = 1
    metrics = run_pipeline(spark, cfg)
    assert metrics["row_count"] == 1


def test_pipeline_mixed_null_ids_rerun_idempotent(spark, tmp_path):
    """A batch mixing non-null and NULL Id rows must stay idempotent:
    NULL-Id rows get a deterministic composite surrogate key, so
    re-running the batch cannot append duplicates (a NULL key never
    matches the merge anti-join)."""
    rows = [
        {"Id": "1", "IndicatorCode": "WHOSIS_000001", "SpatialDim": "USA",
         "SpatialDimType": "COUNTRY", "TimeDim": "2019", "TimeDimType": "YEAR",
         "NumericValue": "78.5", "Value": "78.5"},
        {"Id": None, "IndicatorCode": "WHOSIS_000001", "SpatialDim": "FRA",
         "SpatialDimType": "COUNTRY", "TimeDim": "2019", "TimeDimType": "YEAR",
         "NumericValue": "82.1", "Value": "82.1"},
    ]
    src = tmp_path / "src"
    spark.createDataFrame(rows, RAW_OBSERVATION).write.parquet(str(src / "obs"))
    cfg = PipelineConfig(
        warehouse_dir=str(tmp_path / "wh"),
        source_observations=str(src / "obs"),
        full_reingest=True,
    )
    m1 = run_pipeline(spark, cfg)
    m2 = run_pipeline(spark, cfg)
    assert m1["row_count"] == 2 and m2["row_count"] == 2
    fact = spark.read.parquet(str(tmp_path / "wh" / "fact_observation"))
    ids = sorted(r["observation_id"] for r in fact.collect())
    assert ids == ["1", "ck:WHOSIS_000001:FRA:2019"]
