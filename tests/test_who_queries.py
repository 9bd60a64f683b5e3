"""Reference-query parity (EP3): build the warehouse with the pipeline,
then run the reference README's own analytics queries, re-targeted from
Postgres to the engine's SQL surface (README.md:139-162):

- A1/A2/A3: life-expectancy-over-time for one country via the two-dim join
- A4: latest-year value per indicator via scalar subquery

A reference user's SQL runs verbatim modulo connection string.
"""

from __future__ import annotations

import pytest

from data_pipeline_who_gho_spark.engine import Engine
from data_pipeline_who_gho_spark.pipeline import PipelineConfig, run_pipeline
from data_pipeline_who_gho_spark.schemas import RAW_OBSERVATION


@pytest.fixture()
def warehouse(spark, tmp_path):
    obs = [
        # Japan life-expectancy series + one other indicator/country as noise
        {"Id": "1", "IndicatorCode": "WHOSIS_000001", "SpatialDim": "JPN",
         "SpatialDimType": "COUNTRY", "TimeDim": "2018", "TimeDimType": "YEAR",
         "NumericValue": "84.1", "Value": "84.1"},
        {"Id": "2", "IndicatorCode": "WHOSIS_000001", "SpatialDim": "JPN",
         "SpatialDimType": "COUNTRY", "TimeDim": "2019", "TimeDimType": "YEAR",
         "NumericValue": "84.3", "Value": "84.3"},
        {"Id": "3", "IndicatorCode": "WHOSIS_000001", "SpatialDim": "USA",
         "SpatialDimType": "COUNTRY", "TimeDim": "2019", "TimeDimType": "YEAR",
         "NumericValue": "78.5", "Value": "78.5"},
        {"Id": "4", "IndicatorCode": "WHOSIS_000002", "SpatialDim": "JPN",
         "SpatialDimType": "COUNTRY", "TimeDim": "2019", "TimeDimType": "YEAR",
         "NumericValue": "74.1", "Value": "74.1"},
    ]
    ind = [
        {"IndicatorCode": "WHOSIS_000001", "IndicatorName": "Life expectancy at birth (years)", "Language": "EN"},
        {"IndicatorCode": "WHOSIS_000002", "IndicatorName": "Healthy life expectancy (HALE)", "Language": "EN"},
    ]
    cty = [{"Code": "JPN", "Title": "Japan"}, {"Code": "USA", "Title": "United States"}]

    src = tmp_path / "src"
    spark.createDataFrame(obs, RAW_OBSERVATION).write.parquet(str(src / "obs"))
    spark.createDataFrame(ind).write.parquet(str(src / "ind"))
    spark.createDataFrame(cty).write.parquet(str(src / "cty"))
    wh = str(tmp_path / "wh")
    run_pipeline(spark, PipelineConfig(
        warehouse_dir=wh,
        source_observations=str(src / "obs"),
        source_indicators=str(src / "ind"),
        source_countries=str(src / "cty"),
    ))
    return Engine(spark).attach_warehouse(wh)


def test_a1_a2_life_expectancy_series(warehouse):
    # README.md:139-150 query shape, verbatim semantics
    rows = warehouse.sql(
        """
        SELECT fo.time_dim AS year, fo.value AS life_expectancy
        FROM fact_observation fo
        JOIN dim_country dc ON fo.spatial_dim = dc.country_code
        JOIN dim_indicator di ON fo.indicator_code = di.indicator_code
        WHERE dc.country_name = 'Japan'
          AND di.indicator_name LIKE 'Life expectancy at birth%'
        ORDER BY fo.time_dim
        """
    ).collect()
    assert [(r["year"], r["life_expectancy"]) for r in rows] == [
        (2018, "84.1"), (2019, "84.3"),
    ]


def test_a4_latest_year_scalar_subquery(warehouse):
    # README.md:156-160: value at the global latest year for an indicator
    rows = warehouse.sql(
        """
        SELECT fo.spatial_dim AS country, fo.numeric_value AS value
        FROM fact_observation fo
        WHERE fo.indicator_code = 'WHOSIS_000001'
          AND fo.time_dim = (SELECT MAX(time_dim) FROM fact_observation
                             WHERE indicator_code = 'WHOSIS_000001')
        ORDER BY fo.spatial_dim
        """
    ).collect()
    assert [(r["country"], r["value"]) for r in rows] == [("JPN", 84.3), ("USA", 78.5)]


def test_engine_lists_views(warehouse):
    assert {"dim_country", "dim_indicator", "fact_observation"} <= set(warehouse.tables())
