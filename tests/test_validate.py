from __future__ import annotations

from data_pipeline_who_gho_spark.operators.validate import (
    castable,
    country_rules,
    observation_rules,
    required,
    validate_split,
)
from data_pipeline_who_gho_spark.schemas import RAW_OBSERVATION


def test_split_counts(spark, raw_observations):
    df = spark.createDataFrame(raw_observations, RAW_OBSERVATION)
    res = validate_split(df, observation_rules())
    # row 5 fails required IndicatorCode; row 4 fails NumericValue castable
    assert res.validated.count() == 4
    assert res.rejected.count() == 2


def test_rejected_carries_errors(spark, raw_observations):
    df = spark.createDataFrame(raw_observations, RAW_OBSERVATION)
    res = validate_split(df, observation_rules())
    errs = {r["error_details"] for r in res.rejected.collect()}
    assert any("IndicatorCode is required" in e for e in errs)
    assert any("NumericValue must be double" in e for e in errs)
    for r in res.rejected.collect():
        assert r["record_data"].startswith("{")  # JSON payload preserved


def test_country_null_code_rejected(spark, raw_countries):
    recs = raw_countries + [{"Code": None, "Title": "Atlantis"}]
    res = validate_split(spark.createDataFrame(recs), country_rules())
    assert res.rejected.count() == 1
    assert res.validated.count() == 4


def test_castable_allows_null(spark):
    df = spark.createDataFrame([("1",), (None,), ("x",)], "v STRING")
    res = validate_split(df, [castable("v", "int")])
    assert res.validated.count() == 2
    assert res.rejected.count() == 1


def test_multiple_failures_concatenated(spark):
    df = spark.createDataFrame([(None, "bad")], "a STRING, b STRING")
    res = validate_split(df, required(["a"]) + [castable("b", "double")])
    err = res.rejected.first()["error_details"]
    assert "a is required" in err and "b must be double" in err
