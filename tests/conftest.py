"""Shared fixtures.

``raw_*`` fixtures mirror the reference's test corpus
(``/root/reference/tests/conftest.py:8-34``): 6 observations (one exact
duplicate Id, one null NumericValue with text Value, one "2020-2020"
range year), 3 indicators (1 dup), 4 countries (1 dup).
"""

from __future__ import annotations

import pytest

from data_pipeline_who_gho_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", shuffle_partitions=4)
    yield s


@pytest.fixture()
def raw_observations():
    return [
        {"Id": "1", "IndicatorCode": "WHOSIS_000001", "SpatialDim": "USA",
         "SpatialDimType": "COUNTRY", "TimeDim": "2019", "TimeDimType": "YEAR",
         "NumericValue": "78.5", "Value": "78.5"},
        {"Id": "1", "IndicatorCode": "WHOSIS_000001", "SpatialDim": "USA",
         "SpatialDimType": "COUNTRY", "TimeDim": "2019", "TimeDimType": "YEAR",
         "NumericValue": "78.5", "Value": "78.5"},  # exact duplicate Id
        {"Id": "2", "IndicatorCode": "WHOSIS_000001", "SpatialDim": "FRA",
         "SpatialDimType": "COUNTRY", "TimeDim": "2019", "TimeDimType": "YEAR",
         "NumericValue": None, "Value": "No data"},  # null numeric, text value
        {"Id": "3", "IndicatorCode": "WHOSIS_000001", "SpatialDim": "GBR",
         "SpatialDimType": "COUNTRY", "TimeDim": "2020-2020", "TimeDimType": "YEAR",
         "NumericValue": "81.2", "Value": "81.2"},  # range year
        {"Id": "4", "IndicatorCode": "WHOSIS_000002", "SpatialDim": "JPN",
         "SpatialDimType": "COUNTRY", "TimeDim": "2019", "TimeDimType": "YEAR",
         "NumericValue": "abc", "Value": "abc"},  # unparseable numeric
        {"Id": "5", "IndicatorCode": None, "SpatialDim": "DEU",
         "SpatialDimType": "COUNTRY", "TimeDim": "2019", "TimeDimType": "YEAR",
         "NumericValue": "80.1", "Value": "80.1"},  # null key column
    ]


@pytest.fixture()
def raw_indicators():
    return [
        {"IndicatorCode": "WHOSIS_000001", "IndicatorName": "Life expectancy at birth (years)", "Language": "EN"},
        {"IndicatorCode": "WHOSIS_000001", "IndicatorName": "Life expectancy at birth (years)", "Language": "EN"},
        {"IndicatorCode": "WHOSIS_000002", "IndicatorName": "Healthy life expectancy (HALE)", "Language": "EN"},
    ]


@pytest.fixture()
def raw_countries():
    return [
        {"Code": "USA", "Title": "United States of America"},
        {"Code": "USA", "Title": "United States of America"},
        {"Code": "FRA", "Title": "France"},
        {"Code": "JPN", "Title": "Japan"},
    ]
