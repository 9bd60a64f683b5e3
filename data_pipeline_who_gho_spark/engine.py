"""EP3: the analytics-SQL surface (reference: psql/Superset over the
Postgres star schema, README.md:136-213 → here: Spark SQL over the
warehouse; a BI tool attaches via Thrift/Spark Connect unchanged).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .sources.catalog import TABLES, register_views


class Engine:
    """Thin query facade: register tables once, then ``sql()`` away.

    ``attach_warehouse`` exposes pipeline-produced tables (dim_indicator,
    dim_country, fact_observation, rejected_record); ``attach_fixtures``
    exposes the driver's TPC-H-ish tables. Both are temp views — every
    query planned by Catalyst against parquet scans.
    """

    WAREHOUSE_TABLES = ["dim_indicator", "dim_country", "fact_observation", "rejected_record"]

    def __init__(self, spark: SparkSession):
        self.spark = spark

    def attach_fixtures(self, sf_dir: str) -> "Engine":
        register_views(self.spark, sf_dir)
        return self

    def attach_warehouse(self, warehouse_dir: str) -> "Engine":
        for t in self.WAREHOUSE_TABLES:
            path = os.path.join(warehouse_dir, t)
            if os.path.exists(path):
                self.spark.read.parquet(path).createOrReplaceTempView(t)
        return self

    def sql(self, query: str) -> DataFrame:
        return self.spark.sql(query)

    def table(self, name: str) -> DataFrame:
        return self.spark.table(name)

    def tables(self) -> list[str]:
        return sorted(
            r["viewName"] for r in self.spark.sql("SHOW VIEWS").collect()
        )
