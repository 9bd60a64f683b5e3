"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()``/``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 for the DuckDB-oracle correctness gate.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")

from data_pipeline_who_gho_spark.plans.analytics import (  # noqa: E402
    ANALYTICS_ORACLE_SQL,
    ANALYTICS_QUERIES,
)
from data_pipeline_who_gho_spark.plans.analytics2 import (  # noqa: E402
    ANALYTICS2_ORACLE_SQL,
    ANALYTICS2_QUERIES,
)
from data_pipeline_who_gho_spark.plans.etl_ops import (  # noqa: E402
    ETL_ORACLE_SQL,
    ETL_QUERIES,
)
from data_pipeline_who_gho_spark.plans.extensions import (  # noqa: E402
    EXTENSION_ORACLE_SQL,
    EXTENSION_QUERIES,
)
from data_pipeline_who_gho_spark.plans.extras import (  # noqa: E402
    EXTRAS_ORACLE_SQL,
    EXTRAS_QUERIES,
)
from data_pipeline_who_gho_spark.plans.streaming_queries import (  # noqa: E402
    STREAMING_ORACLE_SQL,
    STREAMING_QUERIES,
)
from data_pipeline_who_gho_spark.plans.tpch import (  # noqa: E402
    TPCH_ORACLE_SQL,
    TPCH_QUERIES,
)
from data_pipeline_who_gho_spark.plans.behavior import (  # noqa: E402
    BEHAVIOR_ORACLE_SQL,
    BEHAVIOR_QUERIES,
)
from data_pipeline_who_gho_spark.plans.tpch2 import (  # noqa: E402
    TPCH2_ORACLE_SQL,
    TPCH2_QUERIES,
)
from data_pipeline_who_gho_spark.plans.training import (  # noqa: E402
    TRAINING_ORACLE_SQL,
    TRAINING_QUERIES,
)
from data_pipeline_who_gho_spark.plans.analytics3 import (  # noqa: E402
    ANALYTICS3_ORACLE_SQL,
    ANALYTICS3_QUERIES,
)
from data_pipeline_who_gho_spark.plans.vector_analytics import (  # noqa: E402
    VECTOR_ANALYTICS_ORACLE_SQL,
    VECTOR_ANALYTICS_QUERIES,
)
from data_pipeline_who_gho_spark.plans.analytics4 import (  # noqa: E402
    ANALYTICS4_ORACLE_SQL,
    ANALYTICS4_QUERIES,
)
from data_pipeline_who_gho_spark.plans.tpch3 import (  # noqa: E402
    TPCH3_ORACLE_SQL,
    TPCH3_QUERIES,
)
from data_pipeline_who_gho_spark.plans.analytics5 import (  # noqa: E402
    ANALYTICS5_ORACLE_SQL,
    ANALYTICS5_QUERIES,
)
from data_pipeline_who_gho_spark.plans.tpch4 import (  # noqa: E402
    TPCH4_ORACLE_SQL,
    TPCH4_QUERIES,
)
from data_pipeline_who_gho_spark.plans.analytics6 import (  # noqa: E402
    ANALYTICS6_ORACLE_SQL,
    ANALYTICS6_QUERIES,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the A1 star-join revenue rollup on sf0.001."""
    return ANALYTICS_QUERIES["a1_star_join_revenue"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(ANALYTICS_QUERIES)
    out.update(ANALYTICS2_QUERIES)
    out.update(ETL_QUERIES)
    out.update(EXTENSION_QUERIES)
    out.update(EXTRAS_QUERIES)
    out.update(STREAMING_QUERIES)
    out.update(TPCH_QUERIES)
    out.update(BEHAVIOR_QUERIES)
    out.update(TPCH2_QUERIES)
    out.update(TRAINING_QUERIES)
    out.update(ANALYTICS3_QUERIES)
    out.update(VECTOR_ANALYTICS_QUERIES)
    out.update(ANALYTICS4_QUERIES)
    out.update(TPCH3_QUERIES)
    out.update(ANALYTICS5_QUERIES)
    out.update(TPCH4_QUERIES)
    out.update(ANALYTICS6_QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (omitted ⇒ rows-only)."""
    out: dict[str, str] = {}
    for d in (ANALYTICS_ORACLE_SQL, ANALYTICS2_ORACLE_SQL, ETL_ORACLE_SQL, EXTENSION_ORACLE_SQL, EXTRAS_ORACLE_SQL, STREAMING_ORACLE_SQL, TPCH_ORACLE_SQL, BEHAVIOR_ORACLE_SQL, TPCH2_ORACLE_SQL, TRAINING_ORACLE_SQL, ANALYTICS3_ORACLE_SQL, VECTOR_ANALYTICS_ORACLE_SQL, ANALYTICS4_ORACLE_SQL, TPCH3_ORACLE_SQL, ANALYTICS5_ORACLE_SQL, TPCH4_ORACLE_SQL, ANALYTICS6_ORACLE_SQL):
        out.update({k: v for k, v in d.items() if v})
    return out
