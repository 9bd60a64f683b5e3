"""EP2-shaped end-to-end batch driver (reference: ``etl/local_run.py``).

One Spark application; stages compose lazily (extract → transform →
validate → load → DQ); materialization happens only at the upsert sinks.
The reference's JSON-file task hand-offs (EP1) have no equivalent here —
the lazy plan IS the hand-off (SURVEY §3 lifecycle mapping).
"""

from __future__ import annotations

import argparse
from dataclasses import dataclass, field

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .operators.load import append_rejects, upsert
from .operators.quality import run_dq_checks
from .operators.transform import clean_countries, clean_indicators, clean_observations
from .operators.validate import (
    country_rules,
    indicator_rules,
    observation_rules,
    validate_split,
)
from .schemas import COUNTRY_RENAMES, INDICATOR_RENAMES, OBSERVATION_RENAMES
from .session import get_spark
from .sources.state import EtlStateRepository


@dataclass
class PipelineConfig:
    """Reference: ETLConfig (etl/config.py:10-54), Airflow-free."""

    warehouse_dir: str
    source_observations: str  # parquet/json path of API-shaped records
    source_indicators: str | None = None
    source_countries: str | None = None
    limit: int | None = None  # dev_run_limit parity
    full_reingest: bool = False  # implemented (the reference only declared it)
    process_name: str = "who_gho_etl"
    source_format: str = "parquet"  # or "json" (the reference's interchange)


def _rename(df, mapping):
    return df.select(*[df[a].alias(b) for a, b in mapping.items() if a in df.columns])


def run_pipeline(spark: SparkSession, cfg: PipelineConfig) -> dict:
    """Full batch run; returns DQ metrics. Idempotent by construction
    (keyed upserts), matching the reference's re-run guarantee."""
    state = EtlStateRepository(spark, cfg.warehouse_dir)

    # -- extract (fixture-file source stands in for the OData fetcher) ----
    obs_raw = spark.read.format(cfg.source_format).load(cfg.source_observations)
    if cfg.limit is not None:  # limit=0 means zero rows, not "no limit"
        obs_raw = obs_raw.limit(cfg.limit)

    # watermark: new-data-only unless full_reingest (declared in the
    # reference's README.md:105 / dag params but never implemented there)
    wm = None if cfg.full_reingest else state.get_watermark(cfg.process_name)
    if wm is not None and "ingested_at" in obs_raw.columns:
        obs_raw = obs_raw.filter(obs_raw["ingested_at"] > wm)

    # -- transform + validate ---------------------------------------------
    obs_clean = clean_observations(obs_raw)
    obs_res = validate_split(obs_clean, observation_rules())
    obs_final = _rename(obs_res.validated, OBSERVATION_RENAMES)

    # upsert key mirrors clean_observations' dedup fallback: composite
    # natural key when Id is unusable (etl/transform.py:45-48) — a null
    # observation_id never matches an anti-join and would either crash the
    # dup-key guard or accumulate duplicates
    id_usable = (
        obs_final.where(obs_final["observation_id"].isNotNull()).limit(1).count() > 0
    )
    fact_keys = (
        ["observation_id"]
        if id_usable
        else ["indicator_code", "spatial_dim", "time_dim"]
    )
    if id_usable:
        # A mixed batch can still carry NULL-Id rows; a NULL key never
        # matches the merge anti-join (NULL != NULL), so re-running the
        # same batch would append a duplicate and silently break the
        # idempotent re-run guarantee. Give those rows a deterministic
        # surrogate derived from the composite natural key instead —
        # identical across re-runs, so the upsert stays a no-op.
        obs_final = obs_final.withColumn(
            "observation_id",
            F.coalesce(
                F.col("observation_id"),
                F.concat_ws(
                    ":",
                    F.lit("ck"),
                    "indicator_code",
                    "spatial_dim",
                    F.col("time_dim").cast("string"),
                ),
            ),
        )

    # -- load: dims first, fact last (who_gho_etl_dag.py:177-187) ---------
    if cfg.source_indicators:
        ind_raw = spark.read.parquet(cfg.source_indicators)
        ind_res = validate_split(clean_indicators(ind_raw), indicator_rules())
        upsert(spark, _rename(ind_res.validated, INDICATOR_RENAMES), cfg.warehouse_dir,
               "dim_indicator", ["indicator_code"])
        append_rejects(ind_res.rejected, cfg.warehouse_dir)
    if cfg.source_countries:
        c_raw = spark.read.parquet(cfg.source_countries)
        c_res = validate_split(clean_countries(c_raw), country_rules())
        upsert(spark, _rename(c_res.validated, COUNTRY_RENAMES), cfg.warehouse_dir,
               "dim_country", ["country_code"])
        append_rejects(c_res.rejected, cfg.warehouse_dir)

    # fact partitioned by year at rest: year-filtered analytics (the A1/A4
    # query family) prune partitions instead of scanning the full fact
    upsert(spark, obs_final, cfg.warehouse_dir, "fact_observation",
           fact_keys, partition_by=["time_dim"])
    append_rejects(obs_res.rejected, cfg.warehouse_dir)

    # -- DQ gate (fails the run on violation) ------------------------------
    fact = spark.read.parquet(f"{cfg.warehouse_dir}/fact_observation")
    metrics = run_dq_checks(
        fact, ["indicator_code", "spatial_dim", "time_dim"], "fact_observation"
    )

    # watermark = max event-time actually processed, NOT wall-clock run
    # completion: a processing-time watermark silently skips rows that
    # land in the source late with earlier ingested_at stamps
    if "ingested_at" in obs_raw.columns:
        max_seen = obs_raw.agg(F.max("ingested_at")).first()[0]
        if max_seen is not None:
            state.set_last_successful_run_at(cfg.process_name, max_seen)
    else:
        state.set_last_successful_run_at(cfg.process_name)
    return metrics


def main() -> None:
    ap = argparse.ArgumentParser(description="who-gho-spark batch pipeline")
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--observations", required=True)
    ap.add_argument("--indicators")
    ap.add_argument("--countries")
    ap.add_argument("--limit", type=int)
    ap.add_argument("--full-reingest", action="store_true")
    args = ap.parse_args()

    spark = get_spark(app_name="who-gho-pipeline")
    cfg = PipelineConfig(
        warehouse_dir=args.warehouse,
        source_observations=args.observations,
        source_indicators=args.indicators,
        source_countries=args.countries,
        limit=args.limit,
        full_reingest=args.full_reingest,
    )
    print(run_pipeline(spark, cfg))


if __name__ == "__main__":
    main()
