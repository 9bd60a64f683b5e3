"""L1-L3: warehouse load — idempotent keyed UPSERT + append-only reject sink.

The reference's load is a single multi-row
``INSERT ... ON CONFLICT (key) DO UPDATE SET <non-key cols>``
(``etl/load.py:30-52``): updates win on shared keys, union otherwise, and
re-loading the same batch is a no-op.

Spark-first design: the MERGE is a **broadcast-able left-anti join +
unionByName** over parquet-at-rest, committed with a write-temp /
atomic-swap protocol (parquet has no transactions; the swap directory
rename gives us all-or-nothing visibility, the closest parity to the
reference's one-transaction upsert). On a Delta/Iceberg-backed catalog the
same function maps 1:1 onto ``MERGE INTO`` — the call-site contract is
identical, so swapping the table format is a one-line change here.

Scale notes: the anti-join shuffles on the upsert key unless the update
batch is small enough to broadcast — the common case for dimension upserts
(dims are tiny; Catalyst broadcasts automatically under the threshold).
Like Delta MERGE, duplicate keys *within one batch* are an error upstream;
callers dedup first (T6/T8), which the pipeline driver does.
"""

from __future__ import annotations

import os
import shutil
import uuid
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class UpsertKeyError(ValueError):
    """Update batch contains duplicate upsert keys (reference: Postgres
    raises CardinalityViolation; Delta MERGE raises — we match)."""


def _table_path(warehouse_dir: str, table: str) -> str:
    return os.path.join(warehouse_dir, table)


def atomic_overwrite(path: str, write_fn) -> None:
    """Write-temp → directory-swap commit, shared by upsert and
    compaction. ``write_fn(tmp_path)`` materializes the new table into a
    fresh temp dir; then the live directory is replaced by two renames.

    Honesty note: the rename pair is not one atomic operation — there is
    a sub-millisecond window where the path is absent, and a crash inside
    it leaves only the ``.old-*`` dir (recoverable by hand). This matches
    the engine's single-writer posture (the reference runs with
    ``max_active_runs=1``, dags/who_gho_etl_dag.py:35); concurrent
    writers/appenders need external coordination or a transactional
    table format (Delta/Iceberg), onto which this call-site maps 1:1.
    """
    tmp = path + ".tmp-" + uuid.uuid4().hex[:8]
    write_fn(tmp)
    old = path + ".old-" + uuid.uuid4().hex[:8]
    if os.path.exists(path):
        os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)


def read_table(spark: SparkSession, warehouse_dir: str, table: str) -> DataFrame | None:
    path = _table_path(warehouse_dir, table)
    if not os.path.exists(path):
        return None
    return spark.read.parquet(path)


def merge_upsert(target: DataFrame | None, updates: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Pure-plan MERGE: updates win on shared keys, union otherwise.

    Exposed separately from the sink so the semantics are SQL-checkable
    (oracle: anti-join + UNION ALL) and reusable in-plan without I/O.

    Broadcast decision is left to Catalyst/AQE: update batches small enough
    (the dimension-upsert common case) broadcast automatically; large fact
    batches fall back to a shuffled anti-join on the key, which AQE can
    re-plan at runtime using observed sizes.
    """
    if target is None:
        return updates
    kept = target.join(updates.select(*keys), on=list(keys), how="left_anti")
    return kept.unionByName(updates)


def merge_cdc(
    target: DataFrame | None,
    changes: DataFrame,
    keys: Sequence[str],
    delete_col: str = "is_deleted",
) -> DataFrame:
    """Pure-plan CDC MERGE with delete handling — the full three-clause
    merge the reference's INSERT..ON CONFLICT cannot express but every
    CDC feed needs:

        WHEN MATCHED AND is_deleted THEN DELETE
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED AND NOT is_deleted THEN INSERT *

    One anti-join over ALL change keys (deleted and upserted alike)
    evicts stale target rows, then surviving non-delete changes union
    back — same single-shuffle shape as ``merge_upsert``; a delete for
    an absent key is a no-op (tombstone replay tolerance, which makes
    re-applying a CDC batch idempotent). A NULL flag means "not a
    delete" (sources often leave it unset) — it must upsert, never
    silently evict.
    """
    upserts = changes.filter(
        ~F.coalesce(F.col(delete_col), F.lit(False))
    ).drop(delete_col)
    if target is None:
        return upserts
    kept = target.join(changes.select(*keys), on=list(keys), how="left_anti")
    return kept.unionByName(upserts)


def upsert(
    spark: SparkSession,
    updates: DataFrame,
    warehouse_dir: str,
    table: str,
    keys: Sequence[str],
    partition_by: Sequence[str] | None = None,
) -> None:
    """L2: idempotent keyed upsert into a parquet warehouse table.

    Protocol: (1) assert batch keys unique, (2) plan merge vs current
    table, (3) write to a fresh temp dir, (4) atomic directory swap.
    Re-running the same batch yields a byte-identical table (idempotency —
    the reference's core guarantee, etl/load.py:45-48).

    ``partition_by`` lays the table out hive-partitioned (e.g. fact by
    time_dim) so downstream year-filtered queries prune partitions at
    plan time — the at-rest layout SURVEY §1 calls for. At 100 TB the
    full-table rewrite gives way to partition-scoped MERGE (or Delta);
    the call-site contract stays the same.
    """
    dup = (
        updates.groupBy(*[F.col(k) for k in keys])
        .count()
        .filter(F.col("count") > 1)
        .limit(1)
        .count()
    )
    if dup:
        raise UpsertKeyError(f"duplicate keys in update batch for {table} on {list(keys)}")

    target = read_table(spark, warehouse_dir, table)
    merged = merge_upsert(target, updates, keys)

    path = _table_path(warehouse_dir, table)

    def _write(tmp: str) -> None:
        writer = merged.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(tmp)

    atomic_overwrite(path, _write)


def append_rejects(rejected: DataFrame, warehouse_dir: str, table: str = "rejected_record") -> None:
    """L3: append-only reject sink (etl/load.py:55-71). No-op on empty input."""
    if rejected.isEmpty():
        return
    rejected.write.mode("append").parquet(_table_path(warehouse_dir, table))
