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


# Characters Spark escapes in hive-style partition directory names
# (org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils).
_HIVE_UNSAFE = set('"#%\'*/:=?\\\x7f{[]^')


def _hive_escape(val: str) -> str:
    return "".join(
        f"%{ord(ch):02X}" if ch in _HIVE_UNSAFE or ord(ch) < 32 else ch
        for ch in val
    )


def _hive_part_dir(pcols: Sequence[str], values: Sequence) -> str:
    """Relative hive directory for one partition tuple, Spark-compatible."""
    segs = []
    for col, val in zip(pcols, values):
        sval = "__HIVE_DEFAULT_PARTITION__" if val is None else _hive_escape(str(val))
        segs.append(f"{_hive_escape(col)}={sval}")
    return os.path.join(*segs)


def _is_hive_partitioned(path: str, first_pcol: str) -> bool:
    try:
        return any(
            entry.startswith(f"{first_pcol}=") for entry in os.listdir(path)
        )
    except OSError:
        return False


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
    plan time — the at-rest layout SURVEY §1 calls for, AND scopes the
    rewrite: only partitions touched by the update batch are merged and
    swapped; every other partition's files are left byte-identical on
    disk. At 100 TB a dim-sized daily update rewrites a handful of
    partition directories, not the fact table — the parquet-at-rest
    equivalent of Delta's partition-pruned ``MERGE INTO``.

    Affected set = partitions the update rows land in ∪ partitions that
    currently hold an updated key (a key whose partition value changes
    must be deleted from its old partition). The second leg is a
    key-semi-join scan of the target — column-pruned to key+partition
    columns, far cheaper than a rewrite; callers whose keys embed the
    partition column can expect Catalyst to prune it further.
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
    path = _table_path(warehouse_dir, table)

    pcols = list(partition_by or [])
    if target is None or not pcols or not _is_hive_partitioned(path, pcols[0]):
        merged = merge_upsert(target, updates, keys)

        def _write(tmp: str) -> None:
            writer = merged.write.mode("overwrite")
            if pcols:
                writer = writer.partitionBy(*pcols)
            writer.parquet(tmp)

        atomic_overwrite(path, _write)
        return

    _upsert_partition_scoped(spark, target, updates, path, keys, pcols)


def _upsert_partition_scoped(
    spark: SparkSession,
    target: DataFrame,
    updates: DataFrame,
    path: str,
    keys: Sequence[str],
    pcols: Sequence[str],
) -> None:
    from functools import reduce

    landing = updates.select(*pcols).distinct()
    moved = (
        target.join(updates.select(*keys), on=list(keys), how="left_semi")
        .select(*pcols)
        .distinct()
    )
    affected = [tuple(r) for r in landing.union(moved).distinct().collect()]
    if not affected:
        return  # empty batch: nothing to rewrite

    def _tuple_pred(t):
        eqs = [F.col(c).eqNullSafe(F.lit(v)) for c, v in zip(pcols, t)]
        return reduce(lambda a, b: a & b, eqs)

    cond = reduce(lambda a, b: a | b, [_tuple_pred(t) for t in affected])
    merged = merge_upsert(target.filter(cond), updates, keys)

    tmp = path + ".tmp-" + uuid.uuid4().hex[:8]
    merged.write.mode("overwrite").partitionBy(*pcols).parquet(tmp)
    try:
        for t in affected:
            rel = _hive_part_dir(pcols, t)
            new_dir = os.path.join(tmp, rel)
            live_dir = os.path.join(path, rel)
            old = live_dir + ".old-" + uuid.uuid4().hex[:8]
            if os.path.exists(live_dir):
                os.rename(live_dir, old)
            if os.path.exists(new_dir):
                os.makedirs(os.path.dirname(live_dir), exist_ok=True)
                os.rename(new_dir, live_dir)
            # else: the partition lost its last row (key moved away) — drop it
            shutil.rmtree(old, ignore_errors=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def append_rejects(rejected: DataFrame, warehouse_dir: str, table: str = "rejected_record") -> None:
    """L3: append-only reject sink (etl/load.py:55-71). No-op on empty input."""
    if rejected.isEmpty():
        return
    rejected.write.mode("append").parquet(_table_path(warehouse_dir, table))
