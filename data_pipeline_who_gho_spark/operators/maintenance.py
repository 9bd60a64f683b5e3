"""Warehouse maintenance: small-file compaction.

Append-heavy sinks (the reject sink, per-batch incremental loads,
streaming foreachBatch upserts) accumulate many small parquet files;
at cluster scale that degrades scan parallelism planning (one task per
tiny file) and NameNode/object-store metadata pressure. ``compact_table``
rewrites a table directory to a target number of files with the same
atomic tmp-write → directory-swap protocol as ``operators/load.upsert``,
so readers never observe a half-compacted table.

The reference has no analog (Postgres autovacuums); this is part of the
engine's at-rest layout toolkit alongside partitioning and bucketing.
"""

from __future__ import annotations

import math
import os
import shutil
import uuid

from pyspark.sql import SparkSession

from .load import _table_path

DEFAULT_TARGET_FILE_BYTES = 128 * 1024 * 1024  # HDFS-block-ish scan unit


def _data_file_sizes(path: str) -> list[int]:
    sizes = []
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                sizes.append(os.path.getsize(os.path.join(root, f)))
    return sizes


def plan_compaction(path: str, target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES) -> int | None:
    """Number of output files a compaction should produce, or None if
    the table is already well-laid-out (fewer files than the target
    count would give — rewriting would only churn data)."""
    sizes = _data_file_sizes(path)
    if not sizes:
        return None
    n_target = max(1, math.ceil(sum(sizes) / target_file_bytes))
    return n_target if len(sizes) > n_target else None


def compact_table(
    spark: SparkSession,
    warehouse_dir: str,
    table: str,
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
) -> int:
    """Coalesce a parquet table's many small files into ~target-size
    files. Returns the number of files after compaction. No-op (returns
    current count) when already compact. Content is preserved exactly;
    only the physical layout changes.

    Scale note: ``coalesce`` (not ``repartition``) — a narrow,
    shuffle-free rewrite; each output task reads a handful of input
    files sequentially.
    """
    path = _table_path(warehouse_dir, table)
    n_target = plan_compaction(path, target_file_bytes)
    if n_target is None:
        return len(_data_file_sizes(path))

    df = spark.read.parquet(path)
    tmp = path + ".tmp-" + uuid.uuid4().hex[:8]
    df.coalesce(n_target).write.mode("overwrite").parquet(tmp)
    old = path + ".old-" + uuid.uuid4().hex[:8]
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)
    return len(_data_file_sizes(path))
