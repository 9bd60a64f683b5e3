"""ST1/ST2: etl_state repository — checkpoints + watermarks.

Reference: a single-row-per-process Postgres table with a JSON checkpoint
blob and a ``last_successful_run_at`` timestamp (``etl/state.py:13-55``;
note the reference *declares* the watermark but never uses it — we
implement the declared semantics for real, per SURVEY §7).

Spark-first shape: a tiny parquet-backed key→state table, read/written
driver-side (state is O(processes), never data-sized). Single-writer per
process is assumed (the reference's IntegrityError retry handles exactly
one concurrent bootstrap insert; our atomic directory swap gives the same
observable guarantee).
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from datetime import datetime, timezone

from pyspark.sql import Row, SparkSession


class EtlStateRepository:
    """get/set checkpoint + watermark state per process name."""

    def __init__(self, spark: SparkSession, state_dir: str):
        self.spark = spark
        self.path = os.path.join(state_dir, "etl_state")

    # -- internals ---------------------------------------------------------

    def _read_all(self) -> dict[str, dict]:
        if not os.path.exists(self.path):
            return {}
        rows = self.spark.read.parquet(self.path).collect()
        return {
            r["process_name"]: {
                "last_successful_run_at": r["last_successful_run_at"],
                "checkpoint_state": json.loads(r["checkpoint_state"]) if r["checkpoint_state"] else None,
            }
            for r in rows
        }

    def _write_all(self, states: dict[str, dict]) -> None:
        rows = [
            Row(
                process_name=k,
                last_successful_run_at=v.get("last_successful_run_at"),
                checkpoint_state=json.dumps(v["checkpoint_state"]) if v.get("checkpoint_state") else None,
            )
            for k, v in states.items()
        ]
        schema = "process_name STRING, last_successful_run_at TIMESTAMP, checkpoint_state STRING"
        df = self.spark.createDataFrame(rows, schema)
        tmp = self.path + ".tmp-" + uuid.uuid4().hex[:8]
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        old = self.path + ".old-" + uuid.uuid4().hex[:8]
        if os.path.exists(self.path):
            os.rename(self.path, old)
        os.rename(tmp, self.path)
        shutil.rmtree(old, ignore_errors=True)

    # -- API (parity with etl/state.py) ------------------------------------

    def get_state(self, process_name: str) -> dict | None:
        return self._read_all().get(process_name)

    def set_checkpoint_state(self, process_name: str, checkpoint: dict | None) -> None:
        states = self._read_all()
        entry = states.setdefault(process_name, {"last_successful_run_at": None, "checkpoint_state": None})
        entry["checkpoint_state"] = checkpoint
        self._write_all(states)

    def clear_checkpoint(self, process_name: str) -> None:
        self.set_checkpoint_state(process_name, None)

    def set_last_successful_run_at(self, process_name: str, ts: datetime | None = None) -> None:
        states = self._read_all()
        entry = states.setdefault(process_name, {"last_successful_run_at": None, "checkpoint_state": None})
        entry["last_successful_run_at"] = ts or datetime.now(timezone.utc)
        self._write_all(states)

    def get_watermark(self, process_name: str) -> datetime | None:
        s = self.get_state(process_name)
        return s["last_successful_run_at"] if s else None
