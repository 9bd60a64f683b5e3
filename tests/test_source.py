"""Paged-source semantics, ported from /root/reference/tests/test_extract.py:
pagination yields all records, checkpoint advances per batch and clears at
end, resume skips completed work, retry survives transient errors."""

from __future__ import annotations

import pytest

from data_pipeline_who_gho_spark.sources.paged import (
    fetch_all_pages,
    fetch_paged,
    fetch_with_checkpoint,
)
from data_pipeline_who_gho_spark.sources.state import EtlStateRepository
from data_pipeline_who_gho_spark.sources.testing import (
    _fail_once,
    flaky_fetcher as _flaky_fetcher,
    pages_fetcher as _pages_fetcher,
)

SCHEMA = "key STRING, idx INT"


def test_pagination_yields_all():
    # pages of 2 over 5 records -> [2,2,1] like the reference's 2+2+0 test
    out = list(fetch_all_pages(_pages_fetcher, "k1", page_size=2))
    assert [r["idx"] for r in out] == [0, 1, 2, 3, 4]


def test_pagination_exact_multiple():
    # 5 records, page_size 5 -> one full page, then an empty page stops it
    out = list(fetch_all_pages(_pages_fetcher, "k1", page_size=5))
    assert len(out) == 5


def test_retry_transient():
    _fail_once.clear()
    out = list(fetch_all_pages(_flaky_fetcher, "k2", page_size=2, backoff_s=0.001))
    assert len(out) == 5


def test_retry_exhausted():
    def always_fail(key, page, page_size):
        raise ConnectionError("down")

    with pytest.raises(ConnectionError):
        list(fetch_all_pages(always_fail, "k", 2, max_retries=2, backoff_s=0.001))


def test_fetch_paged_distributed(spark):
    keys = spark.createDataFrame([("a",), ("b",), ("c",)], "key STRING")
    df = fetch_paged(spark, keys, _pages_fetcher, SCHEMA, page_size=2)
    assert df.count() == 15
    assert df.filter("key = 'b'").count() == 5


def test_fetch_paged_limit(spark):
    keys = spark.createDataFrame([("a",), ("b",)], "key STRING")
    df = fetch_paged(spark, keys, _pages_fetcher, SCHEMA, page_size=2, limit=3)
    assert df.count() == 3


def test_checkpoint_resume(spark, tmp_path):
    state = EtlStateRepository(spark, str(tmp_path))
    seen: list[int] = []

    def sink(df, batch_idx):
        seen.append(batch_idx)
        if batch_idx == 1:
            raise RuntimeError("crash mid-run")
        df.count()

    keys = [f"k{i}" for i in range(6)]
    with pytest.raises(RuntimeError):
        fetch_with_checkpoint(
            spark, keys, _pages_fetcher, SCHEMA, state, "proc", batch_size=2, sink=sink
        )
    # batch 0 completed and was checkpointed; crash happened in batch 1
    st = state.get_state("proc")
    assert st["checkpoint_state"] == {"next_batch": 1}

    seen.clear()
    ok_sink = lambda df, bi: (seen.append(bi), df.count())
    n = fetch_with_checkpoint(
        spark, keys, _pages_fetcher, SCHEMA, state, "proc", batch_size=2, sink=ok_sink
    )
    assert seen == [1, 2]  # batch 0 skipped on resume
    assert n == 2
    st = state.get_state("proc")
    assert st["checkpoint_state"] is None  # cleared on success
    assert st["last_successful_run_at"] is not None  # watermark recorded


def test_state_roundtrip(spark, tmp_path):
    state = EtlStateRepository(spark, str(tmp_path))
    assert state.get_state("nope") is None
    state.set_checkpoint_state("p1", {"next_link": "http://x?page=3"})
    assert state.get_state("p1")["checkpoint_state"]["next_link"] == "http://x?page=3"
    state.set_last_successful_run_at("p1")
    assert state.get_watermark("p1") is not None
    state.clear_checkpoint("p1")
    assert state.get_state("p1")["checkpoint_state"] is None
