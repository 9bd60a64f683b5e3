"""End-to-end corpus build (plans/curation9.py)."""

from __future__ import annotations

import math

from data_pipeline_who_gho_spark.plans.curation9 import corpus_build_e2e
from data_pipeline_who_gho_spark.plans.training2 import PACK_CAP

SF = "/root/testdata/sf0.001"


def test_corpus_build_e2e_invariants(spark):
    """The funnel is monotone and every stage is LIVE (drops > 0); the
    manifest conserves stage-3 doc/token volume exactly; packing obeys
    the cap bound n_seqs >= ceil(n_tokens / PACK_CAP)."""
    rows = corpus_build_e2e(spark, SF).collect()
    funnel = {r["stage"]: r for r in rows if r["shard"] == -1}
    manifest = [r for r in rows if r["stage"] == "4_manifest"]
    stages = ["0_ingest", "1_exact_dedup", "2_near_dedup", "3_gopher_kept"]
    assert set(funnel) == set(stages)
    for a, b in zip(stages, stages[1:]):
        assert funnel[a]["n_docs"] > funnel[b]["n_docs"], (a, b)
        assert funnel[a]["n_tokens"] > funnel[b]["n_tokens"], (a, b)
    # the injected re-ingest copies are exactly the 1-in-7 hybrids
    assert funnel["0_ingest"]["n_docs"] - funnel["1_exact_dedup"]["n_docs"] >= 1
    # manifest conserves the gated corpus
    assert sum(r["n_docs"] for r in manifest) == funnel["3_gopher_kept"]["n_docs"]
    assert sum(r["n_tokens"] for r in manifest) == funnel["3_gopher_kept"]["n_tokens"]
    assert {r["split"] for r in manifest} == {"train", "val", "test"}
    for r in manifest:
        assert r["n_seqs"] >= math.ceil(r["n_tokens"] / PACK_CAP)
        assert r["n_seqs"] <= r["n_docs"]
