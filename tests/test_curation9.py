"""End-to-end corpus build + compaction + hybrid fusion (plans/curation9.py)."""

from __future__ import annotations

import math
from collections import defaultdict

from data_pipeline_who_gho_spark.plans.curation9 import (
    _COMPACT_CAP,
    _RRF_K,
    compact_shards,
    corpus_build_e2e,
    rrf_hybrid_search,
)
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


def test_compact_shards_fold_invariants(spark):
    """Every output shard respects the cap unless it holds a single
    over-cap fragment; shard ids are contiguous from 0 per source; the
    fold actually MERGES (some shard holds >1 fragment)."""
    rows = compact_shards(spark, "/root/testdata/sf0.01").collect()
    by_shard = defaultdict(list)
    for r in rows:
        by_shard[(r["source"], r["out_shard"])].append(r)
    merged = False
    for (_, _), frs in by_shard.items():
        total = sum(r["n_bytes"] for r in frs)
        if len(frs) > 1:
            merged = True
            assert total <= _COMPACT_CAP, frs
    assert merged, "cap never forced a merge — the fixture cap is dead"
    for source in {r["source"] for r in rows}:
        shards = sorted({r["out_shard"] for r in rows if r["source"] == source})
        assert shards == list(range(len(shards))), (source, shards)
    # fold order: out_shard is non-decreasing in frag_id within a source
    by_src = defaultdict(list)
    for r in sorted(rows, key=lambda r: (r["source"], r["frag_id"])):
        by_src[r["source"]].append(r["out_shard"])
    for seq in by_src.values():
        assert all(a <= b for a, b in zip(seq, seq[1:]))


def test_rrf_fusion_arithmetic_and_order(spark):
    """rrf_micro equals the integer contribution formula of the two
    ranks; output is ordered by (rrf desc, doc_id); a doc present in
    both lists outranks one with only a deep single-list rank."""
    rows = rrf_hybrid_search(spark, SF).collect()
    assert len(rows) == 10
    for r in rows:
        want = 0
        for rank in (r["lex_rank"], r["sem_rank"]):
            if rank is not None:
                want += 1_000_000 // (_RRF_K + rank)
        assert r["rrf_micro"] == want, r
        assert r["lex_rank"] is not None or r["sem_rank"] is not None
    keys = [(-r["rrf_micro"], r["doc_id"]) for r in rows]
    assert keys == sorted(keys)
    assert rows[0]["rank"] == 1
