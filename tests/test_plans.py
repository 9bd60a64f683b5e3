"""Plan-regression guards: assert the physical plans keep the properties
the engine's 100 TB posture depends on (pushdown, pruning, broadcast,
partial aggregation). A correctness-preserving change that silently loses
one of these is a perf bug — catch it here."""

from __future__ import annotations

import pytest

from data_pipeline_who_gho_spark.plans.analytics import (
    a1_star_join_revenue,
    a2_filter_like,
    agg_pricing_summary,
)
from data_pipeline_who_gho_spark.plans.etl_ops import etl_upsert_merge

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_and_pruning(spark):
    plan = _plan(a2_filter_like(spark, SF))
    assert "PushedFilters: [" in plan and "StringStartsWith(p_type,PROMO)" in plan
    # column pruning: p_brand is not referenced -> must not be read
    assert "p_brand" not in plan


def test_star_join_broadcasts_dims(spark):
    plan = _plan(a1_star_join_revenue(spark, SF))
    assert plan.count("BroadcastHashJoin") >= 3  # nation/region/customer at least
    assert "SortMergeJoin" not in plan  # nothing should fall back at this sf
    assert "partial_sum" in plan  # map-side combine before the exchange


def test_pricing_summary_partial_agg(spark):
    plan = _plan(agg_pricing_summary(spark, SF))
    assert "partial_sum" in plan and "partial_count" in plan
    # two shuffles by design since r13: the deliberate spread_by_hash
    # exchange that parallelizes the decimal partial aggregation past
    # the single-row-group fixture scan (a no-op at production scale),
    # plus the final groupBy exchange — anything more is a regression
    assert plan.count("Exchange hashpartitioning") == 2
    # the spread must hash a deterministic key, never rand()/round-robin
    assert "xxhash64" in plan


def test_upsert_antijoin_prunes_to_keys(spark):
    plan = _plan(etl_upsert_merge(spark, SF))
    assert "LeftAnti" in plan
    # the anti-join's build side must only carry the key column
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan


def test_q7_dims_broadcast_one_shuffle(spark):
    from data_pipeline_who_gho_spark.plans.tpch2 import q7_volume_shipping

    plan = _plan(q7_volume_shipping(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "partial_sum" in plan
    # only the final groupBy may shuffle; the joins must not
    assert plan.count("Exchange hashpartitioning") <= 2


def test_q19_predicates_reach_scan(spark):
    from data_pipeline_who_gho_spark.plans.tpch2 import q19_disjunctive

    plan = _plan(q19_disjunctive(spark, SF))
    # the DNF's common l_quantity bounds must be pushed to the lineitem scan
    assert "PushedFilters: [" in plan
    assert "l_quantity" in plan.split("PushedFilters")[1][:400]


def test_train_split_no_join_no_extra_shuffle(spark):
    from data_pipeline_who_gho_spark.plans.training import train_split_assign

    plan = _plan(train_split_assign(spark, SF))
    # hash split is map-side; only the 3-group final agg shuffles
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_knn_probe_side_broadcasts(spark):
    from data_pipeline_who_gho_spark.plans.vector_analytics import knn_classify

    plan = _plan(knn_classify(spark, SF))
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q8_snowflake_all_dims_broadcast_one_shuffle(spark):
    from data_pipeline_who_gho_spark.plans.tpch3 import q8_market_share

    plan = _plan(q8_market_share(spark, SF))
    # part/customer/supplier/region and both nation roles must broadcast;
    # the one hashpartitioning exchange is the final year aggregate
    assert plan.count("BroadcastHashJoin") >= 6
    assert "SortMergeJoin" not in plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert "partial_sum" in plan


def test_q5_local_supplier_single_shuffle(spark):
    from data_pipeline_who_gho_spark.plans.tpch3 import q5_local_supplier

    plan = _plan(q5_local_supplier(spark, SF))
    assert plan.count("Exchange hashpartitioning") == 1
    # the o_orderdate range must reach the orders scan
    assert "GreaterThanOrEqual(o_orderdate" in plan
    assert "LessThan(o_orderdate" in plan


def test_heavy_hitters_candidates_broadcast(spark):
    from data_pipeline_who_gho_spark.plans.analytics4 import heavy_hitters

    plan = _plan(heavy_hitters(spark, SF))
    # the candidate semi-join must broadcast (never shuffle the token stream
    # for the join); re-count agg + candidate distinct are the only shuffles
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "SortMergeJoin" not in plan


def test_quantize_stats_broadcast_back(spark):
    from data_pipeline_who_gho_spark.plans.analytics4 import quantize_embeddings

    plan = _plan(quantize_embeddings(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_window_topn_uses_group_limit(spark):
    """rank <= k must plan as WindowGroupLimit (per-partition top-k
    pre-filter before the window sort — the optimization that keeps
    per-group top-n from materializing whole groups)."""
    from data_pipeline_who_gho_spark.plans.analytics import window_topn_per_group

    plan = _plan(window_topn_per_group(spark, SF))
    assert "WindowGroupLimit" in plan


def test_q2_part_filter_reaches_scan_dims_broadcast(spark):
    from data_pipeline_who_gho_spark.plans.tpch4 import q2_min_cost_supplier

    plan = _plan(q2_min_cost_supplier(spark, SF))
    # part subset + EUROPE supplier chain must all broadcast into lineitem
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan
    assert "LessThanOrEqual(p_size,15)" in plan and "EqualTo(p_type,ECONOMY)" in plan
    # (part,supplier) aggregate + per-part window are the only wide exchanges
    assert plan.count("Exchange hashpartitioning") == 2


def test_q11_scalar_total_broadcast_single_agg_shuffle(spark):
    from data_pipeline_who_gho_spark.plans.tpch4 import q11_important_parts

    plan = _plan(q11_important_parts(spark, SF))
    # the 1-row total joins via broadcast nested loop, never a shuffle
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "partial_sum" in plan


def test_q16_complaint_suppliers_anti_join_broadcasts(spark):
    from data_pipeline_who_gho_spark.plans.tpch4 import q16_supplier_part_counts

    plan = _plan(q16_supplier_part_counts(spark, SF))
    assert "LeftAnti" in plan and "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # count(distinct) must partial-aggregate before the exchange
    assert "partial_count" in plan


def test_q20_semi_join_broadcasts_dominant_set(spark):
    from data_pipeline_who_gho_spark.plans.tpch4 import q20_dominant_suppliers

    plan = _plan(q20_dominant_suppliers(spark, SF))
    assert "LeftSemi" in plan
    assert "SortMergeJoin" not in plan
    # 1997 range + part-name prefix must reach the scans
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "StringStartsWith(p_name,small)" in plan


def test_q21_single_wide_shuffle_group_by_join_key(spark):
    """The per-order aggregate must reuse the lineitem⋈orders join's
    hash partitioning on l_orderkey — no exchange between join and
    groupBy (the rewrite that replaces the textbook triple self-join)."""
    from data_pipeline_who_gho_spark.plans.tpch4 import q21_waiting_suppliers

    plan = _plan(q21_waiting_suppliers(spark, SF))
    assert "EqualTo(o_orderstatus,F)" in plan
    # exchanges: lineitem->orderkey (and orders->orderkey unless
    # broadcast) + final s_name agg; the orderkey groupBy adds none
    assert plan.count("Exchange hashpartitioning") <= 3
    assert "partial_count" in plan


def test_train_order_shuffle_uses_range_partitioning(spark):
    """The epoch permutation must be a range-partitioned global rank,
    never an unpartitioned window funneling the corpus into one task."""
    from data_pipeline_who_gho_spark.plans.curation3 import train_order_shuffle

    plan = _plan(train_order_shuffle(spark, SF))
    assert "rangepartitioning" in plan
    # no window without PARTITION BY over the full dataset: global_rank
    # windows are partitioned by the range-partition id
    assert "__pid" in plan


def test_hashed_doc_vectors_partial_agg_two_shuffles(spark):
    from data_pipeline_who_gho_spark.plans.curation3 import hashed_doc_vectors

    plan = _plan(hashed_doc_vectors(spark, SF))
    assert "partial_count" in plan  # map-side combine on (doc_id, bucket)
    # (doc_id,bucket) agg + doc_id re-agg/join only
    assert plan.count("Exchange hashpartitioning") <= 3


def test_stratified_split_broadcasts_source_offsets(spark):
    from data_pipeline_who_gho_spark.plans.curation3 import stratified_split_exact

    plan = _plan(stratified_split_exact(spark, SF))
    assert "rangepartitioning" in plan  # scale-safe global rank
    assert "BroadcastHashJoin" in plan  # per-source offsets broadcast back
    assert "SortMergeJoin" not in plan


def test_remove_duplicate_spans_ownership_partial_agg(spark):
    from data_pipeline_who_gho_spark.plans.curation2 import remove_duplicate_spans

    plan = _plan(remove_duplicate_spans(spark, SF))
    assert "partial_min" in plan  # fingerprint ownership map-side combined


def test_model_encoder_arrow_vectorized_no_row_python(spark):
    from data_pipeline_who_gho_spark.plans.curation5 import embed_with_model

    plan = _plan(embed_with_model(spark, SF))
    # the pandas_udf seam runs via Arrow, and EXACTLY once — a plain
    # posexplode makes Catalyst guard the generator input and evaluate
    # the encoder twice (2x inference cost for a real model)
    assert plan.count("ArrowEvalPython") == 1
    assert "BatchEvalPython" not in plan  # never row-at-a-time Python
    assert "CartesianProduct" not in plan


def test_url_dedup_single_shuffle_map_only_normalization(spark):
    from data_pipeline_who_gho_spark.plans.curation5 import url_normalize_dedup

    plan = _plan(url_normalize_dedup(spark, SF))
    # normalization is pure Catalyst expressions; only the url_norm
    # grain aggregation (plus its presentation sort) may shuffle
    assert plan.count("Exchange hashpartitioning") == 1
    assert "partial_count" in plan and "partial_min" in plan
    assert "PythonEval" not in plan and "BatchEvalPython" not in plan


def test_source_overlap_joins_on_fingerprint(spark):
    from data_pipeline_who_gho_spark.plans.curation6 import source_overlap_matrix

    plan = _plan(source_overlap_matrix(spark, SF))
    # the pair join must key on the fingerprint (bounded fan-out), and
    # the per-source totals must come back via broadcast, not shuffle
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_bloom_probe_is_map_side(spark):
    """The bloom probe must stay a projection against the broadcast
    bitmap: no hash-partitioning exchange between the batch scan and the
    maybe-present split, and the bitmap subtree built once (reused)."""
    from data_pipeline_who_gho_spark.plans.curation8 import (
        bloom_prune_incremental,
    )

    df = bloom_prune_incremental(spark, SF)
    df.collect()  # final adaptive plan (ReusedExchange materializes there)
    plan = _plan(df)
    # exactly ONE bitmap build: the second union branch reuses it
    assert "ReusedExchange" in plan
    # the only hashpartitioning exchanges are the bitmap's bit_or agg
    # (word_idx grain) — the probe side must contribute none
    hash_ex = [
        ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln
    ]
    assert all("word_idx" in ln for ln in hash_ex), hash_ex


def test_kmv_windows_are_key_grain(spark):
    """Every exchange in the KMV plan partitions by sketch keys (type /
    pair / member) — no single-partition global window anywhere."""
    from data_pipeline_who_gho_spark.plans.sketches import kmv_user_day_overlap

    plan = _plan(kmv_user_day_overlap(spark, SF))
    for ln in plan.splitlines():
        if "Exchange SinglePartition" in ln:
            raise AssertionError(f"global funnel in KMV plan: {ln}")


def test_triangle_join_has_partial_agg_edges(spark):
    """The pair-count aggregate (the one corpus-grain shuffle) must
    map-side combine before exchanging."""
    from data_pipeline_who_gho_spark.plans.extras import triangle_cosupply

    plan = _plan(triangle_cosupply(spark, SF))
    assert "partial_count" in plan


def test_lsh_multitable_stays_equi_join(spark):
    """The multi-table probe search must never plan a Hamming theta
    join: no CartesianProduct / BroadcastNestedLoopJoin anywhere, and
    the candidate dedup must run BEFORE vectors re-attach (the distinct
    exchange carries scalar ids, not embedding arrays)."""
    from data_pipeline_who_gho_spark.plans.extensions import (
        ann_lsh_multitable,
    )

    plan = _plan(ann_lsh_multitable(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the distinct's exchange partitions on (query_id, vec_id) only
    import re

    dedup_exchanges = [
        ln for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln and "query_id" in ln and "vec_id" in ln
    ]
    assert dedup_exchanges, "candidate dedup exchange not found"
    assert all("embedding" not in ln and " v#" not in ln for ln in dedup_exchanges)


def test_token_budget_sample_no_whole_group_window(spark):
    """The per-source running sum must never funnel a whole source
    through one task: every window over the big ranged relation
    partitions by (spark_partition_id, source), the range exchange is
    present, and the offsets/budgets attach by broadcast."""
    from data_pipeline_who_gho_spark.plans.curation10 import token_budget_sample

    plan = _plan(token_budget_sample(spark, "/root/testdata/sf0.001"))
    assert "Exchange rangepartitioning" in plan
    assert "BroadcastHashJoin" in plan
    # the data-sized window keys on the physical partition id — a
    # window spec of [source] alone over the ranged frame would be the
    # single-task-per-source trap
    import re

    specs = re.findall(r"Window \[[^\]]*\], \[([^\]]*)\]", plan)
    big_specs = [s for s in specs if "__pid" in s]
    assert big_specs, f"no __pid-partitioned window found: {specs}"


def test_media_decode_queries_decode_partition_locally(spark):
    """The four decode-stats queries (BMP/PPM, PNG, WAV, Y4M): decode
    must stay partition-local — nothing DOWNSTREAM of the Arrow pass
    shuffles.  The one allowed exchange is the round-robin spread of
    the NARROW id input below it (spread_for_python): without it the
    tiny id scan yields 1-2 splits and the Python stage runs on 1-2 of
    32 cores (measured live: flac_decode_stats 38 s → 3.7 s at sf1)."""
    from data_pipeline_who_gho_spark.plans.curation10 import media_decode_stats
    from data_pipeline_who_gho_spark.plans.curation11 import (
        audio_decode_stats,
        media_decode_png_stats,
        video_frame_stats,
    )

    for q in (media_decode_stats, media_decode_png_stats,
              audio_decode_stats, video_frame_stats):
        plan = _plan(q(spark, SF))
        assert "MapInPandas" in plan, q.__name__
        assert plan.count("Exchange") == 1, q.__name__
        assert "roundrobin" in plan.lower(), q.__name__
        # the exchange feeds the Arrow pass, never consumes it
        assert plan.find("MapInPandas") < plan.find("Exchange"), q.__name__
        # column pruning: only doc_id leaves the scan
        assert "text" not in plan.split("FileScan")[1][:400], q.__name__


def test_boilerplate_newline_single_linefreq_shuffle_and_broadcast(spark):
    """One hash shuffle for line document-frequency, the boiler sliver
    BROADCAST (never a shuffled join), one doc-grain aggregation."""
    from data_pipeline_who_gho_spark.plans.curation11 import (
        boilerplate_strip_newline,
    )

    plan = _plan(boilerplate_strip_newline(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "partial_count" in plan  # map-side combined line-frequency agg


def test_row_group_layout_plan_one_shuffle(spark):
    from data_pipeline_who_gho_spark.plans.curation11 import (
        row_group_layout_plan,
    )

    plan = _plan(row_group_layout_plan(spark, SF))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "partial_count" in plan and "partial_sum" in plan
    assert "Join" not in plan  # pure single-relation arithmetic


def test_runtime_bloom_filter_injects_on_selective_fact_join(spark):
    """The runtime bloom-filter join (SCALING.md round-8: 23.8× shuffle
    cut, gated to fire at ≥10 GiB scans) must still inject when the
    gate is cleared — a Spark upgrade or conf regression that silently
    loses it costs the big-join family its shuffle reduction at scale."""
    from pyspark.sql import functions as F

    from data_pipeline_who_gho_spark.sources.catalog import load_table

    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        part = load_table(spark, SF, "part").filter(F.col("p_brand") == "Brand#11")
        li = load_table(spark, SF, "lineitem")
        q = (
            li.join(part, li.l_partkey == part.p_partkey)
            .groupBy("p_brand")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        assert "might_contain" in _plan(q)
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_quality_gates_and_cdc_chunking_map_only(spark):
    """The r10 modality quality gates and the CDC chunk pass follow the
    decode-family invariant: one round-robin spread exchange BELOW the
    Arrow pass, nothing downstream shuffles."""
    from data_pipeline_who_gho_spark.plans.curation15 import (
        audio_quality_gates,
        image_quality_gates,
        video_scene_cut_stats,
    )
    from data_pipeline_who_gho_spark.plans.curation16 import cdc_chunk_stats

    for q in (audio_quality_gates, image_quality_gates,
              video_scene_cut_stats, cdc_chunk_stats):
        plan = _plan(q(spark, SF))
        assert "MapInPandas" in plan, q.__name__
        assert plan.count("Exchange") == 1, q.__name__
        assert "roundrobin" in plan.lower(), q.__name__
        assert plan.find("MapInPandas") < plan.find("Exchange"), q.__name__
    # the id-only gates must prune text from the scan
    for q in (audio_quality_gates, image_quality_gates,
              video_scene_cut_stats):
        plan = _plan(q(spark, SF))
        assert "text" not in plan.split("FileScan")[1][:400], q.__name__


def test_exif_orientation_neardup_checkpoints_fingerprints_once(spark):
    """The orientation-aware banded self-join must read the
    localCheckpoint-ed fingerprint relation on BOTH sides (decode runs
    once), with a hash-agg'd equi-join and no cartesian product."""
    from data_pipeline_who_gho_spark.plans.curation14 import (
        exif_orientation_neardup,
    )

    plan = _plan(exif_orientation_neardup(spark, SF))
    assert "MapInPandas" not in plan  # both sides read the checkpoint
    assert plan.count("Scan ExistingRDD") == 2
    assert "CartesianProduct" not in plan
    assert "partial_count" in plan


def test_cdc_shared_chunks_single_hash_shuffle(spark):
    """Chunk-level dedup: the only hash shuffle is the chunk_md5
    aggregation, with map-side partial aggregation below it."""
    from data_pipeline_who_gho_spark.plans.curation16 import (
        cdc_shared_chunks,
    )

    plan = _plan(cdc_shared_chunks(spark, SF))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "partial_count" in plan
    assert "Join" not in plan  # aggregation, not a self-join


def test_crossmodal_union_checkpoints_and_no_smj(spark):
    """Both fingerprint relations are checkpointed (no MapInPandas in
    the join plan = no re-decode), and the either-modality union is a
    union + single hash agg — no full-outer SortMergeJoin, never a
    cartesian product."""
    from data_pipeline_who_gho_spark.plans.curation16 import (
        crossmodal_dedup_union,
    )

    plan = _plan(crossmodal_dedup_union(spark, SF))
    assert "MapInPandas" not in plan
    assert plan.count("Scan ExistingRDD") == 4  # 2 relations x 2 sides
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "partial_sum" in plan  # the union agg combines map-side
