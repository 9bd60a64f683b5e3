"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with the noop sink (full execution, no
driver-side collect bottleneck), mirroring how a cluster job would sink.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from data_pipeline_who_gho_spark.session import get_spark

HEADLINE = [
    "a1_star_join_revenue",
    "agg_pricing_summary",
    "window_topn_per_group",
    "sessionize_events",
    "json_extraction",
    "etl_clean_observations",
    "etl_upsert_merge",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "text_stats",
    "ann_cosine_topk",
    "q3_shipping_priority",
    "asof_join_events",
    # r05: representatives of the three most expensive families per
    # SCALING.md, previously absent from the headline set
    "dedup_simhash",
    "semantic_dedup_reps",
    "bpe_token_counts",
    # r09 RE-BASE: first decode-family representative (the 17-query set
    # predates the media stack; this row tracks the PNG un-filter work
    # directly).  The comparable legacy total is preserved alongside as
    # legacy17_total — compare r01-r08 BENCH values against THAT.
    "media_decode_png_stats",
    # r10 RE-BASE: first crawl-ingest representative (WARC -> HTTP split
    # -> boilerplate-stripped extraction composition) — the 18-query r09
    # set predates the ingest arc.  legacy17_total and r09_18_total
    # preserve the comparables.
    "crawl_ingest_e2e",
]
_REBASED_R09 = {"media_decode_png_stats"}
_REBASED_R10 = {"crawl_ingest_e2e"}


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _mp_spin(_):
    """Worker for the multi-core calibration loop (module-level so the
    multiprocessing pool can pickle it)."""
    y = 0
    for i in range(10_000_000):
        y += i
    return y


def _calibrate() -> dict[str, float]:
    """Spark-independent host-speed yardstick, run before the JVM
    starts: a fixed single-core Python loop and a fixed numpy matmul.
    Round-over-round bench drift that tracks these numbers is the HOST
    (steal/frequency/thermal), not the engine — the r07->r08 +20%
    uniform drift across 17 unchanged plans motivated recording it."""
    import time as _t

    import numpy as np

    t0 = _t.time()
    x = 0
    for i in range(10_000_000):
        x += i
    py = _t.time() - t0
    a = np.random.default_rng(0).random((2000, 2000))
    t0 = _t.time()
    for _ in range(3):
        (a @ a).sum()
    mm = _t.time() - t0
    # MULTI-core yardstick: 8 concurrent processes each running the
    # same loop.  The r10 session found host phases where the
    # single-core loop reads fast but wide parallel work is throttled
    # (hypervisor CPU capping) — a single-thread calib cannot see that;
    # in an uncapped phase this wall time ~= python_loop_sec.
    import multiprocessing as _mp

    t0 = _t.time()
    with _mp.Pool(8) as pool:
        pool.map(_mp_spin, range(8))
    mp8 = _t.time() - t0
    return {
        "python_loop_sec": round(py, 3),
        "matmul_sec": round(mm, 3),
        "mp8_loop_sec": round(mp8, 3),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    load_start = os.getloadavg()  # BEFORE the JVM spins up: ambient load
    calib = _calibrate()  # Spark-independent host-speed yardstick
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()

    # warm JVM/codegen paths on the tiny sf, and the OS page cache +
    # parquet footers for the bench tables (steady-state measurement)
    force(queries["a1_star_join_revenue"](spark, "/root/testdata/sf0.001"))
    from data_pipeline_who_gho_spark.sources.catalog import TABLES, load_table
    for t in TABLES:
        load_table(spark, sf_dir, t).count()

    # best-of-3 per query, measured as three INTERLEAVED passes over the
    # whole list: steady-state throughput with GC/compilation noise
    # damped, and — unlike back-to-back repeats — a multi-second host
    # steal burst (observed on the shared box) lands inside one pass and
    # cannot poison every measurement of the same query
    timings: dict[str, float] = {n: float("inf") for n in HEADLINE}
    for _ in range(3):
        for name in HEADLINE:
            t0 = time.time()
            force(queries[name](spark, sf_dir))
            timings[name] = min(timings[name], time.time() - t0)
    timings = {n: round(v, 3) for n, v in timings.items()}

    # machine-load context: BENCH_r07 read +18% vs r06 with ZERO plan
    # drift (judged environmental); recording the 1/5/15-min loadavg
    # alongside lets any future drift be attributed without a rerun
    legacy17 = sum(
        v for n, v in timings.items()
        if n not in _REBASED_R09 and n not in _REBASED_R10
    )
    r09_18 = sum(v for n, v in timings.items() if n not in _REBASED_R10)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_best_of_3_sec",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "legacy17_total": round(legacy17, 3),
                "r09_18_total": round(r09_18, 3),
                # host-normalized figure (see tools/round_close.py's
                # history report): raw totals from different host phases
                # are incomparable — the r10 session measured the SAME
                # calibration loop at 0.32 s and 0.95 s hours apart with
                # zero guest-visible steal.  Established fast-phase band:
                # calib 0.32-0.41 s, legacy17 33-38 loop-units.
                "legacy17_loop_units": round(
                    legacy17 / calib["python_loop_sec"], 1
                ),
                "host_phase_note": (
                    "calib outside the 0.32-0.41 s fast-phase band -> "
                    "raw totals reflect a slow host phase, compare "
                    "legacy17_loop_units instead"
                    if not 0.30 <= calib["python_loop_sec"] <= 0.43
                    else "calib in the fast-phase band"
                ),
                "rebase_note": (
                    "r09 added media_decode_png_stats, r10 added "
                    "crawl_ingest_e2e to the headline set; legacy17_total "
                    "is the r01-r08-comparable figure and r09_18_total the "
                    "r09-comparable one"
                ),
                "sf": sf,
                "calib": calib,
                "loadavg_start": [round(v, 2) for v in load_start],
                "loadavg_end": [round(v, 2) for v in os.getloadavg()],
                "cpus": os.cpu_count(),
            }
        )
    )


if __name__ == "__main__":
    main()
