"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with the noop sink (full execution, no
driver-side collect bottleneck), mirroring how a cluster job would sink.

FAST-PHASE PROTOCOL (r11): this host swings between invisible speed
phases (the same fixed Python loop measured 0.32 s and 0.95 s hours
apart with zero guest-visible steal — r10's committed artifact landed
in a slow phase and was incomparable to other rounds' without trusting
prose).  The bench therefore (a) runs a Spark-independent calibration
before AND between the three interleaved passes, (b) if any reading
falls outside the established fast band, re-runs the whole measurement
(<= $SPARK_GRAFT_BENCH_ATTEMPTS attempts, default 3, spaced
$SPARK_GRAFT_BENCH_SPACING s, default 300), and (c) records EVERY
attempt's per-query timings plus a frozen Spark-JVM canary in the
artifact, so the committed JSON is judgeable on its own: the headline
is the first fast-phase attempt, and the canary — a plan-pinned
trivial JVM aggregation whose slowdown sensitivity matches the Spark
workload, unlike r10's single-thread Python loop-units metric, which
overcorrected (loop slowed 1.94x while Spark queries slowed ~1.25x)
and was removed — lets any two rounds' artifacts be compared directly.

MATCHED-CALIB COMPARISON (r12): the artifact additionally ships a
``vs_prev`` block pairing this run's attempts with the latest
committed BENCH_r*.json's attempts at NEAREST calib_loop_median, and
reports the per-query ratios at that matched phase — the cross-round
answer ("did the engine regress?") now lives in the artifact itself
instead of in quiet-run prose.
"""

from __future__ import annotations

import hashlib
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

# Established fast-phase band for the fixed single-core Python loop
# (seconds): readings across r07-r10 fast phases were 0.31-0.41.  The
# 8-process parallel loop reads ~= the single-core loop when the host
# is uncapped; 0.65 allows pool fork/teardown overhead while still
# catching the observed 2-3x capped phases.
# CANARY REFERENCE (r11, 289-plan registry): four quiet-box runs read
# raw legacy17 15.5 / 17.2 / 18.1 s (all in-band calib 0.30-0.37) with
# per_canary 48.8 / 55.6 / 55.1 — the 15.5 s run matches r10's
# fast-phase 15.29-15.33 s on bit-identical plans (engine unregressed).
# Lesson recorded honestly: the canary moves WITH the workload (unlike
# the Python loop, which overcorrects ~2x) but is not phase-invariant
# either; compare rounds at MATCHED calib using the per-attempt series
# the artifact ships, and treat per_canary as a secondary signal.
_FAST_LOOP_BAND = (0.28, 0.43)
_FAST_MP8_MAX = 0.65


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _mp_spin(_):
    """Worker for the multi-core calibration loop (module-level so the
    multiprocessing pool can pickle it)."""
    y = 0
    for i in range(10_000_000):
        y += i
    return y


def _loop_calib() -> float:
    """The fixed single-core Python loop (the cross-round yardstick)."""
    t0 = time.time()
    x = 0
    for i in range(10_000_000):
        x += i
    return round(time.time() - t0, 3)


def _mp8_calib() -> float:
    """8 concurrent processes running the same loop: catches hypervisor
    multi-core capping that a single-thread loop cannot see (observed
    live in the r10 session)."""
    import multiprocessing as _mp

    t0 = time.time()
    with _mp.Pool(8) as pool:
        pool.map(_mp_spin, range(8))
    return round(time.time() - t0, 3)


def _matmul_calib() -> float:
    import numpy as np

    a = np.random.default_rng(0).random((2000, 2000))
    t0 = time.time()
    for _ in range(3):
        (a @ a).sum()
    return round(time.time() - t0, 3)


def _canary(spark):
    """The frozen Spark-JVM canary: a constant-defined, IO-free,
    whole-stage-codegen aggregation over 32 slices.  Its wall time
    moves with the SAME host effects (JVM thread throttling, multi-core
    capping) as the headline queries — the right yardstick for
    normalizing cross-round comparisons, where a Python loop is not.
    DO NOT change the constants: the artifact pins the normalized plan
    hash so any drift is visible."""
    from pyspark.sql import functions as F

    return (
        spark.range(0, 320_000_000, 1, 32)
        .select(
            F.sum((F.col("id") * 2 + 1) % 1000003).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def _canary_plan_md5(df) -> str:
    plan = df._jdf.queryExecution().executedPlan().toString()
    # strip expression ids AND plan ids: both are session counters that
    # differ per build of the identical plan
    plan = re.sub(r"#\d+", "#", plan)
    plan = re.sub(r"plan_id=\d+", "plan_id=", plan)
    return hashlib.md5(plan.encode()).hexdigest()


def _run_attempt(spark, queries, sf_dir: str) -> dict:
    """One full measurement: calib -> (canary + pass) x3 with calib
    between passes -> calib.  Returns every reading; ``fast_phase`` is
    True iff all loop/mp8 calibs landed in the established band."""
    loops = [_loop_calib()]
    mp8s = [_mp8_calib()]
    canary_df = _canary(spark)
    canary_secs: list[float] = []
    timings: dict[str, float] = {n: float("inf") for n in HEADLINE}
    for p in range(3):
        t0 = time.time()
        force(canary_df)
        canary_secs.append(round(time.time() - t0, 3))
        for name in HEADLINE:
            t0 = time.time()
            force(queries[name](spark, sf_dir))
            timings[name] = min(timings[name], time.time() - t0)
        loops.append(_loop_calib())
        if p < 2:
            mp8s.append(_mp8_calib())
    timings = {n: round(v, 3) for n, v in timings.items()}
    legacy17 = sum(
        v for n, v in timings.items()
        if n not in _REBASED_R09 and n not in _REBASED_R10
    )
    # MEDIAN readings classify the attempt: single readings carry ±10%
    # noise (a 0.278 edge reading must not disqualify a genuinely fast
    # attempt, nor one lucky reading qualify a capped one)
    med_loop = sorted(loops)[len(loops) // 2]
    med_mp8 = sorted(mp8s)[len(mp8s) // 2]
    fast = (
        _FAST_LOOP_BAND[0] <= med_loop <= _FAST_LOOP_BAND[1]
        and med_mp8 <= _FAST_MP8_MAX
    )
    return {
        "queries": timings,
        "total": round(sum(timings.values()), 3),
        "legacy17_total": round(legacy17, 3),
        "r09_18_total": round(
            sum(v for n, v in timings.items() if n not in _REBASED_R10), 3
        ),
        "canary_sec": canary_secs,
        "calib_loop_sec": loops,
        "calib_mp8_sec": mp8s,
        "calib_loop_median": med_loop,
        "calib_mp8_median": med_mp8,
        "fast_phase": fast,
    }


def _vs_prev(attempts: list[dict]) -> dict | None:
    """Matched-calib cross-round comparison (VERDICT r11 task 3): pair
    this run's attempts with the LATEST committed BENCH_r*.json that
    ships per-attempt series (r11+ format), at the NEAREST
    calib_loop_median — so the reported per-query ratios compare the
    engine at the same host phase, killing the prose dependency of
    slow-side vs quiet-run readings (the r11 18.94-vs-15.52 ambiguity).
    Ratio > 1 = this round slower than the previous at matched phase."""
    import glob

    root = os.path.dirname(os.path.abspath(__file__))

    def round_no(path: str) -> int:
        m = re.search(r"r(\d+)", os.path.basename(path))
        return int(m.group(1)) if m else -1

    def extract_attempts(rec: dict) -> list | None:
        if isinstance(rec.get("parsed"), dict):
            rec = rec["parsed"]  # driver wraps bench stdout as "parsed"
        if isinstance(rec.get("attempts"), list) and rec["attempts"]:
            return rec["attempts"]
        # the driver keeps only the TAIL of stdout (observed: r11's
        # "parsed" is null and the JSON line's head is cut) — recover
        # the attempts array by bracket-matching inside the tail
        tail = rec.get("tail")
        if not isinstance(tail, str):
            return None
        k = tail.find('"attempts": [')
        if k < 0:
            return None
        s = tail[k + len('"attempts": '):]
        depth = 0
        for end, ch in enumerate(s):
            if ch == "[":
                depth += 1
            elif ch == "]":
                depth -= 1
                if depth == 0:
                    try:
                        return json.loads(s[:end + 1]) or None
                    except ValueError:
                        return None
        return None

    cands = []
    for path in sorted(glob.glob(os.path.join(root, "BENCH_r*.json")),
                       key=round_no):
        try:
            with open(path) as fh:
                rec = json.load(fh)
        except (OSError, ValueError):
            continue
        prev_attempts = extract_attempts(rec)
        if prev_attempts:
            cands.append((path, prev_attempts))
    if not cands:
        return None
    path, prev_attempts = cands[-1]
    rec = {"attempts": prev_attempts}
    pairs = [
        (abs(a["calib_loop_median"]
             - b.get("calib_loop_median", float("inf"))), i, j)
        for i, a in enumerate(attempts)
        for j, b in enumerate(rec["attempts"])
    ]
    delta, i, j = min(pairs)
    a, b = attempts[i], rec["attempts"][j]
    shared = sorted(
        n for n, v in a["queries"].items()
        if b.get("queries", {}).get(n, 0) > 0
    )
    if not shared:
        return None
    ratios = {n: round(a["queries"][n] / b["queries"][n], 3) for n in shared}
    vals = sorted(ratios.values())
    prev_legacy = b.get("legacy17_total")
    return {
        "prev_artifact": os.path.basename(path),
        "this_attempt": i + 1,
        "prev_attempt": j + 1,
        "calib_this": a["calib_loop_median"],
        "calib_prev": b.get("calib_loop_median"),
        "calib_delta": round(delta, 3),
        "legacy17_ratio": (
            round(a["legacy17_total"] / prev_legacy, 3)
            if prev_legacy else None
        ),
        "per_query_ratio_median": vals[len(vals) // 2],
        "per_query_ratio_minmax": [vals[0], vals[-1]],
        "worst_ratios": sorted(
            ratios.items(), key=lambda kv: -kv[1]
        )[:3],
        "n_shared_queries": len(shared),
        "note": (
            "per-query ratios at MATCHED calib phase (nearest "
            "loop-median attempt pairing); > 1 = slower than the "
            "previous committed round at the same host phase"
        ),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    max_attempts = int(os.environ.get("SPARK_GRAFT_BENCH_ATTEMPTS", "3"))
    spacing = float(os.environ.get("SPARK_GRAFT_BENCH_SPACING", "300"))

    load_start = os.getloadavg()  # BEFORE the JVM spins up: ambient load
    matmul = _matmul_calib()
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()

    # warm JVM/codegen paths on the tiny sf, and the OS page cache +
    # parquet footers for the bench tables (steady-state measurement);
    # one canary run warms its codegen path too
    force(queries["a1_star_join_revenue"](spark, "/root/testdata/sf0.001"))
    from data_pipeline_who_gho_spark.sources.catalog import TABLES, load_table
    for t in TABLES:
        load_table(spark, sf_dir, t).count()
    canary_df = _canary(spark)
    force(canary_df)

    # each attempt's per-query timings are best-of-3 INTERLEAVED passes:
    # steady-state throughput with GC/compilation noise damped, and a
    # multi-second host burst lands inside one pass rather than
    # poisoning every measurement of the same query
    attempts: list[dict] = []
    for i in range(max_attempts):
        attempts.append(_run_attempt(spark, queries, sf_dir))
        if attempts[-1]["fast_phase"]:
            break
        if i < max_attempts - 1:
            time.sleep(spacing)  # wait out the slow phase, then retry

    fast_attempts = [a for a in attempts if a["fast_phase"]]
    headline = min(
        fast_attempts or attempts, key=lambda a: a["total"]
    )
    if fast_attempts:
        note = (
            f"headline is attempt {attempts.index(headline) + 1} of "
            f"{len(attempts)} (best fast-phase attempt): median calib "
            f"readings inside the fast band {list(_FAST_LOOP_BAND)} — "
            "totals comparable to other fast-phase rounds as-is"
        )
    else:
        note = (
            f"NO fast-phase attempt in {len(attempts)} tries (calib "
            "readings outside the band throughout) — raw totals reflect "
            "a slow host phase; compare via canary_sec: the frozen "
            "Spark-JVM canary slows with the workload, so "
            "legacy17_total / median(canary_sec) is the cross-round "
            "comparable"
        )
    med_canary = sorted(headline["canary_sec"])[len(headline["canary_sec"]) // 2]
    # TRUNCATION-PROOF ARTIFACT (r14, VERDICT r13 task 2): r12's
    # committed artifact captured only an unparseable mid-JSON tail of
    # the ever-growing one-line record, so the driver could not compute
    # round-over-round numbers (PERF_r13 prev_sec all null).  The
    # stdout line is now COMPACT (guaranteed well under 4 KB): the
    # per-attempt entries keep exactly what the matched-calib
    # comparison needs (queries, totals, calib medians, fast_phase) and
    # drop the raw calib/canary series, which move to a side file
    # (.scratch/bench_detail_last.json) for humans.  Same measurements,
    # same methodology, same keys — only the artifact emission changed.
    # KEY ORDER still matters: bulk first, summary last, so even an
    # end-biased truncation preserves metric/value/queries.
    _SLIM_KEYS = (
        "queries",
        "total",
        "legacy17_total",
        "r09_18_total",
        "calib_loop_median",
        "calib_mp8_median",
        "fast_phase",
    )
    slim_attempts = [{k: a[k] for k in _SLIM_KEYS} for a in attempts]
    record = (
            {
                "attempts": slim_attempts,
                "rebase_note": (
                    "r09 added media_decode_png_stats, r10 added "
                    "crawl_ingest_e2e to the headline set; legacy17_total "
                    "is the r01-r08-comparable figure and r09_18_total the "
                    "r09-comparable one"
                ),
                "queries": headline["queries"],
                "vs_prev": _vs_prev(attempts),
                "host_phase_note": note,
                "fast_phase": headline["fast_phase"],
                "fast_loop_band": list(_FAST_LOOP_BAND),
                "canary_sec": headline["canary_sec"],
                "canary_plan_md5": _canary_plan_md5(canary_df),
                # guard: canary is ~0.5 s by construction; if a future
                # edit makes it sub-10ms the ratio is meaningless
                "legacy17_per_canary": (
                    round(headline["legacy17_total"] / med_canary, 2)
                    if med_canary >= 0.01 else None
                ),
                "matmul_sec": matmul,
                "loadavg_start": [round(v, 2) for v in load_start],
                "loadavg_end": [round(v, 2) for v in os.getloadavg()],
                "cpus": os.cpu_count(),
                "legacy17_total": headline["legacy17_total"],
                "r09_18_total": headline["r09_18_total"],
                "metric": "headline_queries_total_best_of_3_sec",
                "value": headline["total"],
                "unit": "sec",
                "sf": sf,
            }
    )
    print(json.dumps(record))
    # full per-attempt series (raw calib/canary readings) for humans —
    # never needed by the driver's comparison, so it lives off-artifact
    try:
        detail_dir = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), ".scratch"
        )
        os.makedirs(detail_dir, exist_ok=True)
        with open(os.path.join(detail_dir, "bench_detail_last.json"), "w") as fh:
            json.dump(dict(record, attempts=attempts), fh)
    except OSError:
        pass  # detail file is best-effort; the stdout line is the artifact


if __name__ == "__main__":
    main()
