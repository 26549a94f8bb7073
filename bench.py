"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line with per-query wall times.

Each query is forced to FULL materialization: the timing action aggregates a
hash over every result column, so Catalyst cannot prune final-projection
expressions the way a bare count() would (a narrow per-row transform query
timed with count() reads as nearly free — its projections never run).

Each query runs once UNTIMED at the target sf_dir (whole-stage-codegen
units are keyed by the physical plan, and AQE's runtime re-plan means the
sf0.1 plan compiles different classes than any smaller warm-up scale — a
cold first run is dominated by multi-second C2 JIT churn, not the query),
then $SPARK_GRAFT_BENCH_REPEATS timed times (default 4) with the MEDIAN
reported (round 12+; rounds ≤11 recorded the min). The r11 same-box
worktree adjudication measured ±30% swings on sub-second queries between
two quiet runs minutes apart — a 4-sample MIN is a draw from that band's
floor, so consecutive rounds spent judge time re-litigating noise. The
median is the statistic whose cross-round ratio actually tracks code
changes; per-rep min/median/max still land in BENCH_DETAIL.json, and the
stdout line carries ``value_min`` for continuity with the pre-r12 series
plus ``value_per_calib`` (median total ÷ calib_s — the host-speed-
normalized number cross-round comparisons should use first). No DataFrame
is cached anywhere in the registry, so the warm-up carries over only
compiled code and OS page cache, exactly what steady state on a
long-lived cluster looks like.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from mlops_pipelines_featurestore_gcp_spark import get_spark, plans  # noqa: E402

# Headline set: one per operator family — scan/agg, top-k, multi-join, semi,
# window, rollup, range-join, distinct, json, plus the LLM-data operators
# (added as their modules land).
HEADLINE = [
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q04_order_priority_semi",
    "q05_nation_volume",
    "q06_forecast_revenue",
    "q08_outer_join_counts",
    "q09_window_navigation",
    "q12_rollup_cube",
    "q17_date_conditional_agg",
    "q20_range_join_latency",
    "q25_json_and_case",
    # LLM-corpus operators
    "d01_exact_dedup",
    "d02_minhash_lsh_neardup",
    "d05_embedding_neardup",
    "d06_exact_substring_spans",
    "s01_ann_bruteforce_topk",
    "t01_text_profile",
    "t04_doc_fingerprint",
    "t05_chunk_documents",
    "t06_contamination_check",
    "t08_sequence_pack",
    # event-time windows
    "st01_tumbling_window",
    "st03_session_window",
    # feature store
    "f03_asof_spine_join",
]

# Second headline set (VERDICT r5 #6): the post-r4 operator families, so
# their perf is tracked round-over-round without disturbing the stable
# 24-query set's cross-round comparability. Same timing protocol; totals
# are reported side by side in the ONE output JSON line.
HEADLINE2 = [
    "d08_keep_best_exact",
    "t17_soft_dedup_weights",
    "s07_per_source_cap",
    "t18_heavy_hitters_cms",
    "q33_binned_range_join",
    "q34_window_funnel",
    "q35_sessionize_stats",
    "q36_retention_cohorts",
    "f06_feature_drift",
    "st06_continuous_rollup",
    "st07_distinct_rollup",
    "mm05_audio_neardup",
    # round 7 additions — value_new_ops grows by their own time vs the r6
    # total; compare per-query series (queries_new_ops) across rounds, the
    # totals only within a round.
    "mm07_media_keep_best",
    "mm08_video_keep_best",
    "s10_ann_ivfpq_persisted",
    "q37_skew_salted_topk",
    "st08_interval_join",
    "st09_quantile_rollup",
    "q38_data_expectations",
    "ml06_ranking_metrics",
    # round 8 addition — same series rule as the r7 block above.
    "d10_semantic_keep_star",
    # round 11 addition: canonical-URL dedup + host downsample (two keyed
    # windows, pure codegen string ops).
    "d11_url_host_dedup",
    # round 9 addition: PCA-rotation fit (one constant-width DECIMAL
    # aggregate) + map-side projection + flag verification.
    "s11_embedding_whitening",
    # round 12 addition: hybrid retrieval — exact-cosine recall + BM25
    # rerank in the amortized bm25_fit/search-many shape.
    "c04_hybrid_rerank",
    # q39_tfrecord_roundtrip and q40_clustered_layout are EXCLUDED by
    # decision: both are IO-shaped (q39 writes+rereads a TFRecord dir,
    # q40 compacts/clusters/z-orders parquet layouts), so their wall time
    # tracks /tmp filesystem throughput and job-scheduling overhead of
    # dozens of small write jobs, not engine operator cost — the series
    # would be fs-noise. Their perf evidence is LOCAL_GATE.md per-scale
    # timings and the layout-contrast flags hashed inside q40 itself.
    # ml07_quality_classifier is EXCLUDED by the same decision class as
    # d09 below: its registered form is a sequential driver loop (12 GD
    # steps + 2 gradient-parity passes + 2 AUC scans, each a tiny
    # driver-roundtrip job over a checkpointed feature frame), so 4 timed
    # reps would track job-scheduling latency (~25-35s/rep, >2x the
    # heaviest real entry) rather than operator cost. Its perf evidence is
    # the per-scale LOCAL_GATE.md timings and the 100x scale-sweep
    # exponent; the per-iteration aggregate is ONE constant-width pass by
    # construction (ml/classifier.py docstring).
    # s12_index_compaction (round 13) is EXCLUDED by the q39/q40 decision
    # class: its registered form is the full index LIFECYCLE (fresh
    # build → two upsert appends → probe → compact-rewrite → probe), a
    # dozen small write/collect jobs whose wall time tracks filesystem
    # throughput and job-scheduling latency (~31-38s across all three
    # sf fixtures — fixed overhead, not data). Perf evidence: LOCAL_GATE
    # per-scale timings, the 10x gate row, and the measured 4.4x warm-
    # probe win compaction exists for (ROUND12_NOTES).
    # c05_ann_hybrid_fused (round 13) is EXCLUDED by the ml07 decision
    # class: verifier-dominated — the registered form runs an
    # INDEPENDENT inline BM25 refit, a brute-force recall truth, and
    # three full-outer membership/parity joins beside the operator path,
    # so reps would time the contract, not the composition. The
    # operator-path constituents are already benchmarked: the ANN tier
    # via s10/s09-family entries, BM25 rerank via c04, fusion is one
    # union+groupBy shuffle (rerank.py rrf_fuse).
    # d09_incremental_dedup is EXCLUDED by decision, not oversight: its
    # registered form runs three sequential ingests + a one-shot rebuild
    # (dozens of store-write jobs), ~15s of Spark wall at sf0.1 dominated
    # by job-scheduling overhead, not operator cost — 5 bench repeats
    # would double the entire bench for a series that tracks scheduler
    # noise. Its perf evidence is the batch-∝ design (SCALING.md) and the
    # per-scale gate timings in LOCAL_GATE.md.
]


def _mirror_multi_rowgroup(sf_dir: str, *, splits: int = 32) -> str:
    """One-time re-layout of the fixture dir into multi-row-group parquet.

    The driver's fixtures are written as ONE row group per table; parquet
    is splittable only at row-group boundaries, so every scan decodes on a
    single core no matter the parallelism — a fixture artifact no
    production table has (VERDICT r3 #10 profiled 0.78s of q01's 1.29s as
    serial fixture decode). The bench measures the ENGINE, so it re-lays
    the input out once (pyarrow rewrite, ~seconds, OUTSIDE all timings —
    the batch-load step any ingest pipeline runs) into row groups sized to
    split ``splits`` ways. Data is byte-identical, only the layout
    changes; set SPARK_GRAFT_BENCH_MIRROR=0 to benchmark the raw fixture
    files instead.
    """
    import hashlib

    import pyarrow.parquet as pq

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    dst = f"/tmp/spark_graft_bench_mirror_{tag}"
    os.makedirs(dst, exist_ok=True)
    for fname in sorted(os.listdir(sf_dir)):
        if not fname.endswith(".parquet"):
            continue
        src, out = os.path.join(sf_dir, fname), os.path.join(dst, fname)
        if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
            continue
        t = pq.read_table(src)
        pq.write_table(t, out, row_group_size=max(1024, -(-t.num_rows // splits)))
    return dst


def _wait_for_quiet(
    threshold: float, max_wait: float, poll: float = 5.0
) -> tuple[float, bool]:
    """Bounded wait until the 1-min loadavg drops below ``threshold``.

    The box shares CPUs with external load; r8's driver record (15.75s at
    loadavg 2.9-6.9) vs the quiet-box 13.16s showed the series recording
    a 1.14× "regression" that was entirely neighbor contention (VERDICT
    r8 "what's wrong" #2). Waiting is best-effort — if the box never
    quiets within ``max_wait`` the bench runs anyway and self-flags the
    result ``contended`` so the series can filter on it.

    Returns (seconds_waited, still_contended).
    """
    waited = 0.0
    while os.getloadavg()[0] >= threshold and waited < max_wait:
        time.sleep(poll)
        waited += poll
    return waited, os.getloadavg()[0] >= threshold


def _calib_work() -> None:
    """One unit of calibration work: 256 MB through md5 (no IO/JVM)."""
    import hashlib

    block = b"\x5a" * 65536
    h = hashlib.md5()
    for _ in range(4096):
        h.update(block)


def _calibrate(reps: int = 3) -> float:
    """Fixed synthetic CPU-bound calibration job: 256 MB through md5,
    single-threaded, no IO, no fixtures, no JVM — min of ``reps`` runs.

    The r9 bisect proved host-level slowdown INVISIBLE to guest loadavg
    and steal counters: the unmodified r8 commit re-benched 17.87s against
    its own recorded 13.16s on the same box (VERDICT r9 "what's wrong"
    #2). ``calib_s`` makes the drift measurable in-band — cross-round
    comparisons divide by it instead of trusting absolute seconds, so a
    1.3× uptick on untouched queries with a 1.3× calib reads as host
    drift, not regression, without a worktree bisect.
    """
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _calib_work()
        best = min(best, time.perf_counter() - t0)
    return best


def _calibrate_multicore(nproc: int, reps: int = 2) -> float:
    """N-way md5 burst: ``nproc`` forked processes each run the SAME work
    unit as ``_calibrate``; returns the min wall of ``reps`` bursts.

    r13 found a steal mode the single-core probe cannot see: ``calib_s``
    *improved* 17% while 10/24 untouched bench controls read >10% worse —
    bursty host-level multi-core steal (a 32-process md5 burst measured
    45% steal with windows of ~2 effective cores) that only shows up when
    every core is asked for at once (VERDICT r13 "what's wrong" #2 /
    "next round" #2). Ideal wall equals ``calib_s``; effective
    parallelism is ``nproc * calib_s / calib_mc_s``, so a round where
    untouched queries move with ``calib_mc_s`` while ``calib_s`` holds
    reads as host steal, not regression, in-band.
    """
    import multiprocessing as mp

    ctx = mp.get_context("fork")
    best = float("inf")
    for _ in range(reps):
        procs = [ctx.Process(target=_calib_work) for _ in range(nproc)]
        t0 = time.perf_counter()
        for p in procs:
            p.start()
        for p in procs:
            p.join()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    # quiet-box guard BEFORE the JVM starts (our own startup inflates the
    # 1-min window). Tunables: SPARK_GRAFT_BENCH_QUIET_LOAD (threshold,
    # default 1.5; 0 disables), SPARK_GRAFT_BENCH_QUIET_WAIT (bound, s).
    quiet_load = float(os.environ.get("SPARK_GRAFT_BENCH_QUIET_LOAD", "1.5"))
    quiet_wait = float(os.environ.get("SPARK_GRAFT_BENCH_QUIET_WAIT", "180"))
    waited, contended = (0.0, False)
    if quiet_load > 0:
        waited, contended = _wait_for_quiet(quiet_load, quiet_wait)
        if waited:
            print(
                f"# waited {waited:.0f}s for quiet box "
                f"(still contended: {contended})", file=sys.stderr,
            )
    # host-speed calibration AFTER the quiet wait, BEFORE the JVM exists
    # (no competing threads of our own): see _calibrate's docstring.
    calib = _calibrate()
    print(f"# calib_s: {calib:.4f}", file=sys.stderr)
    # multi-core burst probe AFTER the single-core one, same pre-JVM
    # window; nproc follows the core count the bench itself runs with
    ncpu = max(1, int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    calib_mc = _calibrate_multicore(ncpu)
    print(
        f"# calib_mc_s: {calib_mc:.4f} (nproc={ncpu}, eff. parallelism "
        f"{ncpu * calib / calib_mc:.1f})", file=sys.stderr,
    )
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    if os.environ.get("SPARK_GRAFT_BENCH_MIRROR", "1") != "0":
        sf_dir = _mirror_multi_rowgroup(sf_dir)
        # let a 32-row-group file actually split 32 ways: the default 128MB
        # split floor collapses these ~10-40MB fixtures to one task
        biggest = max(
            os.path.getsize(os.path.join(sf_dir, f))
            for f in os.listdir(sf_dir)
            if f.endswith(".parquet")
        )
        spark.conf.set(
            "spark.sql.files.maxPartitionBytes", str(max(1 << 20, biggest // 32))
        )
        spark.conf.set("spark.sql.files.openCostInBytes", str(64 * 1024))

    names = [n for n in HEADLINE + HEADLINE2 if n in plans.QUERIES]
    # round 6: default repeats 3 → 4. The box shares CPUs with external
    # load (observed 1-min load swinging 1 → 10 with zero repo processes);
    # within-run per-query spreads of 1.21s → 0.67s make a 3-sample MIN a
    # coin flip. One extra rep costs ~20s of bench wall and materially
    # stabilizes the reported minimum.
    repeats = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "4")))
    timings: dict[str, float] = {}
    spreads: dict[str, dict[str, float]] = {}
    load_before = os.getloadavg()
    for name in names:
        # Untimed warm-up at the SAME sf_dir: compiles the exact codegen
        # classes the timed reps execute (see module docstring).
        try:
            wdf = plans.QUERIES[name].fn(spark, sf_dir)
            wdf.agg(
                F.count(F.lit(1)), F.sum(F.hash(*wdf.columns).cast("long"))
            ).collect()
        except Exception as e:  # noqa: BLE001 — warm-up must never kill the bench
            print(f"# warmup {name} failed: {e}", file=sys.stderr)
        reps, n = [], 0
        for _ in range(repeats):
            t0 = time.perf_counter()
            df = plans.QUERIES[name].fn(spark, sf_dir)
            # one tiny aggregate that touches EVERY output column — full
            # materialization without collecting the result to the driver
            row = df.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.hash(*df.columns).cast("long")).alias("h"),
            ).collect()[0]
            reps.append(time.perf_counter() - t0)
            n = row["n"]
        reps.sort()
        # median, not min (round 12): see the module docstring — the min
        # is a draw from the ±30% same-code noise band's floor
        timings[name] = round(reps[len(reps) // 2], 4)
        spreads[name] = {
            "min": round(reps[0], 4),
            "median": round(reps[len(reps) // 2], 4),
            "max": round(reps[-1], 4),
        }
        print(f"# {name}: {timings[name]:.2f}s ({n} rows)", file=sys.stderr)

    line, detail = build_outputs(
        timings, spreads, sf, repeats, load_before, os.getloadavg(),
        contended=contended, quiet_wait_s=waited, calib_s=calib,
        calib_mc_s=calib_mc, calib_nproc=ncpu,
    )
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    with open(detail_path, "w") as fh:
        json.dump(detail, fh, indent=1, sort_keys=True)
    print(f"# detail (spreads, per-query new-ops) -> {detail_path}", file=sys.stderr)
    print(line)


def build_outputs(
    timings: dict[str, float],
    spreads: dict[str, dict[str, float]],
    sf: float,
    repeats: int,
    load_before,
    load_after,
    *,
    contended: bool = False,
    quiet_wait_s: float = 0.0,
    calib_s: float = 0.0,
    calib_mc_s: float = 0.0,
    calib_nproc: int = 0,
) -> tuple[str, dict]:
    """Build (stdout JSON line, BENCH_DETAIL.json payload).

    The driver captures only the last ~2000 chars of stdout; round 7's
    line carried per-query min/median/max ``spreads`` for ~32 queries and
    grew past the capture window, so the driver recorded ``parsed: null``
    (VERDICT r7 #1). The stdout line therefore keeps ONLY the driver
    contract plus small scalar context — stable-24 ``queries``, totals,
    loadavg — and everything bulky (``spreads``, ``queries_new_ops``)
    goes to BENCH_DETAIL.json beside the round artifacts. A unit test
    pins the line length (tests/test_bench_contract.py).
    """
    stable = {n: t for n, t in timings.items() if n in HEADLINE}
    new_ops = {n: t for n, t in timings.items() if n in HEADLINE2}
    value = round(sum(stable.values()), 4)
    line = json.dumps(
        {
            "metric": "headline_queries_total_wall",
            "value": value,
            "unit": "sec",
            # round 12+: per-query numbers and `value` are MEDIANS of the
            # timed reps; rounds ≤11 recorded single-draw minimums.
            # `value_min` keeps the old statistic for series continuity,
            # `value_per_calib` is the host-speed-normalized headline.
            "stat": "median",
            "value_min": round(
                sum(spreads[n]["min"] for n in stable), 4
            ),
            "value_per_calib": round(value / calib_s, 2) if calib_s else None,
            "queries": stable,
            "sf": sf,
            "value_new_ops": round(sum(new_ops.values()), 4),
            "repeats": repeats,
            "loadavg_before": [round(x, 2) for x in load_before],
            "loadavg_after": [round(x, 2) for x in load_after],
            # self-flag for the series: true = the quiet-box wait timed
            # out and the number likely carries neighbor contention
            "contended": contended,
            "quiet_wait_s": round(quiet_wait_s, 1),
            # single-core host-speed probe (md5, no IO/JVM): cross-round
            # comparisons self-normalize on ratios of this (r9 host drift)
            "calib_s": round(calib_s, 4),
            # r14 (VERDICT r13 #2): N-way burst wall of the same work unit
            # — exposes multi-core host steal the single-core probe can't
            # see; ideal equals calib_s, eff. parallelism =
            # calib_nproc * calib_s / calib_mc_s
            "calib_mc_s": round(calib_mc_s, 4),
            "calib_nproc": calib_nproc,
        },
        separators=(",", ":"),
    )
    detail = {
        "metric": "headline_queries_detail",
        "sf": sf,
        "repeats": repeats,
        "queries_new_ops": new_ops,
        "spreads": spreads,
        "loadavg_before": [round(x, 2) for x in load_before],
        "loadavg_after": [round(x, 2) for x in load_after],
        "contended": contended,
        "quiet_wait_s": round(quiet_wait_s, 1),
        "calib_s": round(calib_s, 4),
        "calib_mc_s": round(calib_mc_s, 4),
        "calib_nproc": calib_nproc,
    }
    return line, detail


if __name__ == "__main__":
    main()
