"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line with per-query wall times.

Each query is forced to FULL materialization: the timing action aggregates a
hash over every result column, so Catalyst cannot prune final-projection
expressions the way a bare count() would (a narrow per-row transform query
timed with count() reads as nearly free — its projections never run).

Each query is timed $SPARK_GRAFT_BENCH_REPEATS times (default 2) and the
MINIMUM is reported: the steady-state number a long-lived cluster sees,
with scheduler/GC jitter — which at local fixture scale is the same order
as the queries themselves — filtered out.
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
    "s01_ann_bruteforce_topk",
    "t01_text_profile",
    "t04_doc_fingerprint",
    "t05_chunk_documents",
    "t06_contamination_check",
    # event-time windows
    "st01_tumbling_window",
    "st03_session_window",
    # feature store
    "f03_asof_spine_join",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    names = [n for n in HEADLINE if n in plans.QUERIES]
    # Warm-up: run every headline query once at the SMALLEST fixture so the
    # JVM JIT + whole-stage-codegen compilation cost (~3s for the hash-heavy
    # dedup plans) is paid before timing. The warm-up plans read a different
    # sf_dir, so no DataFrame cache can carry over into the timed runs —
    # only compiled code and parquet footer caches do, which is exactly what
    # steady-state throughput on a long-lived cluster looks like.
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir) and os.path.abspath(warm_dir) != os.path.abspath(sf_dir):
        for name in names:
            try:
                wdf = plans.QUERIES[name].fn(spark, warm_dir)
                # same action shape as the timed runs so codegen/JIT warms
                # the code that is actually measured
                wdf.agg(
                    F.count(F.lit(1)), F.sum(F.hash(*wdf.columns).cast("long"))
                ).collect()
            except Exception as e:  # noqa: BLE001 — warm-up must never kill the bench
                print(f"# warmup {name} failed: {e}", file=sys.stderr)
    else:
        plans.QUERIES[names[0]].fn(spark, sf_dir).limit(1).collect()

    repeats = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "2")))
    timings: dict[str, float] = {}
    for name in names:
        best, n = float("inf"), 0
        for _ in range(repeats):
            t0 = time.perf_counter()
            df = plans.QUERIES[name].fn(spark, sf_dir)
            # one tiny aggregate that touches EVERY output column — full
            # materialization without collecting the result to the driver
            row = df.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.hash(*df.columns).cast("long")).alias("h"),
            ).collect()[0]
            best = min(best, time.perf_counter() - t0)
            n = row["n"]
        timings[name] = round(best, 4)
        print(f"# {name}: {timings[name]:.2f}s ({n} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
