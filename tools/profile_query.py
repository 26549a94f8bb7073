"""Per-query job-level profiler for the optimization rounds (guide §1).

Runs each named query exactly like bench.py (untimed warm-up, then timed
reps with the full-materialization hash aggregate), but with the Spark UI
enabled so the REST API can attribute wall time to individual JOBS — the
eager fit/probe/store jobs a query runs during plan construction show up
separately from the final materialization, which is the first question
every optimization asks (guide §1.1: where is the time actually going).

Usage: python tools/profile_query.py [sf_dir] query [query ...]

Output (stderr): per query, the construction time (eager jobs), the timed
action, and the per-job table (description, duration, stages) for the
LAST timed rep.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mlops_pipelines_featurestore_gcp_spark import get_spark, plans  # noqa: E402


def _api(port: int, path: str):
    with urllib.request.urlopen(f"http://localhost:{port}/api/v1/{path}") as r:
        return json.loads(r.read())


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.1"
    names = [a for a in args if not os.path.isdir(a)]
    spark = get_spark(
        "profile", **{"spark.ui.enabled": "true", "spark.ui.port": "4055"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    port = int(spark.sparkContext.uiWebUrl.rsplit(":", 1)[-1])
    app_id = spark.sparkContext.applicationId

    # mirror bench.py's input layout so the numbers are comparable
    if os.environ.get("SPARK_GRAFT_BENCH_MIRROR", "1") != "0":
        from bench import _mirror_multi_rowgroup

        sf_dir = _mirror_multi_rowgroup(sf_dir)
        biggest = max(
            os.path.getsize(os.path.join(sf_dir, f))
            for f in os.listdir(sf_dir)
            if f.endswith(".parquet")
        )
        spark.conf.set(
            "spark.sql.files.maxPartitionBytes", str(max(1 << 20, biggest // 32))
        )
        spark.conf.set("spark.sql.files.openCostInBytes", str(64 * 1024))

    for name in names:
        fn = plans.QUERIES[name].fn
        # warm-up (untimed, same protocol as bench.py)
        try:
            wdf = fn(spark, sf_dir)
            wdf.agg(F.count(F.lit(1)), F.sum(F.hash(*wdf.columns).cast("long"))).collect()
        except Exception as e:  # noqa: BLE001
            print(f"# warmup {name} failed: {e}", file=sys.stderr)
        jobs_before = {j["jobId"] for j in _api(port, f"applications/{app_id}/jobs")}
        t0 = time.perf_counter()
        spark.sparkContext.setJobDescription(f"{name}: construct")
        df = fn(spark, sf_dir)
        t1 = time.perf_counter()
        spark.sparkContext.setJobDescription(f"{name}: materialize")
        row = df.agg(
            F.count(F.lit(1)).alias("n"), F.sum(F.hash(*df.columns).cast("long")).alias("h")
        ).collect()[0]
        t2 = time.perf_counter()
        spark.sparkContext.setJobDescription(None)
        print(
            f"\n## {name}: total {t2 - t0:.3f}s = construct {t1 - t0:.3f}s "
            f"+ materialize {t2 - t1:.3f}s ({row['n']} rows)",
            file=sys.stderr,
        )
        jobs = [
            j
            for j in _api(port, f"applications/{app_id}/jobs")
            if j["jobId"] not in jobs_before
        ]
        jobs.sort(key=lambda j: j["jobId"])
        gap_total = 0.0
        prev_end = None
        for j in jobs:
            sub = j["submissionTime"]
            comp = j.get("completionTime", "?")
            desc = (j.get("description") or j["name"])[:90]
            # ISO strings "2026-08-17T21:30:00.123GMT"
            def _ts(s):
                import datetime

                return datetime.datetime.strptime(
                    s.replace("GMT", "+0000"), "%Y-%m-%dT%H:%M:%S.%f%z"
                ).timestamp()

            dur = _ts(comp) - _ts(sub) if comp != "?" else -1
            if prev_end is not None:
                gap_total += max(0.0, _ts(sub) - prev_end)
            prev_end = _ts(comp) if comp != "?" else prev_end
            print(
                f"  job {j['jobId']:4d} {dur:7.3f}s tasks={j['numTasks']:5d} {desc}",
                file=sys.stderr,
            )
        print(
            f"  ({len(jobs)} jobs; inter-job driver gap total {gap_total:.3f}s)",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
