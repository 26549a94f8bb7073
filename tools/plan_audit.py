"""Physical-plan audit: one row per headline query summarizing the plan
properties that matter at 100 TB, plus the full formatted plans.

Usage: python tools/plan_audit.py [sf_dir] > PLANS.md

Checks per query:
- **exchanges** — shuffle count (lower is better; compare against the
  operator's documented shuffle budget)
- **bhj / smj / cartesian** — join strategies chosen (broadcast-hash vs
  sort-merge vs cartesian; a cartesian on a data path is a scale bug)
- **pushed** — whether the parquet scan carries PushedFilters (predicate
  pushdown reached the source)
- **codegen_ids** — distinct WholeStageCodegen spans (wide spans = the
  expression work runs compiled, not interpreted)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mlops_pipelines_featurestore_gcp_spark import get_spark, plans  # noqa: E402
from bench import HEADLINE  # noqa: E402  (audit the same set the bench times)

# Deferred/new queries worth auditing beyond the bench set — same table,
# separate section so the bench headline set stays stable.
EXTRA = [
    "d08_keep_best_exact",
    "t17_soft_dedup_weights",
    "t18_heavy_hitters_cms",
    "s07_per_source_cap",
    "s02_ann_lsh_topk",
    "s03_ann_ivf_topk",
    "s08_ann_pq_topk",
    "s09_ann_ivfpq_topk",
    "mm06_video_neardup",
    "c03_semantic_search",
    "t10_gopher_quality",
    "t11_unigram_lm_score",
    "s06_leakage_safe_split",
    "q33_binned_range_join",
    "q34_window_funnel",
    "q35_sessionize_stats",
    "q36_retention_cohorts",
    "f06_feature_drift",
    "d07_semantic_dedup",
    "ml05_linucb_suffstats",
    "t13_bm25_relevance",
    "t14_tf_idf",
    "t15_importance_resample",
    "t16_bloom_contamination",
    "st07_distinct_rollup",
    "c01_prepare_corpus",
]


def audit(df) -> dict[str, object]:
    # Execute THIS dataframe first (not a count() wrapper, which runs its
    # own plan): with AQE on, the pre-execution plan is a provisional
    # AdaptiveSparkPlan without codegen markers or runtime join choices —
    # the FINAL plan is the honest one. Exchange counts include re-printed
    # reused stages, so read them as an upper bound.
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {
        "exchanges": len(re.findall(r"Exchange (?:hashpartitioning|rangepartitioning|RoundRobinPartitioning|SinglePartition)", plan)),
        "bhj": plan.count("BroadcastHashJoin"),
        "smj": plan.count("SortMergeJoin"),
        "cartesian": plan.count("CartesianProduct") + plan.count("BroadcastNestedLoopJoin"),
        "pushed": "PushedFilters: [" in plan and not re.search(r"PushedFilters: \[\]", plan),
        # executedPlan.toString marks codegen stages with the *(n) prefix
        "codegen_ids": len(set(re.findall(r"\*\((\d+)\)", plan))),
    }


def _operator_only_frames(spark, sf_dir):
    """ANN operator-only plans (VERDICT r5 #5): the registered s02/s03
    queries carry the 32-query recall verifier and the contract flag
    machinery, so their audited rows reflect VERIFIER cost, not the
    operator a user calls. These rows audit the bare operator."""
    from mlops_pipelines_featurestore_gcp_spark.plans import llm_data

    return {
        "s02_ann_lsh_topk (operator only)": lambda: llm_data.s02_operator_parts(spark, sf_dir)[2],
        "s03_ann_ivf_topk (operator only)": lambda: llm_data.s03_operator_parts(spark, sf_dir)[2],
        "s08_ann_pq_topk (operator only)": lambda: llm_data.s08_operator_parts(spark, sf_dir)[2],
        "s09_ann_ivfpq_topk (operator only)": lambda: llm_data.s09_operator_parts(spark, sf_dir)[2],
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")

    print(f"# Physical-plan audit @ {sf_dir}\n")
    print("| query | exchanges | broadcast joins | sort-merge joins | cartesian | filters pushed | codegen spans |")
    print("|---|---|---|---|---|---|---|")
    details: list[tuple[str, str]] = []
    operator_only = _operator_only_frames(spark, sf_dir)
    for name in HEADLINE + EXTRA + list(operator_only):
        if name in operator_only:
            df = operator_only[name]()
        else:
            spec = plans.QUERIES.get(name)
            if spec is None:
                continue
            df = spec.fn(spark, sf_dir)
        a = audit(df)
        # s01's BroadcastNestedLoopJoin is the operator's DESIGN: the tiny
        # query set is broadcast against the corpus for exact scoring (the
        # approximate s02/s03 paths exist precisely to avoid it at scale)
        # s01's is the design (broadcast exact-scoring baseline); f06's and
        # t11's are broadcast singleton/centroid/stat tables joined with
        # crossJoin — size-1-side broadcasts, not data-path cartesians.
        # d07 was REMOVED from this list in round 5: its verifier now
        # rescores emitted pairs via keyed joins, so any cartesian in its
        # plan is a real regression. s02/s03 joined in round 5: their
        # recall verifier brute-forces an ABSOLUTE 32-query sample
        # (broadcast query set, O(32N)) plus a size-1 flag crossJoin.
        # s08's registered form carries the same 32-query recall verifier
        # (broadcast-query brute force) — by design, like s02/s03. c03's
        # search stage IS s01's broadcast exact-scoring baseline.
        expected_cartesian = name.startswith(("s01", "s02", "s03", "s08", "s09", "c03", "f06", "t11"))
        flag = " (by design: broadcast query set)" if a["cartesian"] and expected_cartesian else (" ⚠" if a["cartesian"] else "")
        print(
            f"| {name} | {a['exchanges']} | {a['bhj']} | {a['smj']} | {a['cartesian']}{flag} "
            f"| {'yes' if a['pushed'] else '—'} | {a['codegen_ids']} |"
        )
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        details.append((name, buf.getvalue().strip()))

    print("\n---\n")
    for name, txt in details:
        print(f"## {name}\n\n```\n{txt}\n```\n")


if __name__ == "__main__":
    main()
