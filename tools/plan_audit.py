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
from bench import HEADLINE, HEADLINE2  # noqa: E402  (audit the same set the bench times)

# Rows where a CartesianProduct/BroadcastNestedLoopJoin in the audited plan
# is the documented design (broadcast query set / size-1 stat table), keyed
# by the EXACT row name printed in the table — per-query, never a prefix
# (ADVICE r6). Any cartesian on a row not listed here renders the ⚠ flag.
EXPECTED_CARTESIAN = {
    "s01_ann_bruteforce_topk",           # broadcast exact-scoring baseline
    "s03_ann_ivf_topk",                  # contract form (x2 tiers: ivf+lsh, r7 merge) + probed-cell broadcast
    "s08_ann_pq_topk",                   # contract form: 32-query recall verifier
    "s09_ann_ivfpq_topk",                # contract form: 32-query recall verifier
    "s03_ann_ivf_topk (operator only)",  # query set broadcast into probed cells
    "c03_semantic_search",               # search stage IS s01's baseline
    "f06_feature_drift",                 # size-1 stat-table crossJoin
    "t10_gopher_quality",                # size-1 vocab-stat crossJoin (t11 LM columns, r7 merge)
    "st02_sliding_window",               # size-1 broadcast of the global max ts (r7 merge)
    "s10_ann_ivfpq_persisted",           # contract form: 32-query recall verifier (s09 twin)
    # s11_embedding_whitening dropped (ADVICE r13): its audited plan has no
    # cartesian since the r13 Arrow flag pass — keeping the entry would
    # mask a future accidental cartesian as "by design". (The fit's pairs
    # crossJoin runs in an eager job outside the audited plan.)
}

# Deferred/new queries worth auditing beyond the bench set — same table,
# separate section so the bench headline set stays stable. HEADLINE2 is
# imported directly (r9), so entries here that also appear there are
# redundant-but-harmless (the audit loop dedups); only NON-bench queries
# (bench-excluded or deferred) need a row here.
EXTRA = [
    "d11_url_host_dedup",
    "d08_keep_best_exact",
    "t17_soft_dedup_weights",
    "t18_heavy_hitters_cms",
    "s07_per_source_cap",
    "s03_ann_ivf_topk",
    "s08_ann_pq_topk",
    "s09_ann_ivfpq_topk",
    "mm06_video_neardup",
    "mm07_media_keep_best",
    "mm08_video_keep_best",
    "s10_ann_ivfpq_persisted",
    "c03_semantic_search",
    "t10_gopher_quality",
    "s06_leakage_safe_split",
    "q33_binned_range_join",
    "q34_window_funnel",
    "q35_sessionize_stats",
    "q36_retention_cohorts",
    "f06_feature_drift",
    "d07_semantic_dedup",
    "ml05_linucb_suffstats",
    "t13_bm25_relevance",
    "t15_importance_resample",
    "t16_bloom_contamination",
    "st07_distinct_rollup",
    "c01_prepare_corpus",
    # round 7 additions
    "q37_skew_salted_topk",
    "st08_interval_join",
    "st09_quantile_rollup",
    # round 8 additions
    "d10_semantic_keep_star",
    # round 9: audited since the map-side rank/coverage rewrite
    "t09_token_vocab",
    # round 9 additions
    "s11_embedding_whitening",
    "ml07_quality_classifier",
    "q38_data_expectations",
    "ml06_ranking_metrics",
    "d09_incremental_dedup",
    "q39_tfrecord_roundtrip",
    "q40_clustered_layout",
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
        # single-task stages (r9): every `Exchange SinglePartition` moves
        # its input through ONE task. Contract-flag scalar aggregates and
        # config-bounded offset frames are fine; a count that JUMPS on a
        # data-path query is the save_zordered/token_vocab failure class —
        # this column makes the posture reviewable without plan greps.
        "single_part": len(re.findall(r"Exchange SinglePartition", plan)),
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
    print(
        "**1-task exch** counts `Exchange SinglePartition` nodes. Non-zero is\n"
        "EXPECTED on contract-flag scalar aggregates, report-sized stat frames\n"
        "(f06's drift scalars, t10's vocab stats, the ANN recall verifiers) and\n"
        "config-bounded offset frames (t09's per-range-partition prefix sums);\n"
        "the failure class this column exists to catch is a count that JUMPS on\n"
        "a DATA-path query — whole-table sorts/windows through one task (the\n"
        "r7 save_zordered / r8 token_vocab bugs).\n"
    )
    print("| query | exchanges | broadcast joins | sort-merge joins | cartesian | filters pushed | codegen spans | 1-task exch |")
    print("|---|---|---|---|---|---|---|---|")
    details: list[tuple[str, str]] = []
    operator_only = _operator_only_frames(spark, sf_dir)
    # Audit set = EVERYTHING the bench times (HEADLINE + HEADLINE2 —
    # imported, not hand-mirrored: st06/mm05 escaped the audit for two
    # rounds because EXTRA duplicated HEADLINE2 by hand; review r9) plus
    # the non-bench EXTRA list, deduped order-preserving.
    audit_names = list(dict.fromkeys(HEADLINE + HEADLINE2 + EXTRA))
    for name in audit_names + list(operator_only):
        if name in operator_only:
            df = operator_only[name]()
        else:
            spec = plans.QUERIES.get(name)
            if spec is None:
                continue
            df = spec.fn(spark, sf_dir)
        a = audit(df)
        # By-design cartesians live in EXPECTED_CARTESIAN (exact row names;
        # rationale per entry). History: d07 was REMOVED in round 5 — its
        # verifier rescores emitted pairs via keyed joins, so any cartesian
        # in its plan is a real regression.
        expected_cartesian = name in EXPECTED_CARTESIAN
        flag = " (by design: broadcast query set)" if a["cartesian"] and expected_cartesian else (" ⚠" if a["cartesian"] else "")
        print(
            f"| {name} | {a['exchanges']} | {a['bhj']} | {a['smj']} | {a['cartesian']}{flag} "
            f"| {'yes' if a['pushed'] else '—'} | {a['codegen_ids']} | {a['single_part']} |"
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
