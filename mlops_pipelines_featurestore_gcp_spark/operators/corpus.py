"""End-to-end training-corpus preparation: the composition a real LLM data
pipeline runs nightly, built from the engine's own operators.

    raw documents
      → quality gate       (text_profile thresholds — row-local, codegen)
      → PII redaction      (optional: typed placeholders — map-only)
      → exact dedup        (md5 group, keep canonical doc — one shuffle)
      → near-dup removal   (MinHash+LSH pairs → connected keep-set)
      → contamination drop (optional: n-gram overlap vs a benchmark set)
      → profiled output    (per-doc token/quality stats attached)
      → chunking           (optional: overlapping token windows — map-only)

Shuffle budget at 100 TB: the quality gate is map-only; exact dedup is one
shuffle on a high-entropy fingerprint; the near-dup stage is the bucketed
MinHash plan (Σ bucket², no cartesian); the final semi-joins broadcast only
id sets. Nothing collects to the driver.

Near-dup "removal" keeps, for every near-dup pair, the LOWER doc id (the
same canonical-id convention as ``exact_dedup``): a doc is dropped iff it
appears as the *greater* side of any verified pair. This is a one-pass
approximation of connected-component dedup (a doc that only chains through
a dropped doc survives) — the standard first-pass trade; full transitive
closure needs an iterative algorithm, out of scope for a single pass.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mlops_pipelines_featurestore_gcp_spark.operators import dedup, text_analysis


@dataclass(frozen=True)
class CorpusPrepStats:
    """Row counts at each gate — the pipeline's audit trail."""

    input_docs: int
    after_quality: int
    after_exact_dedup: int
    after_near_dedup: int
    after_decontamination: int | None = None


def prepare_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    min_tokens: int = 5,
    min_quality: float = 0.3,
    near_dup_threshold: float = 0.7,
    shingle_k: int = 5,
    with_stats: bool = False,
    exact_clusters: bool = False,
    redact_pii: bool = False,
    gopher_rules: bool = False,
    benchmark: DataFrame | None = None,
    contamination_ngram: int = 5,
    chunk_tokens: int | None = None,
    chunk_overlap: int = 16,
) -> DataFrame | tuple[DataFrame, CorpusPrepStats]:
    """Quality-gate, (optionally) scrub, dedup, decontaminate, and chunk a
    document corpus.

    Returns the surviving docs with their text profile attached
    (``n_tokens``, ``quality`` etc. — the columns downstream samplers weight
    by). ``with_stats=True`` additionally returns per-stage row counts
    (forces evaluation — count jobs; leave off in production DAGs).

    ``exact_clusters=True`` replaces the one-pass drop rule with iterative
    connected components over the verified pairs
    (``operators/components.py``): exactly one survivor per duplicate
    CLUSTER, at the cost of O(cluster diameter) extra join rounds.

    ``redact_pii=True`` rewrites the text column with typed placeholders
    BEFORE dedup (so two docs differing only in redacted spans dedup
    together — the order real pipelines use). ``gopher_rules=True`` adds
    the published Gopher rule set (``operators/quality.py``) to the
    quality gate — a doc must pass BOTH the composite-score threshold and
    every Gopher rule. ``benchmark`` drops every doc
    sharing a word ``contamination_ngram``-gram with the given eval set.
    ``chunk_tokens`` reshapes the final output to chunk grain
    (one row per overlapping token window) instead of doc grain.
    """
    if redact_pii:
        docs = docs.withColumn(text_col, text_analysis.redact_pii(F.col(text_col)))
    profile = text_analysis.text_profile(docs, id_col, text_col)
    profiled = docs.join(profile, id_col)

    kept_quality = profiled.where(
        (F.col("n_tokens") >= min_tokens) & (F.col("quality") >= min_quality)
    )
    if gopher_rules:
        from mlops_pipelines_featurestore_gcp_spark.operators.quality import apply_gopher_filter

        kept_quality = apply_gopher_filter(kept_quality, id_col, text_col)

    # exact dedup: keep each group's canonical (smallest-id) doc
    canonical = dedup.exact_dedup(kept_quality, id_col, text_col).select(
        F.col("canonical_id").alias(id_col)
    )
    kept_exact = kept_quality.join(F.broadcast(canonical), id_col, "left_semi")

    # near-dup removal: drop the greater side of every verified pair, or —
    # with exact_clusters — keep exactly the per-component canonical docs
    pairs = dedup.minhash_lsh_pairs(
        kept_exact, id_col, text_col, k=shingle_k, threshold=near_dup_threshold
    )
    if exact_clusters:
        from mlops_pipelines_featurestore_gcp_spark.operators.components import dedup_keep_set

        keep_ids = dedup_keep_set(pairs, kept_exact.select(id_col), id_col)
        kept_near = kept_exact.join(keep_ids, id_col, "left_semi")
    else:
        drop_ids = pairs.select(F.col("doc_b").alias(id_col)).distinct()
        kept_near = kept_exact.join(F.broadcast(drop_ids), id_col, "left_anti")

    after_near = kept_near
    after_decontamination = None
    if benchmark is not None:
        from mlops_pipelines_featurestore_gcp_spark.operators.contamination import contamination_check

        hits = contamination_check(
            kept_near, benchmark, id_col, text_col, n=contamination_ngram
        ).where(F.col("n_hits") > 0)
        kept_near = kept_near.join(
            F.broadcast(hits.select(id_col)), id_col, "left_anti"
        )
        if with_stats:
            after_decontamination = kept_near.count()

    out = kept_near
    if chunk_tokens is not None:
        from mlops_pipelines_featurestore_gcp_spark.operators.chunking import chunk_documents

        out = chunk_documents(
            kept_near, id_col, text_col, chunk_tokens=chunk_tokens, overlap=chunk_overlap
        )

    if not with_stats:
        return out
    stats = CorpusPrepStats(
        input_docs=docs.count(),
        after_quality=kept_quality.count(),
        after_exact_dedup=kept_exact.count(),
        after_near_dedup=after_near.count(),
        after_decontamination=after_decontamination,
    )
    return out, stats


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    include_unchanged: bool = False,
) -> DataFrame:
    """Dataset-version diff: per-document status between two corpus
    snapshots — the audit step before promoting a nightly corpus build
    (every doc's fate is explainable: ``added`` / ``removed`` / ``changed``
    / ``unchanged``).

    Content identity is the md5 fingerprint of *normalized* text (same
    convention as :func:`dedup.exact_dedup`), so whitespace-only edits read
    as unchanged. Fingerprints are computed map-side; the only shuffle is
    the full-outer join on the doc id — at 100 TB both sides hash-partition
    on the same key, and a bucketed/partitioned snapshot layout
    (sources/bucketing.py) makes the join co-located. Nothing collects.

    By default unchanged docs are filtered out (a diff is usually small —
    emitting the unchanged majority would make the common case O(corpus));
    pass ``include_unchanged=True`` for the full classification.
    """
    # Presence is tracked with explicit flags, not fingerprint nullability:
    # a NULL-text doc has a NULL fp but IS present, and must not read as
    # added/removed. Fp equality uses the null-safe <=> so two NULL-text
    # versions of a doc compare as unchanged.
    o = (
        dedup.fingerprint(old, id_col, text_col)
        .withColumnRenamed("fp", "old_fp")
        .withColumn("__in_old", F.lit(True))
    )
    n = (
        dedup.fingerprint(new, id_col, text_col)
        .withColumnRenamed("fp", "new_fp")
        .withColumn("__in_new", F.lit(True))
    )
    status = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(~F.col("old_fp").eqNullSafe(F.col("new_fp")), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = o.join(n, on=id_col, how="full_outer").select(id_col, status.alias("status"))
    if not include_unchanged:
        out = out.where(F.col("status") != "unchanged")
    return out
