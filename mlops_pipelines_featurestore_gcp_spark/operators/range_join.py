"""Binned range join: point-in-interval joins WITHOUT an equi key.

Spark plans a pure range predicate (no equality conjunct) as
BroadcastNestedLoopJoin — O(|points| · |intervals|) comparisons, the same
cartesian cliff the VERDICT flagged for d05's first cut. When the equi key
exists (q20, the as-of family) the shuffle carries it and the range
predicate rides along for free; this module covers the remaining case —
events against ad-hoc time windows, IPs against CIDR-style numeric ranges,
positions against genomic intervals — with the classic bin trick
(the published range-join optimization in Databricks Runtime / Flink
interval joins, re-expressed on open Spark):

1. every point hashes to exactly ONE ``floor(p / bin_width)`` bin;
2. every interval explodes to the bins it overlaps
   (``sequence(floor(s/w), floor(e/w))`` — ceil((e−s)/w)+1 rows);
3. an ordinary equi shuffle join on the bin id meets each point with every
   interval overlapping its bin — a superset of true matches bounded by
   bin locality, not table sizes;
4. the exact containment predicate filters inside the join.

Because a point owns exactly one bin, a (point, interval) pair meets at
most once — no post-join dedup shuffle. Cost scales with
|points| + |intervals| · span/width + matches; picking ``bin_width`` near
the median interval span keeps the explode factor ~2 and the bins
selective. Correctness is bin-width-independent (asserted in tests), so
the knob is purely physical — the property that lets an optimizer choose
it from stats.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def binned_range_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_col: str,
    start_col: str,
    end_col: str,
    bin_width: int,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    ``start_col <= point_col <= end_col`` (inclusive both ends).

    All three bound columns must be numeric (cast timestamps to epoch
    seconds first — a timestamp cast is exact and order-preserving).
    ``how`` supports 'inner' and 'left' (points with no containing interval
    survive once with NULL interval columns). Both shapes keep the bin id
    as the equi conjunct — the shuffle key — with the exact containment
    predicate evaluated inside the join, so neither ever degenerates to a
    nested-loop plan (plan-asserted in tests).
    """
    if bin_width <= 0:
        raise ValueError(f"bin_width must be positive, got {bin_width}")
    if how not in {"inner", "left"}:
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    p = points.withColumn("__bin", F.floor(F.col(point_col) / F.lit(bin_width)))
    lo = F.floor(F.col(start_col) / F.lit(bin_width))
    hi = F.floor(F.col(end_col) / F.lit(bin_width))
    i = (
        intervals.withColumn(
            "__bins",
            F.when(F.col(end_col) >= F.col(start_col), F.sequence(lo, hi)).otherwise(
                F.array().cast("array<bigint>")
            ),
        )
        .withColumn("__bin", F.explode("__bins"))
        .drop("__bins")
    )
    if how == "inner":
        return (
            p.join(i, "__bin")
            .where((F.col(point_col) >= F.col(start_col)) & (F.col(point_col) <= F.col(end_col)))
            .drop("__bin")
        )
    # left outer: containment lives in the ON clause (a WHERE would turn
    # the outer join back into an inner one); the equi bin conjunct still
    # carries the shuffle. A point meets a containing interval in exactly
    # one bin, so no dedup is needed; bin-matched-but-not-contained rows
    # are outer-join misses like any other.
    pa, ia = p.alias("__p"), i.alias("__i")
    cond = (
        (F.col("__p.__bin") == F.col("__i.__bin"))
        & (F.col(f"__p.{point_col}") >= F.col(f"__i.{start_col}"))
        & (F.col(f"__p.{point_col}") <= F.col(f"__i.{end_col}"))
    )
    return pa.join(ia, cond, "left").select(
        *[F.col(f"__p.{c}") for c in points.columns],
        *[F.col(f"__i.{c}") for c in intervals.columns],
    )
