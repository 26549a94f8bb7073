"""Windowed funnel analysis over event streams (ClickHouse ``windowFunnel``
semantics, re-expressed as one Spark shuffle).

For each entity, the funnel level is the deepest prefix of ``steps`` whose
events occur in order, all inside ``span`` of the FIRST step's event, under
greedy first-occurrence matching: step 1 anchors at the entity's earliest
step-1 event, and each later step takes its earliest event strictly after
the previous step (and within the anchor's window). Greedy matching is
deterministic and replayable in plain SQL (sequential min-aggregates), at
the cost of missing funnels a later anchor would complete — the standard,
documented trade of the greedy variant.

Plan shape: filter to step events (pushed to the scan) → ONE groupBy on the
entity collecting (time, step-index) pairs → row-local array evaluation of
the greedy chain. No joins, no per-step passes: at 100 TB the only shuffle
carries (entity, time, step_idx) rows for matching events, and the
higher-order-function chain evaluation runs on |entities| aggregated rows —
off the hot path by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def window_funnel(
    events: DataFrame,
    *,
    entity_col: str,
    time_col: str,
    type_col: str,
    steps: list[str],
    span: int,
) -> DataFrame:
    """Per-entity funnel level and step times.

    ``time_col`` must be numeric (convert timestamps with ``unix_micros``
    first — exact int64); ``span`` is in the same unit. Returns one row per
    entity having at least one step-1 event: (entity, funnel_level,
    t_step1, t_complete, time_to_complete) — the last two NULL unless every
    step matched.
    """
    if len(steps) < 2:
        raise ValueError("a funnel needs at least 2 steps")
    step_idx = F.array(*[F.lit(s) for s in steps])
    ev = (
        events.where(F.col(type_col).isin(steps))
        .select(
            F.col(entity_col),
            F.struct(
                F.col(time_col).cast("long").alias("t"),
                (F.array_position(step_idx, F.col(type_col)) - 1).cast("int").alias("s"),
            ).alias("e"),
        )
        .groupBy(entity_col)
        .agg(F.collect_list("e").alias("evs"))
    )
    # Greedy chain: stage each step's matched time as a real column so the
    # next step's HOF lambda can reference it (and each min is computed
    # once, not re-inlined per downstream use).
    out = ev
    prev = None
    for k in range(len(steps)):
        times = F.transform(
            F.filter(
                F.col("evs"),
                (lambda kk, pv: (lambda e: (e["s"] == kk) if pv is None else (
                    (e["s"] == kk) & (e["t"] > pv) & (e["t"] <= F.col("__t0") + F.lit(span))
                )))(k, prev),
            ),
            lambda e: e["t"],
        )
        col_name = "__t0" if k == 0 else f"__t{k}"
        out = out.withColumn(col_name, F.array_min(times))
        prev = F.col(col_name)
    level = F.lit(0)
    for k in range(len(steps)):
        level = F.when(F.col(f"__t{k}").isNotNull(), F.lit(k + 1)).otherwise(level)
    # levels must be prefix-consistent: __t{k} is NULL whenever __t{k-1} is
    # (the lambda window references it), so the cascade above is safe.
    last = F.col(f"__t{len(steps) - 1}")
    return (
        out.where(F.col("__t0").isNotNull())
        .select(
            F.col(entity_col),
            level.cast("int").alias("funnel_level"),
            F.col("__t0").alias("t_step1"),
            last.alias("t_complete"),
            (last - F.col("__t0")).alias("time_to_complete"),
        )
    )
