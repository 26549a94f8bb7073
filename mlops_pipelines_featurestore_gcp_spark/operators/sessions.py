"""Batch sessionization and cohort retention over event tables.

The batch counterparts of the streaming session window (st03): assign every
event a session id by inactivity gap, and fold entity activity into the
cohort-retention matrix — the two table-stakes event-analytics operators.

Both are single-window-shuffle / single-groupBy plans partitioned by the
entity (or cohort) key: no joins against self, no collect, and the window
partitions are per-entity event sequences — bounded by entity activity, not
corpus size, so the shape holds at 100 TB with AQE handling hot entities.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    *,
    entity_col: str,
    time_col: str,
    gap: int,
) -> DataFrame:
    """Assign an inactivity-gap session to every event.

    A new session starts when the gap since the entity's previous event
    EXCEEDS ``gap`` (same unit as the numeric ``time_col``; boundary events
    exactly ``gap`` apart share a session, matching Spark's
    ``session_window`` close-at-strictly-greater semantics). Output adds
    ``session_seq`` (1-based per entity) — one window shuffle on the
    entity, nothing else.
    """
    w = Window.partitionBy(entity_col).orderBy(time_col)
    prev = F.lag(F.col(time_col)).over(w)
    new_session = F.when(
        prev.isNull() | (F.col(time_col) - prev > F.lit(gap)), F.lit(1)
    ).otherwise(F.lit(0))
    return events.withColumn(
        "session_seq",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).cast("long"),
    )


def session_stats(
    events: DataFrame,
    *,
    entity_col: str,
    time_col: str,
    gap: int,
) -> DataFrame:
    """Per-session rollup: (entity, session_seq, n_events, t_start, t_end,
    duration). The groupBy rides the sessionize window's partitioning —
    same key, so AQE reuses the exchange."""
    s = sessionize(events, entity_col=entity_col, time_col=time_col, gap=gap)
    return s.groupBy(entity_col, "session_seq").agg(
        F.count("*").alias("n_events"),
        F.min(time_col).alias("t_start"),
        F.max(time_col).alias("t_end"),
        (F.max(time_col) - F.min(time_col)).alias("duration"),
    )


def retention_cohorts(
    events: DataFrame,
    *,
    entity_col: str,
    time_col: str,
    period: int,
) -> DataFrame:
    """Cohort-retention matrix: entities bucketed by their FIRST-activity
    period, counted per subsequent activity period.

    ``period`` is the bucket width in ``time_col`` units (e.g. 7 days of
    epoch-seconds for weekly cohorts). Returns (cohort_period,
    period_offset, n_active) — the classic retention triangle. Two
    aggregates on the entity key (first activity, then distinct activity
    periods); the final matrix is tiny by construction.
    """
    pe = events.select(
        F.col(entity_col).alias("e"),
        F.floor(F.col(time_col) / F.lit(period)).alias("p"),
    ).distinct()
    first = pe.groupBy("e").agg(F.min("p").alias("cohort_period"))
    return (
        pe.join(first, "e")
        .groupBy("cohort_period", (F.col("p") - F.col("cohort_period")).alias("period_offset"))
        .agg(F.count_distinct("e").alias("n_active"))
    )
