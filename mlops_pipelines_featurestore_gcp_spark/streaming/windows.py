"""Event-time window aggregations over the ``events`` stream table.

The reference has no event-time logic at all (``feature_time`` is wall-clock
"now" — ``bigquery_to_featurestore.py:21-23``; SURVEY.md §2.7 last row), but
a complete engine needs watermarked tumbling / sliding / session windows —
the driver's data model includes the ``events`` fixture as a stream table.

All three helpers work identically on batch and streaming DataFrames
(``F.window`` / ``F.session_window`` are mode-agnostic); streaming callers
add ``withWatermark`` first. Aggregations are partial-aggregated map-side by
Catalyst (hash agg), and the shuffle key is (window, group cols) — at 100 TB
the cardinality is bounded by windows × groups, not rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tumbling_window_agg(
    events: DataFrame,
    duration: str,
    *aggs: Column,
    time_col: str = "ts",
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Non-overlapping fixed windows: ``F.window(ts, duration)``."""
    w = F.window(time_col, duration).alias("w")
    out = events.groupBy(w, *group_cols).agg(*aggs)
    return out.select(
        F.col("w.start").alias("w_start"),
        F.col("w.end").alias("w_end"),
        *[c for c in out.columns if c != "w"],
    )


def sliding_window_agg(
    events: DataFrame,
    duration: str,
    slide: str,
    *aggs: Column,
    time_col: str = "ts",
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Overlapping windows: each event lands in duration/slide windows."""
    w = F.window(time_col, duration, slide).alias("w")
    out = events.groupBy(w, *group_cols).agg(*aggs)
    return out.select(
        F.col("w.start").alias("w_start"),
        F.col("w.end").alias("w_end"),
        *[c for c in out.columns if c != "w"],
    )


def session_window_agg(
    events: DataFrame,
    gap: str,
    *aggs: Column,
    time_col: str = "ts",
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Dynamic-size sessions: a session closes after ``gap`` of inactivity;
    ``w_end`` is last-event-time + gap (Spark ``session_window`` semantics)."""
    w = F.session_window(time_col, gap).alias("w")
    out = events.groupBy(w, *group_cols).agg(*aggs)
    return out.select(
        F.col("w.start").alias("w_start"),
        F.col("w.end").alias("w_end"),
        *[c for c in out.columns if c != "w"],
    )
