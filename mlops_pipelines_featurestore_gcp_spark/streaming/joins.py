"""Stream-stream joins: the remaining Structured Streaming join family.

The log loop's enrichment is a stream-STATIC broadcast join
(``log_loop.enrich_with_reward``); this module adds the stream-STREAM
interval join — e.g. matching a prediction stream against a delayed
ground-truth/feedback stream within a bounded time window, the lambda-free
way to build labeled training rows online.

Both sides carry watermarks and the join condition bounds event-time
distance, so Spark can expire buffered state: rows older than
(watermark + interval) are dropped from the join buffers — bounded memory
at any throughput, the non-negotiable property at 100 TB/day.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str,
    left_time: str,
    right_time: str,
    watermark: str = "10 minutes",
    lower: str = "0 seconds",
    upper: str = "5 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join two event streams on ``key`` where the right event lands within
    ``[left_time + lower, left_time + upper]``.

    Works identically on batch DataFrames (watermarks are no-ops there) —
    the batch-parity test runs the same function both ways. Outer variants
    emit unmatched rows only once the watermark closes their interval.

    Output carries the key column once; all non-key right columns are
    attached as-is (callers alias beforehand on name collisions). For
    right/full outer joins the surviving key is COALESCE(left, right) so
    unmatched right rows keep their join key instead of surfacing NULL.
    """
    l_wm = left.withWatermark(left_time, watermark)
    r_wm = right.withWatermark(right_time, watermark)
    cond = (
        (l_wm[key] == r_wm[key])
        & (r_wm[right_time] >= l_wm[left_time] + F.expr(f"INTERVAL {lower}"))
        & (r_wm[right_time] <= l_wm[left_time] + F.expr(f"INTERVAL {upper}"))
    )
    joined = l_wm.join(r_wm, cond, how)
    if how in {"right", "rightouter", "right_outer", "full", "fullouter", "full_outer", "outer"}:
        # the left key is NULL on right-unmatched rows — keep whichever side
        # matched, in the left key's original column position
        sel = [
            F.coalesce(l_wm[key], r_wm[key]).alias(key) if c == key else l_wm[c]
            for c in left.columns
        ] + [r_wm[c] for c in right.columns if c != key]
        return joined.select(*sel)
    return joined.drop(r_wm[key])
