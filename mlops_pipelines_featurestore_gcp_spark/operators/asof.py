"""As-of (point-in-time) join — the defining feature-store query shape.

The reference delegates this to Vertex AI Feature Store (point-in-time
retrieval keyed by ``entity_id_field`` + ``feature_time``,
``bigquery_to_featurestore.py:21-23,44``; online read imports at
``notebook.ipynb`` cell 7). Spark has no native ASOF join (SURVEY.md §4.3),
so the engine provides one as a library operator.

Implementation: the *union-merge* pattern, not a range join —
  1. tag left rows (marker 1) and right rows (marker 0),
  2. union and sort within each key by (time, marker, tie),
  3. running ``last(payload, ignorenulls=True)`` carries the most recent
     right row forward onto each left row.

Cost: ONE shuffle + sort on the join key, O((|L|+|R|) log) per partition —
versus the O(|L|·|R|) worst case of the naive ``t_r <= t_l`` range join.
This is the plan shape that survives 100 TB; skewed keys are handled by AQE.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_MARK = "__asof_marker"
_TIME = "__asof_time"
_PAYLOAD = "__asof_payload"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    *,
    left_time: str,
    right_time: str,
    tie_break: str | None = None,
    prefix: str = "",
    direction: str = "backward",
    tolerance: Column | None = None,
) -> DataFrame:
    """Left as-of join: for each left row, the single right row with equal
    keys that is nearest in time on the chosen side (inclusive).

    ``direction="backward"`` (the feature-store default) attaches the
    LATEST right row with ``right_time <= left_time``; ``"forward"`` the
    EARLIEST with ``right_time >= left_time`` — same union-merge plan with
    the within-key sort reversed, still one shuffle. (A "nearest" read is
    the composition of both over a keyed spine; backward is what
    point-in-time correctness uses, so it stays the default.)

    ``tolerance`` (an interval/duration Column, e.g. ``F.expr("INTERVAL 7
    DAYS")`` for timestamps or a plain literal for numeric times) bounds
    the match distance: a matched right row further than ``tolerance``
    from the left time is dropped, leaving NULL feature columns — the
    guard against serving a years-stale feature value as "latest".

    ``tie_break``: right-side column ordering simultaneous right rows (the
    largest wins) — required for deterministic results when right times
    can collide. ``prefix`` renames the attached right columns.

    Left rows with no (in-tolerance) right row keep NULL feature columns
    (left join semantics).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    rcols = [c for c in right.columns if c not in keys]

    l_tagged = left.withColumn(_TIME, F.col(left_time)).withColumn(_MARK, F.lit(1))
    r_tagged = right.select(
        *keys,
        F.col(right_time).alias(_TIME),
        F.lit(0).alias(_MARK),
        F.struct(*rcols).alias(_PAYLOAD),
    )
    u = l_tagged.unionByName(r_tagged, allowMissingColumns=True)

    backward = direction == "backward"
    # Iteration order must present every eligible right row BEFORE the left
    # rows it can match: time asc for backward (past → present), time desc
    # for forward (future → present). Markers order right (0) before left
    # (1) at equal times either way, making the bound inclusive.
    order = [F.col(_TIME).asc() if backward else F.col(_TIME).desc(), F.col(_MARK)]
    if tie_break is not None:
        # Left rows carry NULL payload; nulls-first puts them before the
        # right rows of the same (time, marker) — irrelevant since markers
        # already separate them, but the right-side ties become total.
        # last-wins ⇒ the LARGEST tie_break value wins in both directions.
        order.append(F.col(_PAYLOAD).getField(tie_break).asc_nulls_first())
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        u.withColumn(_PAYLOAD, F.last(_PAYLOAD, ignorenulls=True).over(w))
        .withColumn("__asof_mtime", F.last(F.when(F.col(_MARK) == 0, F.col(_TIME)), ignorenulls=True).over(w))
        .where(F.col(_MARK) == 1)
    )
    if tolerance is not None:
        dist = (
            F.col(_TIME) - F.col("__asof_mtime")
            if backward
            else F.col("__asof_mtime") - F.col(_TIME)
        )
        matched = matched.withColumn(
            _PAYLOAD, F.when(dist <= tolerance, F.col(_PAYLOAD))
        )

    out = matched.select(
        *[c for c in left.columns],
        *[F.col(_PAYLOAD).getField(c).alias(f"{prefix}{c}") for c in rcols],
    )
    return out
