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

from pyspark.sql import DataFrame, Window
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
) -> DataFrame:
    """Left as-of join: for each left row, the latest right row with
    ``right_time <= left_time`` and equal keys (backward, inclusive).

    ``tie_break``: right-side column ordering simultaneous right rows (the
    largest wins) — required for deterministic results when right times can
    collide. ``prefix`` renames the attached right columns.

    Left rows with no prior right row keep NULL feature columns (left join
    semantics).
    """
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

    order = [F.col(_TIME), F.col(_MARK)]
    if tie_break is not None:
        # Left rows carry NULL payload; asc-nulls-first puts them after the
        # right rows of the same (time, marker) — irrelevant since markers
        # already separate them, but the right-side ties become total.
        order.append(F.col(_PAYLOAD).getField(tie_break).asc_nulls_first())
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn(_PAYLOAD, F.last(_PAYLOAD, ignorenulls=True).over(w)).where(F.col(_MARK) == 1)

    out = matched.select(
        *[c for c in left.columns],
        *[F.col(_PAYLOAD).getField(c).alias(f"{prefix}{c}") for c in rcols],
    )
    return out
