"""Skew-mitigation operators.

AQE handles skewed shuffle JOINS automatically (``spark.sql.adaptive.
skewJoin`` — on in ``session.py``), and hash aggregations partial-combine
map-side, so a hot grouping key mostly collapses before the shuffle. The
remaining hole is WINDOW functions: ``row_number().over(partitionBy(key))``
sends every row of a hot key through one task — there is no partial combine
for windows. ``salted_topk`` closes it for the top-k pattern (the dominant
window use: latest-per-entity, top-n-per-group) with the classic two-phase
trick:

  1. salt each row by a hash of the ORDER columns → ``salt`` sub-groups
     per key, each ≤ 1/salt of the hot key's rows;
  2. per-(key, salt) top-k — parallel across the hot key's sub-groups;
  3. final top-k over the ≤ k·salt survivors per key — tiny by construction.

Any row in the true global top-k is in its sub-group's top-k, so the result
is EXACTLY the unsalted answer (same tie-break ordering), at ~1/salt the
per-task skew.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def salted_topk(
    df: DataFrame,
    keys: list[str] | str,
    order: list[Column] | Column,
    *,
    k: int,
    salt: int = 16,
    rank_col: str = "rnk",
) -> DataFrame:
    """Exact top-k rows per key, skew-safe via two-phase salted windows.

    ``order`` must be a TOTAL order (include a unique tie-break column, as
    every deterministic top-k in this engine does) — otherwise the two
    phases may break ties differently. Returns the input columns plus the
    final ``rank_col``.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    order = [order] if isinstance(order, Column) else list(order)
    # Deterministic row-content salt: hot-key rows spread across sub-groups
    # no matter how the data arrives or gets repartitioned.
    salt_col = F.pmod(F.xxhash64(F.struct(*df.columns)), F.lit(salt))
    w_partial = Window.partitionBy(*keys, "__salt").orderBy(*order)
    w_final = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__salt", salt_col)
        .withColumn("__prn", F.row_number().over(w_partial))
        .where(F.col("__prn") <= k)
        .withColumn(rank_col, F.row_number().over(w_final))
        .where(F.col(rank_col) <= k)
        .drop("__salt", "__prn")
    )
