"""Model-evaluation metrics as DataFrame aggregations.

The reference trains (rank-k factorization, LinUCB) but never measures —
evaluation happens offline in notebooks. An engine that trains should also
score: these are the standard recommender/regression metrics expressed as
single-pass aggregations and one-window rankers, usable at full-corpus
scale (nothing collects; everything partial-combines).

- ``rmse``/``mae`` — one aggregate over (prediction, label) pairs.
- ``precision_at_k`` — per-user window top-k on predicted score against a
  relevance threshold on the label.
- ``ndcg_at_k`` — rank-discounted gain over the same per-user window,
  normalized by the ideal ordering (label-sorted) — both orderings come
  from the SAME window shuffle key, so the plan is two windows over one
  exchange.

Ties break on item id everywhere, so rankings are deterministic across
runs and partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rmse(scored: DataFrame, *, label_col: str, pred_col: str) -> float:
    """Root-mean-squared error over all scored pairs."""
    row = scored.agg(
        F.sqrt(F.avg(F.pow(F.col(pred_col) - F.col(label_col), 2))).alias("v")
    ).collect()[0]
    if row["v"] is None:
        raise ValueError("rmse: no scored rows (empty prediction⋈label join?)")
    return float(row["v"])


def mae(scored: DataFrame, *, label_col: str, pred_col: str) -> float:
    """Mean absolute error over all scored pairs."""
    row = scored.agg(F.avg(F.abs(F.col(pred_col) - F.col(label_col))).alias("v")).collect()[0]
    if row["v"] is None:
        raise ValueError("mae: no scored rows (empty prediction⋈label join?)")
    return float(row["v"])


def precision_at_k(
    scored: DataFrame,
    *,
    user_col: str,
    item_col: str,
    label_col: str,
    pred_col: str,
    k: int,
    threshold: float,
) -> DataFrame:
    """Per-user fraction of the predicted top-k whose label ≥ threshold.

    Returns (user, precision_at_k). Users with fewer than k scored items
    are measured over what they have (standard convention: divide by the
    actual cutoff size, not k).
    """
    w = Window.partitionBy(user_col).orderBy(F.col(pred_col).desc(), F.col(item_col))
    topk = scored.withColumn("__r", F.row_number().over(w)).where(F.col("__r") <= k)
    return topk.groupBy(user_col).agg(
        (
            F.sum((F.col(label_col) >= threshold).cast("int")) / F.count("*")
        ).alias("precision_at_k")
    )


def ndcg_at_k(
    scored: DataFrame,
    *,
    user_col: str,
    item_col: str,
    label_col: str,
    pred_col: str,
    k: int,
) -> DataFrame:
    """Per-user NDCG@k with linear gains (gain = label).

    DCG ranks by prediction, IDCG by label — both windows share the
    per-user partitioning, so one exchange feeds both sorts. Users whose
    ideal DCG is 0 (all labels 0) score 0.
    """
    wp = Window.partitionBy(user_col).orderBy(F.col(pred_col).desc(), F.col(item_col))
    wl = Window.partitionBy(user_col).orderBy(F.col(label_col).desc(), F.col(item_col))
    ranked = (
        scored.withColumn("__rp", F.row_number().over(wp))
        .withColumn("__rl", F.row_number().over(wl))
    )
    disc_p = F.when(F.col("__rp") <= k, F.col(label_col) / F.log2(F.col("__rp") + 1)).otherwise(F.lit(0.0))
    disc_l = F.when(F.col("__rl") <= k, F.col(label_col) / F.log2(F.col("__rl") + 1)).otherwise(F.lit(0.0))
    agg = ranked.groupBy(user_col).agg(
        F.sum(disc_p).alias("__dcg"), F.sum(disc_l).alias("__idcg")
    )
    return agg.select(
        user_col,
        F.when(F.col("__idcg") > 0, F.col("__dcg") / F.col("__idcg"))
        .otherwise(F.lit(0.0))
        .alias("ndcg_at_k"),
    )
