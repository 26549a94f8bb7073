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


def rmse(scored: DataFrame, *, label_col: str, pred_col: str, quant: int | None = None) -> float:
    """Root-mean-squared error over all scored pairs.

    ``quant`` switches to the summation-order-proof posture (the t11
    micro-int pattern): each squared error floor-quantizes to an integer
    at that scale BEFORE the sum, so the aggregate is exact integer
    addition at any parallelism — a raw double AVG is reduction-order
    sensitive in the last ulp once enough rows sum (the class every 10×
    gate keeps finding). The result then derives from one exact rational
    + one sqrt, both IEEE-deterministic.

    The PER-ROW quantized value must fit int64 (|err|²·quant < 2⁶³ —
    ample for any real label domain); the SUM accumulates in
    decimal(38,0) like the rollup stores, so n·quant·max(err)² has no
    2⁶³ ceiling — at the 100× events gate a long-accumulated sum had
    only ~3× headroom left (ADVICE r7), and overflow there fails
    asymmetrically (Spark wraps or ANSI-throws, DuckDB HUGEINT errors).
    """
    err = F.col(pred_col) - F.col(label_col)
    if quant is None:
        row = scored.agg(F.sqrt(F.avg(F.pow(err, 2))).alias("v")).collect()[0]
        if row["v"] is None:
            raise ValueError("rmse: no scored rows (empty prediction⋈label join?)")
        return float(row["v"])
    se_q = F.floor(err * err * F.lit(float(quant)) + F.lit(0.5)).cast("long")
    row = scored.agg(
        F.sum(se_q.cast("decimal(38,0)")).alias("s"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    if not row["n"]:
        raise ValueError("rmse: no scored rows (empty prediction⋈label join?)")
    import math

    return math.sqrt(int(row["s"]) / (row["n"] * float(quant)))


def mae(scored: DataFrame, *, label_col: str, pred_col: str, quant: int | None = None) -> float:
    """Mean absolute error over all scored pairs. ``quant`` as in ``rmse``:
    integer-exact absolute errors, order-proof decimal(38,0) sum (the
    per-row int64 bound and overflow rationale are documented there)."""
    err = F.abs(F.col(pred_col) - F.col(label_col))
    if quant is None:
        row = scored.agg(F.avg(err).alias("v")).collect()[0]
        if row["v"] is None:
            raise ValueError("mae: no scored rows (empty prediction⋈label join?)")
        return float(row["v"])
    ae_q = F.floor(err * F.lit(float(quant)) + F.lit(0.5)).cast("long")
    row = scored.agg(
        F.sum(ae_q.cast("decimal(38,0)")).alias("s"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    if not row["n"]:
        raise ValueError("mae: no scored rows (empty prediction⋈label join?)")
    return int(row["s"]) / (row["n"] * float(quant))


def regression_metrics(
    scored: DataFrame, *, label_col: str, pred_col: str, quant: int
) -> tuple[float, float]:
    """(rmse, mae) from ONE aggregate scan in the order-proof quantized
    posture — callers needing both metrics should not pay two corpus
    passes (``rmse``/``mae`` each run their own job). Sums accumulate in
    decimal(38,0) — see ``rmse`` for the per-row int64 bound."""
    import math

    err = F.col(pred_col) - F.col(label_col)
    q = F.lit(float(quant))
    row = scored.agg(
        F.sum(
            F.floor(err * err * q + F.lit(0.5)).cast("long").cast("decimal(38,0)")
        ).alias("se"),
        F.sum(
            F.floor(F.abs(err) * q + F.lit(0.5)).cast("long").cast("decimal(38,0)")
        ).alias("ae"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    if not row["n"]:
        raise ValueError("regression_metrics: no scored rows")
    denom = row["n"] * float(quant)
    return math.sqrt(int(row["se"]) / denom), int(row["ae"]) / denom


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


def discount_table(k: int) -> list[float]:
    """The DCG rank discounts 1/log2(r+1) for r = 1..k, computed ONCE
    driver-side. Injecting these as literals (into the plan AND any SQL
    twin) keeps transcendentals out of the distributed path entirely —
    two engines' log2 can differ a ulp, and at 100× corpus scale a ulp
    under a floor-quantization boundary flips a value."""
    import math

    return [1.0 / math.log2(r + 1) for r in range(1, k + 1)]


def ndcg_at_k(
    scored: DataFrame,
    *,
    user_col: str,
    item_col: str,
    label_col: str,
    pred_col: str,
    k: int,
    gain_quant: int | None = None,
) -> DataFrame:
    """Per-user NDCG@k with linear gains (gain = label).

    DCG ranks by prediction, IDCG by label — both windows share the
    per-user partitioning, so one exchange feeds both sorts. Users whose
    ideal DCG is 0 (all labels 0) score 0.

    ``gain_quant`` switches to the order-proof posture: each discounted
    gain floor-quantizes to an integer at that scale (discounts from
    ``discount_table`` — driver-side literals, no distributed log2), the
    per-user sums are exact BIGINT adds, and the final NDCG is one
    integer-ratio division — bit-stable at any parallelism and SQL-
    replayable term for term.
    """
    wp = Window.partitionBy(user_col).orderBy(F.col(pred_col).desc(), F.col(item_col))
    wl = Window.partitionBy(user_col).orderBy(F.col(label_col).desc(), F.col(item_col))
    ranked = (
        scored.withColumn("__rp", F.row_number().over(wp))
        .withColumn("__rl", F.row_number().over(wl))
    )
    if gain_quant is None:
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
    discs = F.array(*[F.lit(d) for d in discount_table(k)])
    q = F.lit(float(gain_quant))

    def _term(rank_col: str):
        gain = F.col(label_col) * F.element_at(discs, F.col(rank_col).cast("int"))
        return F.when(
            F.col(rank_col) <= k, F.floor(gain * q + F.lit(0.5)).cast("long")
        ).otherwise(F.lit(0).cast("long"))

    agg = ranked.groupBy(user_col).agg(
        F.sum(_term("__rp")).alias("__dcg"), F.sum(_term("__rl")).alias("__idcg")
    )
    return agg.select(
        user_col,
        F.when(F.col("__idcg") > 0, F.col("__dcg") / F.col("__idcg"))
        .otherwise(F.lit(0.0))
        .alias("ndcg_at_k"),
    )
