"""M1/A2/M6: rank-k factorization of the ratings matrix + reward lookup.

The reference builds a dense 943×1,682 user-item matrix from the ratings TSV
and truncates it to ``rank_k=20`` via SVD inside ``MovieLensPyEnvironment``
(``generator_component.py:44-49``); observations are the rank-k user
vectors, and the env's reward for (user, action) is the reconstructed
rating — the user-factor · item-factor dot product (``logger/main.py:63-66``).

Spark-first mapping: MLlib ALS on the *long-format* ratings DataFrame — no
dense matrix is ever materialized (at 100 TB the pivot would be the
bottleneck; ALS shuffles only the sparse triples). Factors stay in
DataFrames ``(id, features array<float>)`` keyed for broadcast joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mlops_pipelines_featurestore_gcp_spark.functions.vectors import dot


def als_factors(
    ratings: DataFrame,
    rank: int = 20,
    *,
    user_col: str = "user_id",
    item_col: str = "item_id",
    rating_col: str = "rating",
    max_iter: int = 10,
    reg_param: float = 0.1,
    seed: int = 42,
) -> tuple[DataFrame, DataFrame]:
    """Rank-k factorization → (user_factors, item_factors), each
    ``(id int, features array<float>)``.

    ALS is the idiomatic distributed stand-in for the reference's exact SVD
    truncation: both yield rank-k user/item vectors whose dot product
    approximates the rating.
    """
    from pyspark.ml.recommendation import ALS

    als = ALS(
        rank=rank,
        maxIter=max_iter,
        regParam=reg_param,
        userCol=user_col,
        itemCol=item_col,
        ratingCol=rating_col,
        seed=seed,
        coldStartStrategy="drop",
    )
    model = als.fit(ratings)
    return model.userFactors, model.itemFactors


def rating_matrix(ratings: DataFrame, *, user_col: str, pivot_col: str, value_col: str, pivot_values: list) -> DataFrame:
    """A2: long → wide pivot (the dense-matrix build, for bounded pivot
    cardinality only — the ALS path above is the scale path)."""
    return (
        ratings.groupBy(user_col)
        .pivot(pivot_col, pivot_values)
        .agg(F.avg(value_col))
    )


def reward_join(observations: DataFrame, item_factors: DataFrame, *, action_col: str = "action", obs_col: str = "obs") -> DataFrame:
    """M6/J3: reward = user-vector · item-factor[action] via a broadcast
    equi-join + JVM fold — the ``environment.step(action)`` lookup without
    rebuilding any environment."""
    factors = item_factors.select(F.col("id").alias(action_col), F.col("features"))
    joined = observations.join(F.broadcast(factors), on=action_col, how="left")
    return joined.withColumn("reward", dot(F.col(obs_col), F.col("features"))).drop("features")
