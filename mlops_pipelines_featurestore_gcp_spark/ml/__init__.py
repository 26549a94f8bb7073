"""ML kernel (SURVEY.md §2.8): rank-k factorization, the LinUCB contextual
bandit as a batch closed-form estimator, and DataFrame-native trajectory
generation."""

from mlops_pipelines_featurestore_gcp_spark.ml.factorization import als_factors, rating_matrix, reward_join
from mlops_pipelines_featurestore_gcp_spark.ml.generator import generate_trajectories, random_policy
from mlops_pipelines_featurestore_gcp_spark.ml.linucb import LinUCB, LinUCBModel

__all__ = [
    "als_factors",
    "rating_matrix",
    "reward_join",
    "generate_trajectories",
    "random_policy",
    "LinUCB",
    "LinUCBModel",
]
