"""Scalar/array function helpers shared by operators and plans."""

from mlops_pipelines_featurestore_gcp_spark.functions import text, vectors  # noqa: F401
