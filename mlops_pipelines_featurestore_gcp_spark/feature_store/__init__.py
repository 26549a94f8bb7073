"""Feature store: registry (FS1-FS5), value import (FS6), latest / point-in-
time reads (FS7, J2) — the Spark-native re-expression of the reference's
Vertex AI Feature Store usage (``feature_store_helper.py``,
``bigquery_to_featurestore.py``)."""

from mlops_pipelines_featurestore_gcp_spark.feature_store.store import FeatureStore, latest_values, point_in_time_values

__all__ = ["FeatureStore", "latest_values", "point_in_time_values"]
