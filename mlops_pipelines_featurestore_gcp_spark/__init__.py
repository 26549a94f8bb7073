"""mlops_pipelines_featurestore_gcp_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference repo
``luis-farje-capgemini/mlops-pipelines-featurestore-gcp`` (a GCP MLOps
feature-store pipeline: BigQuery load/scan semantics, Vertex AI Feature Store
point-in-time reads, Pub/Sub streaming log loop, LinUCB bandit training), plus
the large-scale training-data-pipeline operators (dedup, similarity search,
text analysis, multimodal plumbing) such an engine needs at 100 TB scale.

Everything is DataFrame-native: explicit schemas (the reference is strictly
schema-on-write), Catalyst-optimized plans, broadcast joins for dimension
tables, AQE on, no driver-side collects on data paths.
"""

from mlops_pipelines_featurestore_gcp_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
