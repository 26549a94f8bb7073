"""Query plans: the engine's verified operator inventory.

Each module registers named queries into the shared registry; every query is a
``(spark, sf_dir) -> DataFrame`` callable plus (where SQL-expressible) an ANSI
SQL oracle string that DuckDB runs over the same parquet tables. The driver's
correctness gate compares the two (row count + schema + order-insensitive
value hash), so every computed column is aliased identically on both sides.
"""

from mlops_pipelines_featurestore_gcp_spark.plans import (  # noqa: F401  (import = register)
    feature_store_queries,
    llm_data,
    ml_queries,
    nested,
    relational,
    streaming_queries,
)
from mlops_pipelines_featurestore_gcp_spark.plans.registry import QUERIES, oracle_sql_map, queries_map

__all__ = ["QUERIES", "queries_map", "oracle_sql_map"]
