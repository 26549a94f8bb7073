"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``mlops_pipelines_featurestore_gcp_spark`` package; this module is
a thin adapter over its query registry (``plans/registry.py``).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO_DIR)
# Python WORKERS (mapInPandas / pandas_udf) import the package by module
# name; they inherit PYTHONPATH from the JVM, which inherits it from this
# process env — set it before any SparkSession (hence JVM) exists.
os.environ["PYTHONPATH"] = _REPO_DIR + os.pathsep + os.environ.get("PYTHONPATH", "")

from mlops_pipelines_featurestore_gcp_spark import plans  # noqa: E402  (registers all queries)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Runs the TPC-H Q3-shaped shipping-priority query: scan + broadcast join +
    shuffle join + aggregate + top-k in one statement.
    """
    return plans.QUERIES["q03_shipping_priority"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return plans.queries_map()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle for each SQL-expressible query."""
    return plans.oracle_sql_map()
