"""S1: ratings TSV load — the reference's entry boundary.

The reference loads MovieLens ``u.data`` (tab-separated, no header) into a
4-column all-STRING table with truncate-overwrite semantics
(``load_component.py:31-41``: ``field_delimiter="\\t"``, ``WRITE_TRUNCATE``,
``CREATE_IF_NEEDED``). Even ``rating`` and ``timestamp`` are STRING — the
casts happen downstream. We preserve that quirk in compat mode and expose a
typed analytic view.

Known reference bug NOT reproduced by default (FIXTURES.md §1): the declared
schema lists ``item_id`` before ``user_id`` (``load_component.py:32-33``)
while the file order is user, item — a silent column swap. ``compat_swap=
True`` reproduces it for parity testing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

RAW_COLUMNS = ("user_id", "item_id", "rating", "timestamp")


def ratings_schema(compat_swap: bool = False) -> T.StructType:
    """All-STRING schema; ``compat_swap`` reproduces the reference's
    item/user column-order bug."""
    cols = list(RAW_COLUMNS)
    if compat_swap:
        cols[0], cols[1] = cols[1], cols[0]
    return T.StructType([T.StructField(c, T.StringType()) for c in cols])


def load_ratings_tsv(spark: SparkSession, path: str, *, compat_swap: bool = False) -> DataFrame:
    """Load the TSV with the explicit all-STRING schema (schema-on-write,
    no inference — mirroring the reference's load job)."""
    return spark.read.csv(path, sep="\t", schema=ratings_schema(compat_swap), header=False)


def save_ratings_table(df: DataFrame, table_path: str) -> None:
    """Truncate-overwrite parquet 'table' (WRITE_TRUNCATE + CREATE_IF_NEEDED:
    Spark's overwrite mode creates or replaces in one step)."""
    df.write.mode("overwrite").parquet(table_path)


def typed_view(raw: DataFrame) -> DataFrame:
    """P6: the analytic view — STRING quirks cast to proper types
    (``rating`` int, unix-seconds ``timestamp`` → TimestampType)."""
    return raw.select(
        F.col("user_id").cast("int").alias("user_id"),
        F.col("item_id").cast("int").alias("item_id"),
        F.col("rating").cast("int").alias("rating"),
        F.to_timestamp(F.from_unixtime(F.col("timestamp").cast("long"))).alias("ts"),
    )
