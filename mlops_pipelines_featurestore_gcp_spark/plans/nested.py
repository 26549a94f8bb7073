"""Nested-data queries: array/struct construction, nested projection,
flatten/explode round-trips — the trajectory-schema operations (SURVEY.md
§1.1-1.2, FIXTURES.md §2) exercised on the TPC-H-ish fixtures so DuckDB can
oracle them.

Array-typed OUTPUT columns are serialized at the boundary (see
``functions/canonical.py``) because the driver's pandas canonicalizer cannot
hash lists; the nested computation itself stays native on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mlops_pipelines_featurestore_gcp_spark.functions.canonical import (
    ser_double_array,
    ser_long_array,
    sql_double_array,
    sql_long_array,
)
from mlops_pipelines_featurestore_gcp_spark.plans.registry import register
from mlops_pipelines_featurestore_gcp_spark.sources.catalog import load_table


@register(
    "n01_array_build_transform",
    oracle=f"""
    WITH arrs AS (
      SELECT l_orderkey,
             list(l_quantity ORDER BY l_linenumber, l_quantity) AS q,
             list(l_linenumber ORDER BY l_linenumber, l_quantity) AS ln
      FROM lineitem
      WHERE l_orderkey < 500
      GROUP BY l_orderkey
    )
    SELECT l_orderkey,
           {sql_double_array('q')} AS quantities,
           {sql_long_array('ln')} AS linenumbers,
           CAST(len(q) AS BIGINT) AS n_items,
           {sql_double_array('list_transform(q, x -> x * 2.0)')} AS doubled,
           q[1] AS first_qty,
           CAST(list_sum(q) AS DOUBLE) AS total_qty,
           {sql_double_array('list_reverse(q)')} AS reversed
    FROM arrs
    """,
    tags=("nested", "agg", "projection"),
)
def n01_array_build_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build REPEATED columns (per-order arrays in deterministic line order,
    the trajectory batch-array shape) and transform them in place: element-wise
    map, indexing, fold, reverse (P1/P3's reshape surface in one pass)."""
    li = load_table(spark, "lineitem", sf_dir).where(F.col("l_orderkey") < 500)
    arrs = (
        li.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_list(F.struct("l_linenumber", "l_quantity"))).alias("z"))
        .select("l_orderkey", F.col("z.l_quantity").alias("q"), F.col("z.l_linenumber").alias("ln"))
    )
    return arrs.select(
        "l_orderkey",
        ser_double_array("q").alias("quantities"),
        ser_long_array("ln").alias("linenumbers"),
        F.size("q").cast("long").alias("n_items"),
        ser_double_array(F.transform("q", lambda x: x * 2.0)).alias("doubled"),
        F.element_at("q", 1).alias("first_qty"),
        F.aggregate("q", F.lit(0.0), lambda acc, x: acc + x).alias("total_qty"),
        ser_double_array(F.reverse("q")).alias("reversed"),
    )


@register(
    "n04_explode_roundtrip",
    oracle="""
    WITH arrs AS (
      SELECT l_orderkey, list(l_quantity ORDER BY l_linenumber, l_quantity) AS q
      FROM lineitem WHERE l_orderkey < 300 GROUP BY l_orderkey
    ),
    exploded AS (
      SELECT l_orderkey,
             CAST(unnest(generate_series(1, len(q))) - 1 AS BIGINT) AS pos,
             unnest(q) AS qty
      FROM arrs
    )
    SELECT l_orderkey, pos, qty FROM exploded
    """,
    tags=("nested", "explode"),
    defer=True,
)
def n04_explode_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode: REPEATED column back to rows with positions (the
    Example-building flatten, P1)."""
    li = load_table(spark, "lineitem", sf_dir).where(F.col("l_orderkey") < 300)
    arrs = (
        li.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_list(F.struct("l_linenumber", "l_quantity"))).alias("z"))
        .select("l_orderkey", F.col("z.l_quantity").alias("q"))
    )
    return arrs.select("l_orderkey", F.posexplode("q").alias("pos", "qty")).select(
        "l_orderkey", F.col("pos").cast("long").alias("pos"), "qty"
    )


@register(
    "n05_depth3_trajectory_shape",
    oracle=f"""
    WITH per_order AS (
      SELECT o.o_custkey, o.o_orderkey AS ok, MIN(o.o_totalprice) AS tp,
             list(l.l_quantity ORDER BY l.l_linenumber, l.l_quantity) AS ob
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE o.o_custkey < 50
      GROUP BY o.o_custkey, o.o_orderkey
    ),
    obs AS (
      SELECT o_custkey,
             list({{'observation_batch': ob}} ORDER BY ok) AS observation,
             {{'order_keys': list(ok ORDER BY ok),
              'prices': list(tp ORDER BY ok)}} AS orders_struct
      FROM per_order
      GROUP BY o_custkey
    )
    SELECT o_custkey,
           CAST(len(observation) AS BIGINT) AS batch,
           {sql_long_array('list_transform(observation, x -> CAST(len(x.observation_batch) AS BIGINT))')} AS inner_sizes,
           CAST(list_sum(list_transform(observation,
                x -> CAST(list_sum(x.observation_batch) AS DOUBLE))) AS DOUBLE) AS total,
           {sql_long_array('orders_struct.order_keys')} AS order_keys,
           CAST(len(orders_struct.prices) AS BIGINT) AS n_orders,
           orders_struct.prices[1] AS first_price
    FROM obs
    """,
    tags=("nested", "depth3", "struct"),
    defer=True,
)
def n05_depth3_trajectory_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The exact trajectory nesting: array<struct<observation_batch:
    array<double>>> built from real data, then navigated at every depth —
    plus the depth-2 struct-of-arrays build + field access (r6's n03 folded
    in: ``orders_struct`` = struct(order_keys, prices) assembled in the SAME
    per-customer aggregate, so the merge adds zero shuffles)."""
    o = load_table(spark, "orders", sf_dir).where(F.col("o_custkey") < 50)
    li = load_table(spark, "lineitem", sf_dir)
    per_order = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_custkey", "o_orderkey")
        .agg(
            F.sort_array(F.collect_list(F.struct("l_linenumber", "l_quantity"))).alias("z"),
            F.min("o_totalprice").alias("tp"),
        )
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("ok"),
            F.col("z.l_quantity").alias("ob"),
            "tp",
        )
    )
    obs = per_order.groupBy("o_custkey").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("ok", "ob"))),
            lambda s: F.struct(s.ob.alias("observation_batch")),
        ).alias("observation"),
        F.struct(
            F.sort_array(F.collect_list(F.struct(F.col("ok").alias("k")))).k.alias("order_keys"),
            F.sort_array(F.collect_list(F.struct("ok", "tp"))).tp.alias("prices"),
        ).alias("orders_struct"),
    )
    return obs.select(
        "o_custkey",
        F.size("observation").cast("long").alias("batch"),
        ser_long_array(
            F.transform("observation", lambda x: F.size(x.observation_batch).cast("long"))
        ).alias("inner_sizes"),
        F.aggregate(
            F.transform(
                "observation",
                lambda x: F.aggregate(x.observation_batch, F.lit(0.0), lambda a, b: a + b),
            ),
            F.lit(0.0),
            lambda a, b: a + b,
        ).alias("total"),
        ser_long_array(F.col("orders_struct.order_keys")).alias("order_keys"),
        F.size("orders_struct.prices").cast("long").alias("n_orders"),
        F.element_at(F.col("orders_struct.prices"), 1).alias("first_price"),
    )
