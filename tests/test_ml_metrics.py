from __future__ import annotations

import math

from mlops_pipelines_featurestore_gcp_spark.ml import metrics


def test_rmse_mae_closed_form(spark):
    df = spark.createDataFrame(
        [(1.0, 2.0), (3.0, 3.0), (0.0, 4.0)], "label double, pred double"
    )
    assert abs(metrics.rmse(df, label_col="label", pred_col="pred") - math.sqrt((1 + 0 + 16) / 3)) < 1e-12
    assert abs(metrics.mae(df, label_col="label", pred_col="pred") - (1 + 0 + 4) / 3) < 1e-12


def _scored(spark):
    # user 1: preds rank items a>b>c>d, labels make b,d relevant
    rows = [
        (1, "a", 0.0, 0.9),
        (1, "b", 1.0, 0.8),
        (1, "c", 0.0, 0.7),
        (1, "d", 1.0, 0.6),
        (2, "a", 1.0, 0.5),
        (2, "b", 0.0, 0.4),
    ]
    return spark.createDataFrame(rows, "user long, item string, label double, pred double")


def test_precision_at_k(spark):
    out = metrics.precision_at_k(
        _scored(spark), user_col="user", item_col="item",
        label_col="label", pred_col="pred", k=2, threshold=1.0,
    )
    got = {r.user: r.precision_at_k for r in out.collect()}
    assert got[1] == 0.5  # top-2 = a,b → one relevant
    assert got[2] == 0.5  # top-2 = a,b → one relevant


def test_ndcg_at_k_closed_form(spark):
    out = metrics.ndcg_at_k(
        _scored(spark), user_col="user", item_col="item",
        label_col="label", pred_col="pred", k=2,
    )
    got = {r.user: r.ndcg_at_k for r in out.collect()}
    # user 1: DCG = label@rank1/log2(2) + label@rank2/log2(3) = 0 + 1/log2(3)
    # IDCG  = 1/log2(2) + 1/log2(3)
    expect1 = (1 / math.log2(3)) / (1.0 + 1 / math.log2(3))
    assert abs(got[1] - expect1) < 1e-12
    # user 2: prediction order == ideal order → 1.0
    assert abs(got[2] - 1.0) < 1e-12


def test_ndcg_all_zero_labels_is_zero(spark):
    df = spark.createDataFrame(
        [(1, "a", 0.0, 0.9), (1, "b", 0.0, 0.8)], "user long, item string, label double, pred double"
    )
    out = metrics.ndcg_at_k(df, user_col="user", item_col="item", label_col="label", pred_col="pred", k=2)
    assert out.collect()[0]["ndcg_at_k"] == 0.0


def test_als_reconstruction_quality(spark, sf_small):
    """End-to-end: factorize the ratings matrix, score the training cells,
    and check the reconstruction beats the global-mean baseline."""
    from pyspark.sql import functions as F

    from mlops_pipelines_featurestore_gcp_spark.ml.factorization import als_factors
    from mlops_pipelines_featurestore_gcp_spark.sources.catalog import load_table

    ev = load_table(spark, "events", sf_small)
    ratings = ev.groupBy(F.col("user_id").cast("int").alias("u")).pivot(
        "event_type", ["click", "view"]
    ).agg(F.avg("value"))
    long = ev.select(
        F.col("user_id").cast("int").alias("u"),
        F.when(F.col("event_type") == "click", 0).otherwise(1).alias("i"),
        F.col("value").alias("label"),
    ).where(F.col("event_type").isin("click", "view")).groupBy("u", "i").agg(
        F.avg("label").alias("label")
    )
    user_f, item_f = als_factors(
        long, 2, user_col="u", item_col="i", rating_col="label", seed=7
    )
    pred = (
        long.join(user_f.withColumnRenamed("id", "u").withColumnRenamed("features", "uf"), "u")
        .join(item_f.withColumnRenamed("id", "i").withColumnRenamed("features", "if"), "i")
        .select(
            "u", "i", "label",
            F.aggregate(
                F.zip_with("uf", "if", lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("pred"),
        )
    )
    model_rmse = metrics.rmse(pred, label_col="label", pred_col="pred")
    mean_row = long.agg(F.avg("label").alias("m")).collect()[0]["m"]
    base = long.select("label", F.lit(mean_row).alias("pred"))
    base_rmse = metrics.rmse(base, label_col="label", pred_col="pred")
    assert model_rmse < base_rmse


def test_quantized_metrics_match_float_paths(spark):
    df = spark.createDataFrame(
        [(1.0, 2.25), (3.0, 3.0), (0.0, 4.5)], "label double, pred double"
    )
    assert abs(
        metrics.rmse(df, label_col="label", pred_col="pred", quant=1_000_000)
        - metrics.rmse(df, label_col="label", pred_col="pred")
    ) < 1e-5
    assert abs(
        metrics.mae(df, label_col="label", pred_col="pred", quant=1_000_000)
        - metrics.mae(df, label_col="label", pred_col="pred")
    ) < 1e-5
    out_f = metrics.ndcg_at_k(
        _scored(spark), user_col="user", item_col="item",
        label_col="label", pred_col="pred", k=2,
    )
    out_q = metrics.ndcg_at_k(
        _scored(spark), user_col="user", item_col="item",
        label_col="label", pred_col="pred", k=2, gain_quant=1_000_000,
    )
    f = {r.user: r.ndcg_at_k for r in out_f.collect()}
    q = {r.user: r.ndcg_at_k for r in out_q.collect()}
    assert set(f) == set(q)
    for u in f:
        assert abs(f[u] - q[u]) < 1e-5, u


def test_discount_table_is_the_dcg_series(spark):
    import math

    d = metrics.discount_table(4)
    assert d[0] == 1.0 and abs(d[2] - 1 / math.log2(4)) < 1e-15


def test_regression_metrics_single_pass_matches_individual(spark):
    df = spark.createDataFrame(
        [(1.0, 2.25), (3.0, 3.0), (0.0, 4.5)], "label double, pred double"
    )
    r, m = metrics.regression_metrics(df, label_col="label", pred_col="pred", quant=1_000_000)
    assert abs(r - metrics.rmse(df, label_col="label", pred_col="pred", quant=1_000_000)) < 1e-12
    assert abs(m - metrics.mae(df, label_col="label", pred_col="pred", quant=1_000_000)) < 1e-12
