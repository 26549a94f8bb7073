"""Skew-safe top-k equivalence + stream-stream interval join parity."""

from __future__ import annotations

import json

from pyspark.sql import Window
from pyspark.sql import functions as F

from mlops_pipelines_featurestore_gcp_spark.operators.skew import salted_topk
from mlops_pipelines_featurestore_gcp_spark.sources.catalog import load_table
from mlops_pipelines_featurestore_gcp_spark.streaming.joins import interval_join


def test_salted_topk_matches_plain_window(spark, sf_medium):
    o = load_table(spark, "orders", sf_medium)
    order = [F.col("o_totalprice").desc(), F.col("o_orderkey")]
    w = Window.partitionBy("o_custkey").orderBy(*order)
    plain = (
        o.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", "rnk")
    )
    salted = salted_topk(o, "o_custkey", order, k=3, salt=8).select("o_custkey", "o_orderkey", "rnk")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def _events(spark, rows):
    return spark.createDataFrame(rows, "user_id long, ts string, v double").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )


def test_interval_join_batch_semantics(spark):
    preds = _events(spark, [(1, "2024-01-01 00:00:00", 10.0), (2, "2024-01-01 00:00:00", 20.0)])
    fb = spark.createDataFrame(
        [
            (1, "2024-01-01 00:02:00", 1.0),   # inside [0s, 5m] -> match
            (1, "2024-01-01 00:09:00", -1.0),  # outside upper -> no match
            (2, "2023-12-31 23:59:00", 9.9),   # before lower -> no match
        ],
        "user_id long, fts string, label double",
    ).withColumn("fts", F.col("fts").cast("timestamp"))
    out = interval_join(
        preds, fb, key="user_id", left_time="ts", right_time="fts", upper="5 minutes"
    ).select("user_id", "v", "label")
    assert [tuple(r) for r in out.collect()] == [(1, 10.0, 1.0)]


def test_interval_join_streaming_matches_batch(spark, tmp_path):
    pred_rows = [(u, f"2024-01-01 00:{m:02d}:00", float(u)) for u in (1, 2, 3) for m in (0, 10, 20)]
    fb_rows = [(u, f"2024-01-01 00:{m+2:02d}:00", float(u * 100 + m)) for u in (1, 2) for m in (0, 10, 20, 40)]

    batch = interval_join(
        _events(spark, pred_rows),
        spark.createDataFrame(fb_rows, "user_id long, fts string, label double").withColumn(
            "fts", F.col("fts").cast("timestamp")
        ),
        key="user_id", left_time="ts", right_time="fts", upper="5 minutes",
    ).select("user_id", "ts", "label")
    expected = sorted((r.user_id, str(r.ts), r.label) for r in batch.collect())

    pdir, fdir = tmp_path / "preds", tmp_path / "fb"
    pdir.mkdir(), fdir.mkdir()
    (pdir / "p.json").write_text("\n".join(json.dumps({"user_id": u, "ts": t, "v": v}) for u, t, v in pred_rows))
    (fdir / "f.json").write_text("\n".join(json.dumps({"user_id": u, "fts": t, "label": v}) for u, t, v in fb_rows))
    ps = spark.readStream.schema("user_id long, ts timestamp, v double").json(str(pdir))
    fs = spark.readStream.schema("user_id long, fts timestamp, label double").json(str(fdir))
    out = interval_join(ps, fs, key="user_id", left_time="ts", right_time="fts", upper="5 minutes")
    sink = str(tmp_path / "out")
    q = (
        out.select("user_id", "ts", "label")
        .writeStream.outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .format("parquet")
        .option("path", sink)
        .start()
    )
    q.awaitTermination(120)
    got = sorted((r.user_id, str(r.ts), r.label) for r in spark.read.parquet(sink).collect())
    assert got == expected and len(got) > 0


def test_interval_join_left_outer_batch(spark):
    preds = _events(spark, [(1, "2024-01-01 00:00:00", 10.0), (9, "2024-01-01 00:00:00", 90.0)])
    fb = spark.createDataFrame(
        [(1, "2024-01-01 00:02:00", 1.0)], "user_id long, fts string, label double"
    ).withColumn("fts", F.col("fts").cast("timestamp"))
    out = interval_join(
        preds, fb, key="user_id", left_time="ts", right_time="fts", upper="5 minutes", how="left_outer"
    ).select("user_id", "v", "label")
    got = sorted((r.user_id, r.v, r.label) for r in out.collect())
    assert got == [(1, 10.0, 1.0), (9, 90.0, None)]


def test_interval_join_full_outer_coalesces_key(spark):
    # right-unmatched rows must keep their join key (coalesced), not NULL
    preds = _events(spark, [(1, "2024-01-01 00:00:00", 10.0)])
    fb = spark.createDataFrame(
        [
            (1, "2024-01-01 00:02:00", 1.0),  # matches pred for user 1
            (7, "2024-01-01 00:02:00", 7.0),  # no pred for user 7 at all
        ],
        "user_id long, fts string, label double",
    ).withColumn("fts", F.col("fts").cast("timestamp"))
    out = interval_join(
        preds, fb, key="user_id", left_time="ts", right_time="fts", upper="5 minutes", how="full_outer"
    ).select("user_id", "v", "label")
    got = {(r.user_id, r.v, r.label) for r in out.collect()}
    assert got == {(1, 10.0, 1.0), (7, None, 7.0)}
    assert out.columns == ["user_id", "v", "label"]
