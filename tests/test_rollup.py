from __future__ import annotations

from pyspark.sql import functions as F

from mlops_pipelines_featurestore_gcp_spark.streaming.rollup import ContinuousAggregate, rollup_sink


def _ca(tmp_path, width=100):
    return ContinuousAggregate(
        str(tmp_path / "rollup"),
        time_col="t",
        value_col="v",
        keys=["k"],
        bucket_width=width,
    )


def _batch(spark, rows):
    return spark.createDataFrame(rows, "t long, k string, v double")


def test_incremental_refresh_equals_full_recompute(spark, tmp_path):
    ca = _ca(tmp_path)
    b1 = [(10, "a", 1.0), (20, "a", 3.0), (150, "b", 5.0)]
    b2 = [(30, "a", 5.0), (160, "b", 1.0), (990, "c", 7.0)]
    ca.refresh(_batch(spark, b1), batch_id=0)
    ca.refresh(_batch(spark, b2), batch_id=1)
    got = {(r.bucket, r.k): (r.n, r.total, r.vmin, r.vmax, r.vavg) for r in ca.read(spark).collect()}
    full = (
        _batch(spark, b1 + b2)
        .groupBy((F.floor(F.col("t") / 100)).cast("long").alias("bucket"), "k")
        .agg(
            F.count("v").alias("n"), F.sum("v").alias("total"),
            F.min("v").alias("vmin"), F.max("v").alias("vmax"), F.avg("v").alias("vavg"),
        )
    )
    expect = {(r.bucket, r.k): (r.n, r.total, r.vmin, r.vmax, r.vavg) for r in full.collect()}
    assert got == expect


def test_replayed_batch_is_skipped(spark, tmp_path):
    ca = _ca(tmp_path)
    b = [(10, "a", 2.0)]
    ca.refresh(_batch(spark, b), batch_id=0)
    ca.refresh(_batch(spark, b), batch_id=0)  # replay under the same id
    rows = ca.read(spark).collect()
    assert len(rows) == 1
    assert rows[0]["n"] == 1 and rows[0]["total"] == 2.0


def test_untouched_buckets_preserved(spark, tmp_path):
    ca = _ca(tmp_path)
    ca.refresh(_batch(spark, [(10, "a", 1.0), (550, "b", 9.0)]), batch_id=0)
    ca.refresh(_batch(spark, [(20, "a", 1.0)]), batch_id=1)  # touches bucket 0 only
    got = {(r.bucket, r.k): r.n for r in ca.read(spark).collect()}
    assert got[(0, "a")] == 2
    assert got[(5, "b")] == 1  # bucket 5 untouched by batch 1, still there


def test_cascade_hour_to_day(spark, tmp_path):
    fine = _ca(tmp_path, width=100)
    coarse = ContinuousAggregate(
        str(tmp_path / "coarse"), time_col="t", value_col="v", keys=["k"], bucket_width=300
    )
    fine.refresh(_batch(spark, [(10, "a", 1.0), (150, "a", 3.0), (290, "a", 5.0), (310, "a", 7.0)]), batch_id=0)
    fine.cascade_into(coarse, spark, batch_id=0)
    got = {(r.bucket, r.k): (r.n, r.total) for r in coarse.read(spark).collect()}
    assert got == {(0, "a"): (3, 9.0), (1, "a"): (1, 7.0)}


def test_rollup_sink_streaming(spark, tmp_path):
    src = tmp_path / "src"
    _batch(spark, [(10, "a", 1.0), (20, "a", 2.0)]).write.parquet(str(src))
    stream = spark.readStream.schema("t long, k string, v double").parquet(str(src))
    ca = _ca(tmp_path)
    q = rollup_sink(stream, ca, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    rows = ca.read(spark).collect()
    assert len(rows) == 1 and rows[0]["n"] == 2 and rows[0]["total"] == 3.0
