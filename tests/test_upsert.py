"""Keyed upsert sink: insert/update/late-version semantics, bucket-pruned
rewrites, idempotent batch replay, streaming foreachBatch parity."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from mlops_pipelines_featurestore_gcp_spark.streaming.upsert import (
    read_upsert_table,
    upsert_batch,
    upsert_sink,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v string, ver long")


def test_upsert_insert_update_and_late_version(spark, tmp_path):
    path = str(tmp_path / "tbl")
    upsert_batch(path, _df(spark, [(1, "a", 1), (2, "b", 1)]), key="k", version_col="ver")
    upsert_batch(path, _df(spark, [(2, "b2", 2), (3, "c", 1)]), key="k", version_col="ver")
    # late replay of an OLD version must not regress key 2
    upsert_batch(path, _df(spark, [(2, "stale", 1)]), key="k", version_col="ver")
    got = {r.k: (r.v, r.ver) for r in read_upsert_table(spark, path).collect()}
    assert got == {1: ("a", 1), 2: ("b2", 2), 3: ("c", 1)}


def test_upsert_rewrites_only_touched_buckets(spark, tmp_path):
    path = str(tmp_path / "tbl")
    big = spark.range(0, 200).select(
        F.col("id").alias("k"), F.concat(F.lit("v"), F.col("id")).alias("v"), F.lit(1).cast("long").alias("ver")
    )
    upsert_batch(path, big, key="k", version_col="ver", n_buckets=16)
    before = {
        d: sorted(os.listdir(os.path.join(path, d)))
        for d in os.listdir(path)
        if d.startswith("__kbucket=")
    }
    upsert_batch(path, _df(spark, [(7, "updated", 2)]), key="k", version_col="ver", n_buckets=16)
    after = {
        d: sorted(os.listdir(os.path.join(path, d)))
        for d in os.listdir(path)
        if d.startswith("__kbucket=")
    }
    changed = [d for d in before if before[d] != after[d]]
    assert len(changed) == 1, f"exactly one bucket dir should be rewritten, got {changed}"
    got = {r.k: r.v for r in read_upsert_table(spark, path).collect()}
    assert got[7] == "updated" and len(got) == 200


def test_upsert_batch_replay_is_idempotent(spark, tmp_path):
    path = str(tmp_path / "tbl")
    upsert_batch(path, _df(spark, [(1, "a", 1), (2, "b", 1)]), key="k", version_col="ver")
    batch = _df(spark, [(1, "a2", 2), (9, "i", 1)])
    upsert_batch(path, batch, key="k", version_col="ver")
    state1 = sorted(map(tuple, read_upsert_table(spark, path).collect()))
    upsert_batch(path, batch, key="k", version_col="ver")  # crash-replay
    state2 = sorted(map(tuple, read_upsert_table(spark, path).collect()))
    assert state1 == state2


def test_upsert_streaming_foreachbatch(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    rows = [
        {"k": 1, "v": "a", "ver": 1},
        {"k": 1, "v": "a2", "ver": 2},
        {"k": 2, "v": "b", "ver": 1},
    ]
    (src / "r.json").write_text("\n".join(json.dumps(r) for r in rows))
    stream = spark.readStream.schema("k long, v string, ver long").json(str(src))
    q = upsert_sink(
        stream,
        str(tmp_path / "tbl"),
        str(tmp_path / "ckpt"),
        key="k",
        version_col="ver",
        n_buckets=8,
    )
    q.awaitTermination(120)
    got = {r.k: (r.v, r.ver) for r in read_upsert_table(spark, str(tmp_path / "tbl")).collect()}
    assert got == {1: ("a2", 2), 2: ("b", 1)}


def test_upsert_schema_evolution_new_column(spark, tmp_path):
    from mlops_pipelines_featurestore_gcp_spark.streaming.upsert import read_upsert_table, upsert_batch

    path = str(tmp_path / "tbl")
    b1 = spark.createDataFrame([("k1", 1, 10.0), ("k2", 1, 20.0)], "id string, ver int, v double")
    upsert_batch(path, b1, key="id", version_col="ver", n_buckets=8)
    # batch 2 ADDS a column and updates k2 only
    b2 = spark.createDataFrame([("k2", 2, 21.0, "new")], "id string, ver int, v double, tag string")
    upsert_batch(path, b2, key="id", version_col="ver", n_buckets=8)
    got = {r.id: (r.ver, r.v, r.tag) for r in
           spark.read.option("mergeSchema", "true").parquet(path).drop("__kbucket").collect()}
    assert got["k2"] == (2, 21.0, "new")
    assert got["k1"][0] == 1 and got["k1"][2] is None  # untouched row: NULL for new col


def test_upsert_replay_missing_new_column(spark, tmp_path):
    from mlops_pipelines_featurestore_gcp_spark.streaming.upsert import upsert_batch

    path = str(tmp_path / "tbl")
    wide = spark.createDataFrame([("k1", 2, 1.0, "x")], "id string, ver int, v double, tag string")
    upsert_batch(path, wide, key="id", version_col="ver", n_buckets=8)
    # a late/replayed narrow batch (older version) must neither fail nor
    # regress the key
    narrow = spark.createDataFrame([("k1", 1, 0.5)], "id string, ver int, v double")
    upsert_batch(path, narrow, key="id", version_col="ver", n_buckets=8)
    row = spark.read.option("mergeSchema", "true").parquet(path).collect()[0]
    assert (row.ver, row.v, row.tag) == (2, 1.0, "x")


def test_upsert_buckets_self_compact(spark, tmp_path):
    from mlops_pipelines_featurestore_gcp_spark.streaming.upsert import upsert_batch

    path = tmp_path / "tbl"
    for v in range(3):  # three merges into the same bucket set
        b = spark.createDataFrame(
            [(f"k{i}", v, float(v)) for i in range(20)], "id string, ver int, v double"
        )
        upsert_batch(str(path), b, key="id", version_col="ver", n_buckets=4)
    for d in path.iterdir():
        if d.name.startswith("__kbucket="):
            files = [f for f in d.iterdir() if f.name.endswith(".parquet")]
            assert len(files) == 1, f"{d.name}: {len(files)} files"
