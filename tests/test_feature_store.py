"""FeatureStore API tests (FS1-FS7 semantics from SURVEY.md §2.9 + §5.2
property checks: import-twice → latest returns second, as-of between imports
returns first, one row per entity)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mlops_pipelines_featurestore_gcp_spark.feature_store import FeatureStore
from mlops_pipelines_featurestore_gcp_spark.feature_store.store import point_in_time_values
from mlops_pipelines_featurestore_gcp_spark.operators.asof import asof_join


@pytest.fixture
def store(spark, tmp_path):
    return FeatureStore(spark, str(tmp_path / "fs"))


def test_registry_lifecycle(store):
    store.create_featurestore("movie_fs", online_node_count=1)
    store.create_featurestore("other_fs")
    assert store.list_featurestores() == ["movie_fs", "other_fs"]
    with pytest.raises(ValueError, match="already exists"):
        store.create_featurestore("movie_fs")
    store.create_entity_type("movie_fs", "users", description="per-user features")
    for feat in ("user_id", "item_id", "rating", "timestamp"):
        store.create_feature("movie_fs", "users", feat, value_type="STRING")
    store.cleanup_featurestore("movie_fs", force=True)
    assert store.list_featurestores() == ["other_fs"]


def test_import_and_latest_read(store, spark):
    store.create_featurestore("fs")
    store.create_entity_type("fs", "users")
    src1 = spark.createDataFrame([(1, 10.0, "A"), (2, 20.0, "B")], "uid long, bal double, seg string")
    src2 = spark.createDataFrame([(1, 11.0, "A2")], "uid long, bal double, seg string")
    n1 = store.import_feature_values("fs", "users", src1, entity_id_field="uid", feature_time="2024-01-01")
    n2 = store.import_feature_values("fs", "users", src2, entity_id_field="uid", feature_time="2024-02-01")
    assert (n1, n2) == (4, 2)

    latest = {r.entity_id: (r.bal, r.seg) for r in store.read_latest("fs", "users").collect()}
    assert latest == {"1": ("11.0", "A2"), "2": ("20.0", "B")}

    # as-of between the two imports → first import wins
    asof = {r.entity_id: r.bal for r in store.read_latest("fs", "users", at="2024-01-15").collect()}
    assert asof == {"1": "10.0", "2": "20.0"}

    # IdMatcher-style restriction
    only2 = store.read_latest("fs", "users", entity_ids=[2]).collect()
    assert [r.entity_id for r in only2] == ["2"]


def test_import_is_append_one_row_per_entity(store, spark):
    store.create_featurestore("fs")
    store.create_entity_type("fs", "users")
    src = spark.range(50).select(F.col("id").alias("uid"), (F.col("id") * 2.0).alias("x"))
    store.import_feature_values("fs", "users", src, entity_id_field="uid", feature_time="2024-01-01")
    store.import_feature_values("fs", "users", src, entity_id_field="uid", feature_time="2024-01-02")
    vals = store.values("fs", "users")
    assert vals.count() == 100  # append, not overwrite
    wide = store.read_latest("fs", "users")
    assert wide.count() == 50  # one row per entity
    assert wide.groupBy("entity_id").count().where(F.col("count") > 1).count() == 0


def test_point_in_time_join_spine(store, spark):
    store.create_featurestore("fs")
    store.create_entity_type("fs", "u")
    imports = [("2024-01-01", 1.0), ("2024-01-10", 2.0), ("2024-01-20", 3.0)]
    for when, val in imports:
        src = spark.createDataFrame([(7, val)], "uid long, score double")
        store.import_feature_values("fs", "u", src, entity_id_field="uid", feature_time=when)
    spine = spark.createDataFrame(
        [("7", "2023-12-31"), ("7", "2024-01-05"), ("7", "2024-01-15"), ("7", "2024-02-01")],
        "uid string, t string",
    ).select("uid", F.col("t").cast("timestamp").alias("t"))
    out = store.point_in_time_join("fs", "u", spine, spine_key="uid", spine_time="t")
    got = {str(r.t.date()): r.score for r in out.collect()}
    assert got == {"2023-12-31": None, "2024-01-05": "1.0", "2024-01-15": "2.0", "2024-02-01": "3.0"}


def test_asof_join_inclusive_and_ties(spark):
    left = spark.createDataFrame([(1, 10), (1, 20), (2, 15)], "k long, t long")
    right = spark.createDataFrame(
        [(1, 10, "at10"), (1, 10, "at10b"), (1, 15, "at15"), (2, 99, "late")],
        "k long, t long, v string",
    )
    out = asof_join(
        left,
        right.select("k", F.col("t").alias("rt"), "v"),
        "k",
        left_time="t",
        right_time="rt",
        tie_break="v",
    )
    got = {(r.k, r.t): r.v for r in out.collect()}
    # inclusive boundary; tie at rt=10 resolved to the larger tie_break value
    assert got == {(1, 10): "at10b", (1, 20): "at15", (2, 15): None}


def test_point_in_time_empty_values_returns_spine(spark):
    # no registered feature values -> the spine comes back unchanged (the
    # explode-over-feature-names path would otherwise drop every row)
    values = spark.createDataFrame(
        [], "entity_id long, feature_name string, feature_time timestamp, value double"
    )
    spine = spark.createDataFrame([(7, "2024-01-01 00:00:00")], "entity_id long, ts string").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    out = point_in_time_values(values, spine, spine_key="entity_id", spine_time="ts")
    assert out.columns == spine.columns
    assert out.count() == 1


def test_online_materialize_and_pruned_read(store, spark):
    store.create_featurestore("fs")
    store.create_entity_type("fs", "users")
    src = spark.createDataFrame(
        [(i, float(i) * 1.5, f"seg{i % 3}") for i in range(40)],
        "uid long, bal double, seg string",
    )
    store.import_feature_values("fs", "users", src, entity_id_field="uid", feature_time="2024-01-01")
    path = store.materialize_online("fs", "users", buckets=8)

    # lookup agrees with the batch latest-read
    got = {r.entity_id: (r.bal, r.seg) for r in store.online_read("fs", "users", [3, 17]).collect()}
    assert got == {"3": ("4.5", "seg0"), "17": ("25.5", "seg2")}

    # the scan opened ONLY the buckets the keys hash to — partition pruning
    import zlib

    want = {zlib.crc32(e.encode()) % 8 for e in ("3", "17")}
    read_files = {
        r[0]
        for r in store.online_read("fs", "users", [3, 17])
        .select(F.input_file_name())
        .distinct()
        .collect()
    }
    assert read_files, "lookup read no files"
    assert all(any(f"bucket={b}/" in f for b in want) for f in read_files)

    # spark-side crc32 bucket == zlib.crc32 driver-side for every entity
    all_rows = spark.read.parquet(path).select("entity_id", "bucket").collect()
    assert all(r.bucket == zlib.crc32(r.entity_id.encode()) % 8 for r in all_rows)


def test_online_rematerialize_overwrites(store, spark):
    store.create_featurestore("fs")
    store.create_entity_type("fs", "users")
    src1 = spark.createDataFrame([(1, 10.0)], "uid long, bal double")
    store.import_feature_values("fs", "users", src1, entity_id_field="uid", feature_time="2024-01-01")
    store.materialize_online("fs", "users", buckets=4)
    src2 = spark.createDataFrame([(1, 99.0)], "uid long, bal double")
    store.import_feature_values("fs", "users", src2, entity_id_field="uid", feature_time="2024-02-01")
    store.materialize_online("fs", "users", buckets=4)
    assert [r.bal for r in store.online_read("fs", "users", [1]).collect()] == ["99.0"]


def test_asof_forward_direction_and_tolerance(spark):
    left = spark.createDataFrame(
        [("e1", 10), ("e1", 25), ("e2", 5)], "entity string, t long"
    )
    right = spark.createDataFrame(
        [("e1", 12, "a"), ("e1", 30, "b"), ("e2", 100, "c")], "entity string, rt long, v string"
    )
    fwd = {
        (r.entity, r.t): r.v
        for r in asof_join(
            left, right, "entity", left_time="t", right_time="rt", direction="forward"
        ).collect()
    }
    # earliest right row at-or-after each left time
    assert fwd == {("e1", 10): "a", ("e1", 25): "b", ("e2", 5): "c"}

    tol = {
        (r.entity, r.t): r.v
        for r in asof_join(
            left, right, "entity", left_time="t", right_time="rt",
            direction="forward", tolerance=F.lit(10),
        ).collect()
    }
    # e2's only candidate is 95 ticks away → nulled by tolerance
    assert tol == {("e1", 10): "a", ("e1", 25): "b", ("e2", 5): None}

    back_tol = {
        (r.entity, r.t): r.v
        for r in asof_join(
            left, right, "entity", left_time="t", right_time="rt", tolerance=F.lit(5),
        ).collect()
    }
    # backward: t=25 matches rt=12 but 13 > 5 ticks stale → null
    assert back_tol == {("e1", 10): None, ("e1", 25): None, ("e2", 5): None}


def test_asof_timestamp_tolerance_interval(spark):
    left = spark.createDataFrame(
        [("e1", "2024-01-10"), ("e1", "2024-03-01")], "entity string, t string"
    ).select("entity", F.col("t").cast("timestamp").alias("t"))
    right = spark.createDataFrame(
        [("e1", "2024-01-01", 1.0)], "entity string, rt string, v double"
    ).select("entity", F.col("rt").cast("timestamp").alias("rt"), "v")
    got = {
        r.t.month: r.v
        for r in asof_join(
            left, right, "entity", left_time="t", right_time="rt",
            tolerance=F.expr("INTERVAL 30 DAYS"),
        ).collect()
    }
    assert got == {1: 1.0, 3: None}  # March read is 60 days stale → dropped
