"""Milestone-4 source/sink tests: ratings TSV compat layer (S1/P6),
trajectory NDJSON round-trip at depth-3 nesting (S2/S3/P1/P2), and the
TFRecord codec (S6/S7) — golden-output + property checks per SURVEY.md §5.2."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mlops_pipelines_featurestore_gcp_spark.sources import ratings as rat
from mlops_pipelines_featurestore_gcp_spark.sources import tfrecord as tfr
from mlops_pipelines_featurestore_gcp_spark.sources import trajectories as traj


@pytest.fixture
def udata_path(tmp_path):
    rows = [
        "196\t242\t3\t881250949",
        "186\t302\t3\t891717742",
        "22\t377\t1\t878887116",
    ]
    p = tmp_path / "u.data"
    p.write_text("\n".join(rows) + "\n")
    return str(p)


def test_ratings_load_all_string(spark, udata_path):
    df = rat.load_ratings_tsv(spark, udata_path)
    assert [f.dataType for f in df.schema.fields] == [T.StringType()] * 4
    assert df.columns == list(rat.RAW_COLUMNS)
    assert df.count() == 3
    first = df.orderBy("timestamp").first()
    assert (first.user_id, first.item_id, first.rating) == ("22", "377", "1")


def test_ratings_compat_swap_reproduces_reference_bug(spark, udata_path):
    df = rat.load_ratings_tsv(spark, udata_path, compat_swap=True)
    assert df.columns[:2] == ["item_id", "user_id"]
    row = df.where(F.col("user_id") == "242").first()  # swapped: file col2 lands in user_id
    assert row.item_id == "196"


def test_ratings_typed_view(spark, udata_path):
    typed = rat.typed_view(rat.load_ratings_tsv(spark, udata_path))
    assert dict((f.name, f.dataType) for f in typed.schema.fields) == {
        "user_id": T.IntegerType(),
        "item_id": T.IntegerType(),
        "rating": T.IntegerType(),
        "ts": T.TimestampType(),
    }
    assert typed.agg(F.sum("rating")).first()[0] == 7


def test_ratings_truncate_overwrite(spark, udata_path, tmp_path):
    out = str(tmp_path / "ratings_tbl")
    df = rat.load_ratings_tsv(spark, udata_path)
    rat.save_ratings_table(df, out)
    rat.save_ratings_table(df.limit(2), out)  # WRITE_TRUNCATE, not append
    assert spark.read.parquet(out).count() == 2


TRAJ_ROWS = [
    {
        "step_type": [0, 1],
        "observation": [
            {"observation_batch": [1.0, 2.0]},
            {"observation_batch": [3.0, 4.0]},
        ],
        "action": [5, 7],
        "policy_info": [0.5],
        "next_step_type": [1, 1],
        "reward": [0.0, 1.5],
        "discount": [1.0, 1.0],
    }
]


def _traj_df(spark):
    return spark.createDataFrame(TRAJ_ROWS, traj.TRAJECTORY_SCHEMA)


def test_trajectory_ndjson_roundtrip(spark, tmp_path):
    p = str(tmp_path / "traj_json")
    traj.write_trajectories_ndjson(_traj_df(spark), p)
    back = traj.read_trajectories_ndjson(spark, p)
    assert back.schema == traj.TRAJECTORY_SCHEMA
    row = back.first()
    assert row.observation[1].observation_batch == [3.0, 4.0]
    assert row.action == [5, 7]


def test_trajectory_append_is_union(spark, tmp_path):
    p = str(tmp_path / "traj_tbl")
    df = _traj_df(spark)
    traj.write_trajectories_table(df, p, mode="overwrite")
    traj.write_trajectories_table(df, p, mode="append")  # S3 WRITE_APPEND
    assert spark.read.parquet(p).count() == 2


def test_flatten_wrap_inverse(spark):
    df = _traj_df(spark)
    flat = traj.flatten_observations(df)
    assert flat.first().observation == [[1.0, 2.0], [3.0, 4.0]]
    back = traj.wrap_observations(flat)
    assert back.schema == df.schema
    assert back.first().observation == df.first().observation


def test_example_codec_roundtrip():
    row = {
        "step_type": [0, 1, 2],
        "reward": [0.5, 1.5],
        "name": "policy-a",
        "blob": b"\x00\x01",
    }
    ex = tfr.encode_example(row)
    got = tfr.decode_example(ex)
    assert got["step_type"] == [0, 1, 2]
    assert got["reward"] == [0.5, 1.5]
    assert got["name"] == [b"policy-a"]
    assert got["blob"] == [b"\x00\x01"]


def test_example_codec_negative_ints():
    got = tfr.decode_example(tfr.encode_example({"x": [-1, -(2**40), 3]}))
    assert got["x"] == [-1, -(2**40), 3]


def test_tfrecord_framing_roundtrip_and_crc():
    recs = [b"alpha", b"", b"gamma" * 100]
    framed = tfr.frame_records(recs)
    assert list(tfr.unframe_records(framed)) == recs
    corrupted = bytearray(framed)
    corrupted[8] ^= 0xFF  # flip a length-crc byte
    with pytest.raises(ValueError, match="corrupt"):
        list(tfr.unframe_records(bytes(corrupted)))


def test_tfrecord_df_roundtrip(spark, tmp_path):
    schema = T.StructType(
        [
            T.StructField("step_type", T.LongType()),
            T.StructField("reward", T.ArrayType(T.DoubleType())),
            T.StructField("label", T.StringType()),
        ]
    )
    df = spark.createDataFrame(
        [(i, [float(i), float(i) * 0.5], f"row{i}") for i in range(20)], schema
    ).repartition(3)
    out = str(tmp_path / "tfr")
    tfr.write_tfrecords(df, out)
    back = tfr.read_tfrecords(spark, out, schema)
    assert back.count() == 20
    got = {r.step_type: (r.reward, r.label) for r in back.collect()}
    assert got[7] == ([7.0, 3.5], "row7")


def test_fixture_schemas_match_declared(sf_small):
    """Early drift alarm: the driver regenerates /root/testdata between
    rounds, and a physical-type change (events.ts went int64-ns →
    timestamp[us] in round 3) silently corrupts values when read through a
    stale explicit schema. Compare every parquet footer against SCHEMAS."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from mlops_pipelines_featurestore_gcp_spark.sources.catalog import SCHEMAS, TABLE_NAMES

    compatible = {
        "int": {pa.int32()},
        "bigint": {pa.int64()},
        "double": {pa.float64()},
        "float": {pa.float32()},
        "string": {pa.string(), pa.large_string()},
        "timestamp": {pa.timestamp("us"), pa.timestamp("ns"), pa.timestamp("ms")},
    }
    for name in TABLE_NAMES:
        path = f"{sf_small}/{name}.parquet"
        if not os.path.exists(path):
            continue
        physical = {f.name: f.type for f in pq.read_schema(path)}
        for field in SCHEMAS[name]:
            spark_t = field.dataType.simpleString()
            assert field.name in physical, f"{name}.{field.name} missing from fixture"
            actual = physical[field.name]
            if spark_t.startswith("array"):
                assert pa.types.is_list(actual) or pa.types.is_large_list(actual), (name, field.name, actual)
            elif name == "events" and field.name == "ts":
                # legacy int64-ns OR modern timestamp — load_table adapts
                assert pa.types.is_integer(actual) or pa.types.is_timestamp(actual)
            else:
                assert actual in compatible[spark_t], (
                    f"{name}.{field.name}: declared {spark_t}, fixture has {actual} — "
                    "update sources/catalog.py SCHEMAS for the regenerated testdata"
                )


def test_ndjson_corrupt_record_quarantine(spark, tmp_path):
    from mlops_pipelines_featurestore_gcp_spark.sources.trajectories import read_trajectories_ndjson

    good = '{"step_type": [1], "observation": [{"observation_batch": [1.0, 2.0]}], "action": [3], "policy_info": [0.0], "next_step_type": [1], "reward": [0.5], "discount": [1.0]}'
    path = tmp_path / "msgs"
    path.mkdir()
    (path / "a.json").write_text(good + "\n{not json at all\n" + good + "\n")
    out = read_trajectories_ndjson(spark, str(path), corrupt_col="_corrupt").collect()
    bad = [r for r in out if r["_corrupt"] is not None]
    ok = [r for r in out if r["_corrupt"] is None]
    assert len(out) == 3 and len(bad) == 1 and len(ok) == 2
    assert bad[0]["_corrupt"].startswith("{not json")
    assert ok[0].action == [3]
    # strict default shape unchanged
    strict = read_trajectories_ndjson(spark, str(path))
    assert "_corrupt" not in strict.columns


def test_ndjson_quarantine_write_patterns(spark, tmp_path):
    # the two supported quarantine projections (Spark disallows
    # corrupt-column-only queries on raw JSON scans)
    from pyspark.sql import functions as F

    from mlops_pipelines_featurestore_gcp_spark.sources.trajectories import read_trajectories_ndjson

    path = tmp_path / "msgs"
    path.mkdir()
    (path / "a.json").write_text('{bad line\n')
    df = read_trajectories_ndjson(spark, str(path), corrupt_col="_corrupt")
    # pattern 1: keep a schema column in the projection
    bad = df.where(F.col("_corrupt").isNotNull()).select("action", "_corrupt").collect()
    assert len(bad) == 1 and bad[0]["_corrupt"].startswith("{bad")
    # pattern 2: cache first, then corrupt-only projection is legal
    cached = df.cache()
    only = cached.where(F.col("_corrupt").isNotNull()).select("_corrupt").collect()
    assert len(only) == 1
    cached.unpersist()
