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


def test_null_time_rows_dropped(spark, tmp_path):
    # NULL event time has no bucket: keeping it would strand state in a
    # NULL partition that isin() pruning can never re-read (silent loss on
    # the next merge). Contract: dropped, like watermark-expired rows.
    ca = _ca(tmp_path)
    ca.refresh(_batch(spark, [(10, "a", 1.0), (None, "a", 9.0)]), batch_id=0)
    ca.refresh(_batch(spark, [(None, "a", 7.0), (20, "a", 2.0)]), batch_id=1)
    rows = ca.read(spark).collect()
    assert len(rows) == 1
    assert rows[0]["n"] == 2 and rows[0]["total"] == 3.0


def test_partition_dirs_bounded_by_bucket_group(spark, tmp_path):
    # 10 buckets at buckets_per_partition=4 → ceil coverage of 3 pgroup
    # dirs, NOT 10 bucket dirs (the r3 small-files layout).
    ca = ContinuousAggregate(
        str(tmp_path / "rollup"), time_col="t", value_col="v", keys=["k"],
        bucket_width=100, buckets_per_partition=4,
    )
    rows = [(i * 100 + 5, "a", float(i)) for i in range(10)]
    ca.refresh(_batch(spark, rows), batch_id=0)
    store = tmp_path / "rollup" / "state"
    dirs = [e for e in store.iterdir() if e.name.startswith("pgroup=")]
    assert {d.name for d in dirs} == {"pgroup=0", "pgroup=1", "pgroup=2"}
    # self-compacting: one data file per pgroup dir per rewrite
    for d in dirs:
        files = [f for f in d.iterdir() if f.name.endswith(".parquet")]
        assert len(files) == 1, f"{d.name} has {len(files)} files"


def test_refresh_rewrites_only_touched_groups(spark, tmp_path):
    ca = ContinuousAggregate(
        str(tmp_path / "rollup"), time_col="t", value_col="v", keys=["k"],
        bucket_width=100, buckets_per_partition=4,
    )
    ca.refresh(_batch(spark, [(5, "a", 1.0), (905, "b", 2.0)]), batch_id=0)  # pgroups 0, 2
    store = tmp_path / "rollup" / "state"
    untouched_files = set((store / "pgroup=2").iterdir())
    ca.refresh(_batch(spark, [(105, "a", 3.0)]), batch_id=1)  # pgroup 0 only
    assert set((store / "pgroup=2").iterdir()) == untouched_files, (
        "refresh of pgroup 0 must not rewrite pgroup 2's files"
    )
    got = {(r.bucket, r.k): r.n for r in ca.read(spark).collect()}
    assert got == {(0, "a"): 1, (1, "a"): 1, (9, "b"): 1}


def test_bucket_range_read_prunes_and_matches(spark, tmp_path):
    ca = ContinuousAggregate(
        str(tmp_path / "rollup"), time_col="t", value_col="v", keys=["k"],
        bucket_width=100, buckets_per_partition=4,
    )
    rows = [(i * 100 + 5, "a", float(i)) for i in range(12)]
    ca.refresh(_batch(spark, rows), batch_id=0)
    got = sorted(r.bucket for r in ca.read(spark, bucket_min=3, bucket_max=9).collect())
    assert got == [3, 4, 5, 6, 7, 8, 9]
    # the derived pgroup bounds must appear in the plan (directory pruning)
    plan = ca.read(spark, bucket_min=3, bucket_max=9)._jdf.queryExecution().executedPlan().toString()
    assert "pgroup" in plan


def test_refresh_survives_store_wipe_after_materialize(spark, tmp_path, monkeypatch):
    """Kill-and-retry safety: the merged state must be fully materialized
    BEFORE the overwrite starts. Injecting a total store wipe between the
    localCheckpoint and the write simulates the worst mid-replacement
    state a task retry could observe; a lazy merge plan (the r3 hazard)
    would lose rows or crash reading the vanishing files."""
    import shutil

    ca = _ca(tmp_path)
    ca.refresh(_batch(spark, [(10, "a", 1.0), (550, "b", 9.0)]), batch_id=0)

    real_overwrite = ContinuousAggregate._overwrite

    def wiping_overwrite(self, materialized):
        shutil.rmtree(self._store)  # worst-case: every old file already gone
        real_overwrite(self, materialized)

    monkeypatch.setattr(ContinuousAggregate, "_overwrite", wiping_overwrite)
    ca.refresh(_batch(spark, [(20, "a", 1.0)]), batch_id=1)
    monkeypatch.undo()

    got = {(r.bucket, r.k): r.n for r in ca.read(spark).collect()}
    # bucket 0 merged across both batches; bucket 5's state survived because
    # it was read into the merge before the wipe (same pgroup at width=100/64)
    assert got[(0, "a")] == 2
    assert got[(5, "b")] == 1


def test_compact_coalesces_and_preserves_state(spark, tmp_path):
    ca = ContinuousAggregate(
        str(tmp_path / "rollup"), time_col="t", value_col="v", keys=["k"],
        bucket_width=100, buckets_per_partition=4,
    )
    for i in range(3):
        ca.refresh(_batch(spark, [(i * 10, "a", float(i)), (905, "b", 1.0)]), batch_id=i)
    before = {(r.bucket, r.k): (r.n, r.total) for r in ca.read(spark).collect()}
    ca.compact(spark)
    after = {(r.bucket, r.k): (r.n, r.total) for r in ca.read(spark).collect()}
    assert before == after
    store = tmp_path / "rollup" / "state"
    for d in store.iterdir():
        if d.name.startswith("pgroup="):
            assert len([f for f in d.iterdir() if f.name.endswith(".parquet")]) == 1


def test_session_overwrite_mode_untouched(spark, tmp_path):
    # ADVICE r3 (medium): refresh must not flip the SESSION conf — sibling
    # static overwrites (IVF index rebuild) depend on truncate semantics.
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
    ca = _ca(tmp_path)
    ca.refresh(_batch(spark, [(10, "a", 1.0)]), batch_id=0)
    ca.refresh(_batch(spark, [(20, "a", 2.0)]), batch_id=1)
    assert spark.conf.get("spark.sql.sources.partitionOverwriteMode") == "static"


def test_expire_drops_old_partitions_and_filters_boundary(spark, tmp_path):
    ca = ContinuousAggregate(
        str(tmp_path / "rollup"), time_col="t", value_col="v", keys=["k"],
        bucket_width=100, buckets_per_partition=4,
    )
    rows = [(i * 100 + 5, "a", float(i)) for i in range(12)]  # buckets 0..11
    ca.refresh(_batch(spark, rows), batch_id=0)
    store = tmp_path / "rollup" / "state"
    # cutoff mid-group: bucket >= 6 kept → pgroup 0 dropped whole, pgroup 1
    # (buckets 4-7) filtered, pgroup 2 untouched
    untouched = set((store / "pgroup=2").iterdir())
    ca.expire(spark, before_bucket=6)
    names = {e.name for e in store.iterdir() if e.name.startswith("pgroup=")}
    assert names == {"pgroup=1", "pgroup=2"}
    assert set((store / "pgroup=2").iterdir()) == untouched  # not rewritten
    got = sorted(r.bucket for r in ca.read(spark).collect())
    assert got == [6, 7, 8, 9, 10, 11]


def test_expire_aligned_cutoff_is_pure_deletion(spark, tmp_path):
    ca = ContinuousAggregate(
        str(tmp_path / "rollup"), time_col="t", value_col="v", keys=["k"],
        bucket_width=100, buckets_per_partition=4,
    )
    ca.refresh(_batch(spark, [(i * 100 + 5, "a", 1.0) for i in range(12)]), batch_id=0)
    store = tmp_path / "rollup" / "state"
    survivors = {n: set((store / n).iterdir()) for n in ("pgroup=1", "pgroup=2")}
    ca.expire(spark, before_bucket=4)  # exactly at a group boundary
    assert {e.name for e in store.iterdir() if e.name.startswith("pgroup=")} == {"pgroup=1", "pgroup=2"}
    for n, files in survivors.items():
        assert set((store / n).iterdir()) == files  # zero rewrites
    assert sorted(r.bucket for r in ca.read(spark).collect()) == list(range(4, 12))


def test_cascade_after_expire_reflects_retention(spark, tmp_path):
    fine = ContinuousAggregate(
        str(tmp_path / "fine"), time_col="t", value_col="v", keys=["k"],
        bucket_width=100, buckets_per_partition=4,
    )
    coarse = ContinuousAggregate(
        str(tmp_path / "coarse"), time_col="t", value_col="v", keys=["k"], bucket_width=400
    )
    fine.refresh(_batch(spark, [(i * 100 + 5, "a", 1.0) for i in range(8)]), batch_id=0)
    fine.expire(spark, before_bucket=4)
    fine.cascade_into(coarse, spark, batch_id=0)
    got = {(r.bucket, r.k): r.n for r in coarse.read(spark).collect()}
    # only fine buckets 4..7 survive -> one coarse bucket (4..7)//4 == 1
    assert got == {(1, "a"): 4}
