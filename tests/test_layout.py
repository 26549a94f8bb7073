"""Clustered layout: files cover narrow key ranges, predicates reach the
scan, and the skipping-enabling property is measured from the footers."""

from __future__ import annotations

from pyspark.sql import functions as F

from mlops_pipelines_featurestore_gcp_spark.sources.layout import (
    layout_stats,
    read_clustered,
    save_clustered,
)


def _write(spark, tmp_path, clustered: bool):
    df = spark.range(0, 40_000).select(
        F.col("id").alias("k"),
        (F.col("id") % 97).alias("v"),
    )
    if not clustered:
        # adversarial layout: round-robin spreads every key range everywhere
        df = df.repartition(8)
    path = str(tmp_path / ("clustered" if clustered else "scattered"))
    if clustered:
        save_clustered(df, path, cluster_by="k", num_files=8)
    else:
        df.write.mode("overwrite").parquet(path)
    return path


def test_clustered_files_are_near_disjoint(spark, tmp_path):
    path = _write(spark, tmp_path, clustered=True)
    stats = layout_stats(spark, path, "k").collect()
    assert len(stats) >= 4
    # each file's interval is narrow: total covered width ≈ global width,
    # not n_files × global width
    widths = [int(r.c_max) - int(r.c_min) for r in stats]
    assert sum(widths) <= 40_000 * 1.1
    # and intervals are pairwise disjoint (range partitioning)
    spans = sorted((int(r.c_min), int(r.c_max)) for r in stats)
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 < lo2


def test_scattered_files_all_cover_everything(spark, tmp_path):
    path = _write(spark, tmp_path, clustered=False)
    stats = layout_stats(spark, path, "k").collect()
    widths = [int(r.c_max) - int(r.c_min) for r in stats]
    # the anti-property: every file spans ~the whole key range — nothing
    # is skippable. This is what save_clustered exists to prevent.
    assert all(w > 39_000 * 0.9 for w in widths)


def test_range_predicate_is_pushed_and_result_correct(spark, tmp_path):
    path = _write(spark, tmp_path, clustered=True)
    out = read_clustered(spark, path).where((F.col("k") >= 1000) & (F.col("k") < 1100))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "GreaterThanOrEqual(k,1000)" in plan, plan
    assert out.count() == 100
    # only ONE of the 8 range files contains [1000, 1100)
    stats = layout_stats(spark, path, "k").collect()
    containing = [r for r in stats if int(r.c_min) <= 1000 and int(r.c_max) >= 1099]
    assert len(containing) == 1


def test_roundtrip_preserves_rows(spark, tmp_path):
    path = _write(spark, tmp_path, clustered=True)
    df = read_clustered(spark, path)
    assert df.count() == 40_000
    assert df.agg(F.sum("k")).collect()[0][0] == sum(range(40_000))


def test_zorder_keeps_both_dimensions_narrow(spark, tmp_path):
    from mlops_pipelines_featurestore_gcp_spark.sources.layout import save_zordered

    n = 40_000
    side = 200  # x, y ∈ [0, 200): a 200×200 grid
    df = spark.range(0, n).select(
        (F.col("id") % side).alias("x"),
        (F.col("id") / side).cast("long").alias("y"),
    )
    zpath = str(tmp_path / "zorder")
    save_zordered(df, zpath, zorder_by=["x", "y"], num_files=16)
    xpath = str(tmp_path / "xonly")
    save_clustered(df, xpath, cluster_by="x", num_files=16)

    def mean_width(path, col):
        stats = layout_stats(spark, path, col).collect()
        return sum(int(r.c_max) - int(r.c_min) for r in stats) / len(stats)

    # clustering on x alone: x narrow, y spans ~everything in every file
    assert mean_width(xpath, "x") < side * 0.2
    assert mean_width(xpath, "y") > side * 0.8
    # z-order: BOTH dimensions stay well below the full span per file
    assert mean_width(zpath, "x") < side * 0.6
    assert mean_width(zpath, "y") < side * 0.6


def test_compact_table_bin_packs_and_preserves_rows(spark, tmp_path):
    from mlops_pipelines_featurestore_gcp_spark.sources.layout import compact_table

    path = str(tmp_path / "frag")
    df = spark.range(0, 10_000).selectExpr("id", "id % 7 AS k")
    df.repartition(40).write.parquet(path)  # 40 tiny files
    before = {r.id for r in spark.read.parquet(path).collect()}
    stats = compact_table(spark, path, target_bytes=1 << 30)  # everything fits one file
    assert stats["files_before"] == 40 and stats["files_after"] == 1 and not stats["skipped"]
    after_df = spark.read.parquet(path)
    assert {r.id for r in after_df.collect()} == before
    # idempotent: second run is a no-op
    again = compact_table(spark, path, target_bytes=1 << 30)
    assert again["skipped"] and again["files_before"] == 1


def test_compact_table_can_recluster(spark, tmp_path):
    from mlops_pipelines_featurestore_gcp_spark.sources.layout import compact_table, layout_stats

    path = str(tmp_path / "frag2")
    spark.range(0, 20_000).selectExpr("id", "CAST(id AS DOUBLE) AS v").orderBy(
        F.rand(7)
    ).repartition(30).write.parquet(path)
    stats = compact_table(spark, path, target_bytes=60_000, cluster_by="id")
    assert not stats["skipped"] and stats["files_after"] < 30
    # compaction restored a clustered layout: per-file id ranges near-disjoint
    st = layout_stats(spark, path, "id").collect()
    spans = sorted((r.c_min, r.c_max) for r in st)
    for (a_min, a_max), (b_min, b_max) in zip(spans, spans[1:]):
        assert a_max <= b_min  # disjoint intervals


def test_compact_table_can_zorder(spark, tmp_path):
    import pytest

    from mlops_pipelines_featurestore_gcp_spark.sources.layout import (
        compact_table,
        layout_stats,
    )

    n, side = 40_000, 200
    path = str(tmp_path / "frag3")
    df = spark.range(0, n).select(
        (F.col("id") % side).alias("x"),
        (F.col("id") / side).cast("long").alias("y"),
    )
    df.repartition(40).write.parquet(path)  # 40 scattered files
    before = spark.read.parquet(path).agg(F.sum("x"), F.sum("y")).collect()[0]
    import glob
    import os

    total = sum(os.path.getsize(f) for f in glob.glob(f"{path}/*.parquet"))
    # target exactly 16 output files (matches the save_zordered property
    # test's geometry — the 0.6-span bound assumes ~4x4 z cells per dim)
    stats = compact_table(
        spark, path, target_bytes=-(-total // 16), zorder_by=["x", "y"]
    )
    assert not stats["skipped"] and stats["files_after"] == 16

    def mean_width(col):
        st = layout_stats(spark, path, col).collect()
        return sum(int(r.c_max) - int(r.c_min) for r in st) / len(st)

    # the compacted rewrite restored MULTI-dimensional clustering
    assert mean_width("x") < side * 0.6
    assert mean_width("y") < side * 0.6
    after = spark.read.parquet(path)
    assert after.count() == n
    assert after.agg(F.sum("x"), F.sum("y")).collect()[0] == before
    with pytest.raises(ValueError, match="mutually exclusive"):
        compact_table(spark, path, cluster_by="x", zorder_by=["x", "y"])


def test_z_value_nulls_and_constant_column(spark):
    from mlops_pipelines_featurestore_gcp_spark.sources.layout import z_value

    df = spark.createDataFrame(
        [(None, 5), (1, 5), (100, 5), (50, 5)], "a int, b int"
    )
    out = z_value(df, ["a", "b"]).collect()
    by_a = {r["a"]: r["__z"] for r in out}
    # NULL sorts first: its z-value must not exceed any non-null row's
    assert by_a[None] <= min(v for k, v in by_a.items() if k is not None)
    # constant column b dedupes to one edge and merely offsets bits;
    # ordering by z still follows a
    assert by_a[1] <= by_a[50] <= by_a[100]


def test_z_value_low_cardinality_fills_bit_range(spark):
    # the q40-at-sf0.001 regression: a low-cardinality column must still
    # use HIGH Morton bits, or the interleave degenerates to single-key
    # ordering (zorder_both_dims_narrow went 0 at sf0.001's l_partkey)
    from pyspark.sql import functions as F

    from mlops_pipelines_featurestore_gcp_spark.sources.layout import z_value

    df = spark.range(0, 4_000).select(
        (F.col("id") % 4).alias("x"),       # 4 distinct values
        (F.col("id") % 1000).alias("y"),    # 1000 distinct values
    )
    norm = z_value(df, ["x", "y"])
    # x's top Morton bit position is 2*9+0 = 18 for qbits=10; rows with
    # the max x must set a bit at least that high
    top = norm.where(F.col("x") == 3).agg(F.max("__z")).collect()[0][0]
    assert top >= (1 << 18), f"high Morton bits unused: max z for x=3 is {top}"


def test_z_value_binary_column_reaches_top_index(spark):
    # the ADVICE r8 off-by-one: dividing by n_buckets instead of
    # n_buckets-1 left a 2-bucket column at {0, 511} — the TOP normalized
    # index must be exactly 2^qbits-1 so its top Morton bit is set
    from pyspark.sql import functions as F

    from mlops_pipelines_featurestore_gcp_spark.sources.layout import z_value

    df = spark.range(0, 2_000).select(
        (F.col("id") % 2).alias("x"),       # binary column
        (F.col("id") % 500).alias("y"),
    )
    norm = z_value(df, ["x", "y"])
    # x's bit 9 interleaves to position 2*9+0 = 18; x=1 rows must set it
    x_mask = sum(1 << (2 * j) for j in range(10))
    tops = (
        norm.where(F.col("x") == 1)
        .select(F.col("__z").bitwiseAND(F.lit(x_mask)).alias("xbits"))
        .distinct()
        .collect()
    )
    # top bucket maps to index 2^qbits-1 exactly → ALL x-bit positions set
    assert {r["xbits"] for r in tops} == {x_mask}, tops[:5]
