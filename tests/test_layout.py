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
