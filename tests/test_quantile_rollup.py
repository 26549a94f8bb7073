from __future__ import annotations

import math

from pyspark.sql import functions as F

from mlops_pipelines_featurestore_gcp_spark.streaming.quantile_rollup import QuantileRollup


def _qr(tmp_path, name="qr", **kw):
    defaults = dict(
        time_col="t", value_col="v", keys=["k"], bucket_width=100,
        lo=0.0, hi=64.0, bins=16,  # bin_width = 4.0, exact binary
    )
    defaults.update(kw)
    return QuantileRollup(str(tmp_path / name), **defaults)


def _batch(spark, rows):
    return spark.createDataFrame(rows, "t long, k string, v double")


def _rows(n, k="a", t0=0):
    # values 1..n spread inside one bucket
    return [(t0 + i % 90, k, float(i + 1)) for i in range(n)]


def test_incremental_bin_counts_equal_full_rebuild_exactly(spark, tmp_path):
    rows = _rows(40) + [(150, "b", float(v)) for v in (2, 2, 9, 30, 63)]
    inc = _qr(tmp_path, "inc")
    for i in range(3):
        inc.refresh(_batch(spark, rows[i::3]), batch_id=i)
    full = _qr(tmp_path, "full")
    full.refresh(_batch(spark, rows), batch_id=0)
    got = {(r.bucket, r.k, r["__bin"]): r.bin_count for r in inc.histogram(spark).collect()}
    want = {(r.bucket, r.k, r["__bin"]): r.bin_count for r in full.histogram(spark).collect()}
    # integer bin counts merge associatively: incremental == full BIT-EXACT,
    # not epsilon-band (the contract st07's HLL rollup cannot make)
    assert got == want


def test_replayed_batch_id_is_idempotent(spark, tmp_path):
    qr = _qr(tmp_path)
    b = _batch(spark, _rows(10))
    qr.refresh(b, batch_id=0)
    once = {(r.bucket, r.k, r["__bin"]): r.bin_count for r in qr.histogram(spark).collect()}
    qr.refresh(b, batch_id=0)  # redelivered micro-batch: must not double-count
    again = {(r.bucket, r.k, r["__bin"]): r.bin_count for r in qr.histogram(spark).collect()}
    assert once == again


def test_quantile_estimate_within_half_bin_of_exact(spark, tmp_path):
    qr = _qr(tmp_path, hi=128.0, bins=32)  # width 4.0, domain covers 1..101
    rows = _rows(101)  # values 1..101 in bucket 0
    qr.refresh(_batch(spark, rows), batch_id=0)
    out = {r.k: r for r in qr.quantiles(spark, qs=(0.5, 0.95)).collect()}
    vals = sorted(v for _, _, v in rows)
    for q, col in ((0.5, "p50_est"), (0.95, "p95_est")):
        true = vals[math.ceil(q * len(vals)) - 1]
        assert abs(out["a"][col] - true) <= qr.bin_width / 2, (q, out["a"][col], true)
    assert out["a"].n_rows == 101


def test_out_of_domain_values_clamp_to_edge_bins(spark, tmp_path):
    qr = _qr(tmp_path)
    qr.refresh(_batch(spark, [(0, "a", -5.0), (1, "a", 1e9), (2, "a", 64.0)]), batch_id=0)
    got = {r["__bin"]: r.bin_count for r in qr.histogram(spark).collect()}
    assert got == {0: 1, 15: 2}  # below-lo -> bin 0; >= hi -> top bin


def test_rank_arithmetic_is_integer_exact_at_boundaries(spark, tmp_path):
    # n = 20: k95 = ceil(0.95*20) = 19 EXACTLY. A double 0.95*20 is
    # 18.999999999999996 — also ceil 19, but DECIMAL-vs-double engines can
    # disagree one rank when the product is an exact integer; the integer
    # form (19n+19)//20 cannot.
    qr = _qr(tmp_path)
    qr.refresh(_batch(spark, _rows(20)), batch_id=0)
    row = qr.quantiles(spark, qs=(0.95,)).collect()[0]
    # 19th smallest of 1..20 is 19.0 -> bin floor(19/4)=4 -> midpoint 18.0
    assert row.p95_est == 18.0


def test_read_prunes_bucket_range(spark, tmp_path):
    qr = _qr(tmp_path)
    qr.refresh(_batch(spark, [(50, "a", 1.0), (250, "a", 9.0), (950, "a", 33.0)]), batch_id=0)
    got = qr.quantiles(spark, qs=(0.5,), bucket_min=2, bucket_max=2).collect()
    assert [(r.bucket, r.p50_est) for r in got] == [(2, 10.0)]


def test_null_values_are_dropped_not_clamped(spark, tmp_path):
    qr = _qr(tmp_path)
    qr.refresh(
        spark.createDataFrame([(0, "a", None), (1, "a", 1.0)], "t long, k string, v double"),
        batch_id=0,
    )
    got = {r["__bin"]: r.bin_count for r in qr.histogram(spark).collect()}
    assert got == {0: 1}  # only the real value; no phantom bin-0 state row
