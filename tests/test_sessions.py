from __future__ import annotations

from mlops_pipelines_featurestore_gcp_spark.operators.sessions import (
    retention_cohorts,
    session_stats,
    sessionize,
)


def test_sessionize_gap_boundary(spark):
    # gaps: 10 (same), 100 exactly (same — close at strictly greater), 101 (new)
    rows = [(1, 0), (1, 10), (1, 110), (1, 211), (2, 5)]
    ev = spark.createDataFrame(rows, "uid long, t long")
    out = sessionize(ev, entity_col="uid", time_col="t", gap=100)
    got = {(r.uid, r.t): r.session_seq for r in out.collect()}
    assert got[(1, 0)] == 1
    assert got[(1, 10)] == 1
    assert got[(1, 110)] == 1  # exactly gap apart stays in session
    assert got[(1, 211)] == 2  # gap exceeded
    assert got[(2, 5)] == 1


def test_session_stats_rollup(spark):
    rows = [(1, 0), (1, 50), (1, 500), (1, 510)]
    ev = spark.createDataFrame(rows, "uid long, t long")
    out = session_stats(ev, entity_col="uid", time_col="t", gap=100)
    got = {r.session_seq: r.asDict() for r in out.collect()}
    assert got[1]["n_events"] == 2 and got[1]["duration"] == 50
    assert got[2]["n_events"] == 2 and got[2]["t_start"] == 500


def test_retention_matrix(spark):
    # user 1 active periods 0,1,2; user 2 periods 1,2; user 3 period 0 only
    rows = [(1, 5), (1, 15), (1, 25), (2, 12), (2, 22), (3, 7), (3, 8)]
    ev = spark.createDataFrame(rows, "uid long, t long")
    out = retention_cohorts(ev, entity_col="uid", time_col="t", period=10)
    got = {(r.cohort_period, r.period_offset): r.n_active for r in out.collect()}
    assert got[(0, 0)] == 2  # users 1 and 3
    assert got[(0, 1)] == 1  # user 1 only
    assert got[(0, 2)] == 1
    assert got[(1, 0)] == 1  # user 2's cohort
    assert got[(1, 1)] == 1
    # duplicate events in one period counted once
    assert (0, 0) in got and got[(0, 0)] == 2
