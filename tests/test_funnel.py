from __future__ import annotations

import pytest

from mlops_pipelines_featurestore_gcp_spark.operators.funnel import window_funnel

STEPS = ["view", "click", "buy"]


def _run(spark, rows, span=100):
    ev = spark.createDataFrame(rows, "uid long, t long, et string")
    out = window_funnel(
        ev, entity_col="uid", time_col="t", type_col="et", steps=STEPS, span=span
    )
    return {r.uid: r.asDict() for r in out.collect()}


def test_complete_funnel(spark):
    rows = [(1, 10, "view"), (1, 20, "click"), (1, 30, "buy")]
    r = _run(spark, rows)[1]
    assert r["funnel_level"] == 3
    assert r["t_step1"] == 10
    assert r["t_complete"] == 30
    assert r["time_to_complete"] == 20


def test_out_of_order_stops_level(spark):
    # buy precedes click → only view+click match
    rows = [(1, 10, "view"), (1, 15, "buy"), (1, 20, "click")]
    r = _run(spark, rows)[1]
    assert r["funnel_level"] == 2
    assert r["t_complete"] is None


def test_span_bounds_the_whole_funnel(spark):
    # click inside span of anchor, buy outside → level 2
    rows = [(1, 0, "view"), (1, 50, "click"), (1, 150, "buy")]
    r = _run(spark, rows, span=100)[1]
    assert r["funnel_level"] == 2


def test_equal_timestamps_need_strict_order(spark):
    rows = [(1, 10, "view"), (1, 10, "click")]
    r = _run(spark, rows)[1]
    assert r["funnel_level"] == 1


def test_entity_without_anchor_excluded(spark):
    rows = [(1, 10, "click"), (1, 20, "buy"), (2, 5, "view")]
    got = _run(spark, rows)
    assert set(got) == {2}
    assert got[2]["funnel_level"] == 1


def test_greedy_anchor_is_first_step1_event(spark):
    # anchor at t=0 leaves the t=200 click out of span even though the
    # t=180 view would complete — documented greedy semantics
    rows = [(1, 0, "view"), (1, 180, "view"), (1, 200, "click")]
    r = _run(spark, rows, span=100)[1]
    assert r["funnel_level"] == 1
    assert r["t_step1"] == 0


def test_two_steps_minimum(spark):
    with pytest.raises(ValueError):
        window_funnel(
            spark.range(1),
            entity_col="id",
            time_col="id",
            type_col="id",
            steps=["only"],
            span=10,
        )


def test_null_timestamps_ignored(spark):
    ev = spark.createDataFrame(
        [(1, 10, "view"), (1, None, "click"), (1, 20, "click"), (1, 30, "buy")],
        "uid long, t long, et string",
    )
    out = window_funnel(
        ev, entity_col="uid", time_col="t", type_col="et", steps=STEPS, span=100
    )
    r = out.collect()[0]
    # the null-time click can't participate; the t=20 one completes the chain
    assert r["funnel_level"] == 3
    assert r["t_complete"] == 30
