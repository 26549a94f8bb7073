"""End-to-end pipeline test: the reference's full startup DAG (§3.1) on a
MovieLens-shaped fixture, then streaming append + retrain (§3.2/ST5)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mlops_pipelines_featurestore_gcp_spark.feature_store import FeatureStore
from mlops_pipelines_featurestore_gcp_spark.pipeline import (
    PipelineConfig,
    predict,
    retrain,
    run_startup_pipeline,
)


@pytest.fixture
def u_data(tmp_path):
    """300-row MovieLens-shaped TSV: 30 users × 10 items."""
    rng = np.random.default_rng(5)
    lines = [
        f"{u}\t{i}\t{1 + (u * i) % 5}\t{880000000 + u * 1000 + i}"
        for u in range(1, 31)
        for i in range(1, 11)
    ]
    p = tmp_path / "u.data"
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_startup_pipeline_end_to_end(spark, u_data, tmp_path):
    cfg = PipelineConfig(
        rank_k=4, batch_size=4, num_actions=10, driver_steps=5, als_max_iter=5
    )
    store = FeatureStore(spark, str(tmp_path / "fs"))
    art = run_startup_pipeline(
        spark, u_data, str(tmp_path / "work"), config=cfg, feature_store=store
    )

    # load stage: all 300 rows, STRING-typed
    raw = spark.read.parquet(art.raw_table)
    assert raw.count() == 300
    assert all(f.dataType.simpleString() == "string" for f in raw.schema.fields)

    # feature store: one latest row per user entity
    latest = store.read_latest("movie_fs", "users")
    assert latest.count() == 30

    # generate stage: nested trajectory rows
    traj = spark.read.parquet(art.training_table)
    assert traj.count() == cfg.driver_steps
    row = traj.first()
    assert len(row.observation) == cfg.batch_size
    assert len(row.observation[0].observation_batch) == cfg.rank_k

    # ingest stage: TFRecords hold driver_steps × batch_size flat examples
    tfr = spark.read.format("binaryFile").load(f"{art.tfrecord_dir}/*.tfrecord")
    assert tfr.count() >= 1

    # train stage + serving: artifact exists, scores a batch
    obs = spark.createDataFrame(
        [([0.1] * cfg.rank_k,), ([0.9] * cfg.rank_k,)], "obs array<double>"
    )
    preds = predict(spark, art.model_path, obs)
    acts = [r.predicted_action for r in preds.collect()]
    assert all(0 <= a < cfg.num_actions for a in acts)


def test_retrain_after_append(spark, u_data, tmp_path):
    cfg = PipelineConfig(rank_k=3, batch_size=2, num_actions=5, driver_steps=3, als_max_iter=3)
    art = run_startup_pipeline(spark, u_data, str(tmp_path / "work"), config=cfg)

    # simulate the streaming log loop appending more trajectories (S3)
    spark.read.parquet(art.training_table).write.mode("append").parquet(art.training_table)
    assert spark.read.parquet(art.training_table).count() == 2 * cfg.driver_steps

    new_model = retrain(spark, art.training_table, str(tmp_path / "work2"), config=cfg)
    obs = spark.createDataFrame([([0.5] * cfg.rank_k,)], "obs array<double>")
    assert predict(spark, new_model, obs).count() == 1
