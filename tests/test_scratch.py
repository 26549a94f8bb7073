"""sources/scratch.py: repo-local scratch lifecycle."""

from __future__ import annotations

import os
import pathlib

from mlops_pipelines_featurestore_gcp_spark.sources import scratch


def test_scratch_dir_content_addressed_reuse(tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_SCRATCH", str(tmp_path))
    p1 = scratch.scratch_dir("idx_abc")
    pathlib.Path(p1, "marker").write_text("x")
    p2 = scratch.scratch_dir("idx_abc")
    assert p1 == p2 and os.path.exists(os.path.join(p2, "marker"))


def test_scratch_dir_fresh_predeletes(tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_SCRATCH", str(tmp_path))
    p1 = scratch.scratch_dir("store_x", fresh=True, per_process=True)
    pathlib.Path(p1, "stale").write_text("x")
    p2 = scratch.scratch_dir("store_x", fresh=True, per_process=True)
    assert p1 == p2  # same process -> same path, bounded leakage
    assert not os.path.exists(os.path.join(p2, "stale"))  # but emptied


def test_scratch_dir_default_root_inside_repo_warehouse(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_SCRATCH", raising=False)
    p = scratch.scratch_dir("probe_default")
    repo = pathlib.Path(scratch.__file__).resolve().parents[2]
    assert pathlib.Path(p).is_relative_to(repo / "spark-warehouse" / "scratch")
