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


def test_scratch_dir_reaps_dead_pid_siblings(tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_SCRATCH", str(tmp_path))
    # simulate a dead prior runner: no real PID is this large on Linux
    # (pid_max caps at 2^22), so kill() raises ProcessLookupError
    dead = tmp_path / "store_y_4194400"
    dead.mkdir()
    (dead / "leak").write_text("x")
    # alive-but-foreign and non-PID siblings must survive
    alive = tmp_path / f"store_y_{os.getpid()}"
    alive.mkdir()
    other = tmp_path / "store_y_notapid"
    other.mkdir()
    unrelated = tmp_path / "store_z_4194400"
    unrelated.mkdir()
    p = scratch.scratch_dir("store_y", per_process=True)
    assert p == str(alive)
    assert not dead.exists()  # dead-PID sibling reaped
    assert other.exists() and unrelated.exists()  # non-matching kept


def test_scratch_dir_default_root_inside_repo_warehouse(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_SCRATCH", raising=False)
    p = scratch.scratch_dir("probe_default")
    repo = pathlib.Path(scratch.__file__).resolve().parents[2]
    assert pathlib.Path(p).is_relative_to(repo / "spark-warehouse" / "scratch")
