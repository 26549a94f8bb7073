"""Repo-local scratch directories for queries that materialize state.

Several registered queries write working state (persisted ANN indexes,
rollup stores, compaction targets, codec round-trip dirs). Two rules,
learned across rounds (ADVICE r7 d09; VERDICT r7 minor item):

1. Scratch lives under ``<repo>/spark-warehouse/scratch/`` — inside the
   repo tree (the build convention prohibits writing outside it) and
   already gitignored, never in ``/tmp`` where repeated gate/driver/audit
   runs accumulate unbounded state.
2. Paths are CONTENT-ADDRESSED (caller passes a name embedding an input
   hash), so repeated runs overwrite one copy instead of leaking one per
   execution. Callers whose stores must start empty for correctness
   (batch-id replay protection no-ops on a reused index — the d09 class)
   pass ``fresh=True`` to pre-delete at acquisition; per-process suffixes
   keep concurrent gate/driver/pytest processes from clobbering each
   other's fresh state mid-run.
"""

from __future__ import annotations

import os
import pathlib
import shutil

_ROOT = pathlib.Path(__file__).resolve().parents[2] / "spark-warehouse" / "scratch"


def scratch_dir(name: str, *, fresh: bool = False, per_process: bool = False) -> str:
    """Return an absolute scratch path for ``name``, creating parents.

    ``fresh`` pre-deletes any prior contents (stateful stores that must
    not see a previous run's batches). ``per_process`` appends the PID so
    concurrent processes get disjoint fresh state; leakage stays bounded
    by the handful of distinct runner PIDs, all inside the gitignored
    warehouse tree.

    Cluster deployments set ``SPARK_GRAFT_SCRATCH`` to a driver-local
    staging directory (or mount shared storage there): every consumer
    hands the returned path to Spark's Hadoop-FS writers, and the stores
    built on it (rollups, ANN indexes, dedup indexes) take fully
    qualified URIs in production — this helper only owns the LOCAL
    fixture/test lifecycle.
    """
    root = pathlib.Path(os.environ.get("SPARK_GRAFT_SCRATCH", _ROOT))
    leaf = f"{name}_{os.getpid()}" if per_process else name
    path = root / leaf
    if per_process:
        _reap_dead_siblings(root, name)
    if fresh and path.exists():
        shutil.rmtree(path)
    path.mkdir(parents=True, exist_ok=True)
    return str(path)


def _reap_dead_siblings(root: pathlib.Path, name: str) -> None:
    """Delete ``{name}_<pid>`` siblings whose PID is no longer alive.

    Without this, every gate/driver/pytest process leaves one dir behind
    (ADVICE r8): per-process dirs are only useful while their owner runs,
    so acquisition-time reaping keeps the population bounded by the LIVE
    runner count. ``kill(pid, 0)`` probes liveness without signalling;
    EPERM means alive-but-foreign (keep). Races are benign — the owner
    of a reaped dir is dead by definition, and two concurrent reapers
    tolerate each other via ``ignore_errors``.
    """
    prefix = f"{name}_"
    if not root.is_dir():
        return
    for sib in root.iterdir():
        if not sib.name.startswith(prefix):
            continue
        suffix = sib.name[len(prefix):]
        if not suffix.isdigit() or int(suffix) == os.getpid():
            continue
        try:
            os.kill(int(suffix), 0)
        except ProcessLookupError:
            shutil.rmtree(sib, ignore_errors=True)
        except PermissionError:
            pass  # alive under another uid
