"""Local stand-in for the driver's correctness gate.

Runs every registered query on Spark and its oracle on DuckDB at the given
scale factor, then compares row count, column names, pandas DTYPES, and
order-insensitive values. Both sides are materialized THROUGH PANDAS the
way the driver does it, so pandas' own widenings are visible: DuckDB types
a bare ``SUM(BIGINT)`` as HUGEINT, which pandas materializes as float64
while Spark returns int64 — identical values, different driver hash. The
round-4 local gate fetched Python objects (``fetchall`` gives true ints
for HUGEINT) and canonicalized through ``str`` with an int shortcut, so it
was structurally blind to exactly that divergence; this version fails on
it (dtype-kind mismatch AND value-string mismatch, since floats keep their
``.0``).

Usage: python tools/verify_local.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

from mlops_pipelines_featurestore_gcp_spark import get_spark, plans
from mlops_pipelines_featurestore_gcp_spark.sources.catalog import TABLE_NAMES


def canon(v) -> str:
    """Canonical string form of a cell value, dtype-faithful.

    Unlike the round-4 canonicalizer there is NO integral-float shortcut:
    float64 574445863480.0 and int64 574445863480 produce DIFFERENT
    strings, mirroring how the driver's value-hash sees them.
    """
    if v is None:
        return "NULL"
    if isinstance(v, (float, np.floating)):
        if math.isnan(v):
            return "NaN"
        return repr(float(v))
    if isinstance(v, (bool, np.bool_)):
        return str(int(v))
    if isinstance(v, np.integer):
        return str(int(v))
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if v is pd.NaT:
        return "NULL"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


def dtype_kind(dt) -> str:
    """Collapse a pandas dtype to the kind the driver's hash is sensitive
    to: i(nt) u(int) f(loat) b(ool) M(datetime) m(timedelta) O(bject)."""
    try:
        return np.dtype(dt).kind
    except TypeError:  # pandas extension dtypes (Int64, boolean, ...)
        k = getattr(dt, "kind", None)
        return k if k else "O"


def frame_to_multiset(pdf: pd.DataFrame):
    pdf = pdf[sorted(pdf.columns)]
    out = []
    for row in pdf.itertuples(index=False, name=None):
        out.append(tuple(canon(v) for v in row))
    out.sort()
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    con = duckdb.connect()
    for t in TABLE_NAMES:
        # single-file fixtures and Spark-written directories both work
        # (the scale sweep's synthetic sf1 is a directory per table)
        p = f"{sf_dir}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")

    spark = get_spark("verify-local")
    failures, passed, rows_only = [], [], []
    for name, spec in plans.QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = spec.fn(spark, sf_dir)
            spdf = sdf.toPandas()
            scols = sdf.columns
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"  {name}: SPARK ERROR {str(e)[:300]}")
            continue
        # The DRIVER's canonicalizer (pandas sort_values over all columns)
        # crashes on list/dict cells — reject nested output types up front
        # even though this script's own canon() could compare them.
        nested = [
            f.name
            for f in sdf.schema.fields
            if f.dataType.typeName() in ("array", "map", "struct")
        ]
        if nested:
            failures.append((name, f"DRIVER-UNSAFE nested output columns: {nested}"))
            print(f"  {name}: DRIVER-UNSAFE nested output columns {nested}")
            continue
        if spec.oracle is None:
            rows_only.append(name)
            print(f"  {name}: rows-only ({len(spdf)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            opdf = con.execute(spec.oracle).df()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"ORACLE ERROR: {e}"))
            print(f"  {name}: ORACLE ERROR {str(e)[:300]}")
            continue
        ocols = list(opdf.columns)
        problems = []
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols spark={sorted(scols)} oracle={sorted(ocols)}")
        if len(spdf) != len(opdf):
            problems.append(f"rowcount spark={len(spdf)} oracle={len(opdf)}")
        if not problems:
            # Dtype-kind check FIRST: this is the driver's failure mode the
            # round-4 gate could not see (HUGEINT -> float64 vs int64).
            for c in sorted(scols):
                sk, ok = dtype_kind(spdf[c].dtype), dtype_kind(opdf[c].dtype)
                if sk != ok:
                    problems.append(
                        f"dtype kind mismatch on {c!r}: spark "
                        f"{spdf[c].dtype}({sk}) vs oracle {opdf[c].dtype}({ok})"
                    )
        if not problems:
            sm = frame_to_multiset(spdf)
            om = frame_to_multiset(opdf)
            if sm != om:
                diff = [(a, b) for a, b in zip(sm, om) if a != b][:3]
                problems.append(f"values differ, first diffs: {diff}")
        if problems:
            failures.append((name, "; ".join(problems)))
            print(f"  {name}: FAIL {('; '.join(problems))[:500]}")
        else:
            passed.append(name)
            print(f"  {name}: OK ({len(spdf)} rows, {time.time()-t0:.1f}s)")

    print(f"\n{len(passed)} passed, {len(failures)} failed, {len(rows_only)} rows-only")
    for name, msg in failures:
        print(f"FAIL {name}: {msg[:400]}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
