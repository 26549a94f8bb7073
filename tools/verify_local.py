"""Local stand-in for the driver's correctness gate.

Runs every registered query on Spark and its oracle on DuckDB at the given
scale factor, then compares row count, column names, and order-insensitive
values (exact string compare after canonicalization — stricter than any
reasonable hash, so passing here should pass the driver).

Usage: python tools/verify_local.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from mlops_pipelines_featurestore_gcp_spark import get_spark, plans
from mlops_pipelines_featurestore_gcp_spark.sources.catalog import TABLE_NAMES


def canon(v) -> str:
    """Canonical string form of a cell value for cross-engine compare."""
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
        return "[" + ",".join(canon(x) for x in v) + "]"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


def rows_to_multiset(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for r in rows:
        vals = list(r)
        out.append(tuple(canon(vals[i]) for i in order))
    out.sort()
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    spark = get_spark("verify-local")
    failures, passed, rows_only = [], [], []
    for name, spec in plans.QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = spec.fn(spark, sf_dir)
            srows = sdf.collect()
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
            print(f"  {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            ores = con.execute(spec.oracle)
            ocols = [d[0] for d in ores.description]
            orows = ores.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"ORACLE ERROR: {e}"))
            print(f"  {name}: ORACLE ERROR {str(e)[:300]}")
            continue
        problems = []
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols spark={sorted(scols)} oracle={sorted(ocols)}")
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if not problems:
            sm = rows_to_multiset([[r[c] for c in scols] for r in srows], scols)
            om = rows_to_multiset(orows, ocols)
            if sm != om:
                diff = [(a, b) for a, b in zip(sm, om) if a != b][:3]
                problems.append(f"values differ, first diffs: {diff}")
        if problems:
            failures.append((name, "; ".join(problems)))
            print(f"  {name}: FAIL {('; '.join(problems))[:500]}")
        else:
            passed.append(name)
            print(f"  {name}: OK ({len(srows)} rows, {time.time()-t0:.1f}s)")

    print(f"\n{len(passed)} passed, {len(failures)} failed, {len(rows_only)} rows-only")
    for name, msg in failures:
        print(f"FAIL {name}: {msg[:400]}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
