"""Dump .explain('formatted') for named queries to plans/<round>/<q>_<tag>.txt.

Usage: python tools/dump_plans.py <round>/<tag> [sf_dir] query [query ...]
e.g. ``python tools/dump_plans.py r14/before q01_pricing_summary`` writes
``plans/r14/q01_pricing_summary_before.txt``. A bare ``<tag>`` (no slash)
keeps the legacy behavior of writing into plans/r13 (ADVICE r13: the
hardcoded directory would have silently filed r14 dumps under r13).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mlops_pipelines_featurestore_gcp_spark import get_spark, plans  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    rnd, _, tag = tag.rpartition("/") if "/" in tag else ("r13", "", tag)
    rest = sys.argv[2:]
    sf_dir = rest[0] if rest and os.path.isdir(rest[0]) else "/root/testdata/sf0.1"
    names = [a for a in rest if not os.path.isdir(a)]
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", rnd)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump_plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = plans.QUERIES[name].fn(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(buf.getvalue())
        print(f"# wrote {name}_{tag}.txt", file=sys.stderr)


if __name__ == "__main__":
    main()
