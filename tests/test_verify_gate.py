"""The local gate must see what the driver's value-hash sees.

Round 4 shipped three driver-red rows (t08/t11/ml05) that the local gate
called green: DuckDB types a bare ``SUM(BIGINT)`` as HUGEINT, pandas
materializes HUGEINT as float64, and the driver hashes 574445863480.0 !=
574445863480 while the old gate's ``fetchall`` + int-shortcut ``canon``
collapsed both to the same string. These tests pin the hardened gate's
behavior so that divergence class can never pass locally again.
"""

import importlib.util
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd
import pytest

REPO = Path(__file__).resolve().parent.parent


def _load(tool: str):
    spec = importlib.util.spec_from_file_location(tool, REPO / "tools" / f"{tool}.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def vl():
    return _load("verify_local")


def test_duckdb_hugeint_materializes_as_float64(vl):
    """The failure-mode precondition: an uncasted SUM(BIGINT) really does
    come out of duckdb's .df() as float64 (if a duckdb upgrade changes
    this, the CAST guidance in the oracles is obsolete — revisit)."""
    con = duckdb.connect()
    pdf = con.execute("SELECT SUM(x) AS s FROM (SELECT CAST(574445863480 AS BIGINT) AS x)").df()
    assert vl.dtype_kind(pdf["s"].dtype) == "f"
    cast = con.execute(
        "SELECT CAST(SUM(x) AS BIGINT) AS s FROM (SELECT CAST(574445863480 AS BIGINT) AS x)"
    ).df()
    assert vl.dtype_kind(cast["s"].dtype) == "i"


def test_dtype_kind_mismatch_detected(vl):
    spark_side = pd.DataFrame({"s": np.array([574445863480], dtype="int64")})
    oracle_side = pd.DataFrame({"s": np.array([574445863480.0], dtype="float64")})
    assert vl.dtype_kind(spark_side["s"].dtype) != vl.dtype_kind(oracle_side["s"].dtype)


def test_canon_has_no_integral_float_shortcut(vl):
    """float 574445863480.0 and int 574445863480 must canonicalize to
    DIFFERENT strings — the r4 canon() collapsed them, masking the
    driver's hash mismatch."""
    assert vl.canon(574445863480.0) != vl.canon(574445863480)
    assert vl.canon(np.float64(7.0)) != vl.canon(np.int64(7))
    # but equal values of the same type still match across numpy/python
    assert vl.canon(np.int64(7)) == vl.canon(7)
    assert vl.canon(np.float64(7.5)) == vl.canon(7.5)


def test_frame_multiset_catches_value_divergence(vl):
    a = pd.DataFrame({"k": [1, 2], "v": [10.0, 20.0]})
    b = pd.DataFrame({"k": [2, 1], "v": [20.0, 10.0]})  # same multiset, reordered
    assert vl.frame_to_multiset(a) == vl.frame_to_multiset(b)
    c = pd.DataFrame({"k": [1, 2], "v": [10.0, 20.5]})
    assert vl.frame_to_multiset(a) != vl.frame_to_multiset(c)


def test_rotation_set_defer_survives_trailing_comment(vl, tmp_path, monkeypatch):
    """set_defer on a @register block whose last line before ')' is a
    comment must still produce valid Python with defer=True as a real
    argument (ADVICE r4: the old edit appended after the comment,
    swallowing the comma)."""
    rw = _load("rotate_window")
    src = (
        "from mlops_pipelines_featurestore_gcp_spark.plans.registry import register\n"
        "\n"
        "@register(\n"
        '    "zz_fake_query",\n'
        '    oracle="SELECT 1 AS one",\n'
        '    tags=("fake",)\n'
        "    # trailing comment before the close paren\n"
        ")\n"
        "def zz_fake_query(spark, sf_dir):\n"
        "    return None\n"
    )
    f = tmp_path / "fake_plans.py"
    f.write_text(src)
    monkeypatch.setattr(rw, "PLANS", tmp_path)
    assert rw.set_defer("zz_fake_query", True) is True
    edited = f.read_text()
    compile(edited, str(f), "exec")  # must still be valid Python
    assert "defer=True" in edited
    # defer must precede the trailing comment, attached to the real args
    assert edited.index("defer=True") < edited.index("# trailing comment")


def test_rotation_set_defer_survives_inline_comment(tmp_path, monkeypatch):
    """An INLINE comment on the last argument line must get the comma on
    the code part, before the comment (review r5: the r4 fix only
    handled full-line comments)."""
    rw = _load("rotate_window")
    src = (
        "from mlops_pipelines_featurestore_gcp_spark.plans.registry import register\n"
        "\n"
        "@register(\n"
        '    "zz_fake_inline",\n'
        '    oracle="SELECT 1 AS one",\n'
        '    tags=("fake",)  # inline note with a "#quoted" hash\n'
        ")\n"
        "def zz_fake_inline(spark, sf_dir):\n"
        "    return None\n"
    )
    f = tmp_path / "fake_plans.py"
    f.write_text(src)
    monkeypatch.setattr(rw, "PLANS", tmp_path)
    assert rw.set_defer("zz_fake_inline", True) is True
    edited = f.read_text()
    compile(edited, str(f), "exec")
    assert "defer=True" in edited
    assert 'tags=("fake",),' in edited  # comma landed on the code, not the comment


def test_quality_sql_fragments_stay_in_sync():
    """The composite quality score is replayed in three oracle fragments
    (_QUALITY_SQL for d08, and inline copies in t01 / s04+c01). If an
    edit ever drifts one, per-doc quality values diverge — compare them
    directly in DuckDB on the small fixture."""
    import sys
    sys.path.insert(0, str(REPO))
    from mlops_pipelines_featurestore_gcp_spark import plans

    con = duckdb.connect()
    for t in ("documents",):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '/root/testdata/sf0.001/{t}.parquet'"
        )
    d08 = con.execute(plans.QUERIES["d08_keep_best_exact"].oracle).df()
    t01 = con.execute(plans.QUERIES["t01_text_profile"].oracle).df()
    s04 = con.execute(plans.QUERIES["s04_training_mix"].oracle).df()
    merged = d08.merge(t01[["doc_id", "quality"]], on="doc_id", suffixes=("_d08", "_t01"))
    assert len(merged) > 0
    assert (merged["quality_d08"] == merged["quality_t01"]).all()
    m2 = s04.merge(t01[["doc_id", "quality"]], on="doc_id", suffixes=("_s04", "_t01"))
    assert len(m2) > 0
    assert (m2["quality_s04"] == m2["quality_t01"]).all()
