"""Driver-contract guards for the query registry.

The driver verifies only the FIRST 50 entries of ``queries()``; every
oracle-bearing query must land inside that window (CORRECTNESS_r01 lost 14
oracle rows to registration order). These tests fail the build before the
driver can silently skip a query again.
"""

from mlops_pipelines_featurestore_gcp_spark import plans

DRIVER_WINDOW = 50


def test_oracle_queries_fit_driver_window():
    n_oracle = sum(1 for s in plans.QUERIES.values() if s.oracle is not None)
    assert n_oracle <= DRIVER_WINDOW, (
        f"{n_oracle} oracle-bearing queries registered but the driver checks only "
        f"the first {DRIVER_WINDOW} — consolidate queries (see plans/relational.py merges)"
    )


def test_rows_only_queries_register_last():
    names = list(plans.queries_map())
    oracles = plans.oracle_sql_map()
    seen_rows_only = False
    for name in names:
        if name not in oracles:
            seen_rows_only = True
        else:
            assert not seen_rows_only, f"oracle query {name!r} registered after a rows-only query"


def test_every_oracle_query_in_window():
    names = list(plans.queries_map())[:DRIVER_WINDOW]
    missing = set(plans.oracle_sql_map()) - set(names)
    assert not missing, f"oracle queries outside the driver's {DRIVER_WINDOW}-entry window: {missing}"
