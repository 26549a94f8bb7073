"""Driver-contract guards for the query registry.

The driver verifies only the FIRST 50 entries of ``queries()``; every
oracle-bearing query must land inside that window (CORRECTNESS_r01 lost 14
oracle rows to registration order). These tests fail the build before the
driver can silently skip a query again.
"""

from mlops_pipelines_featurestore_gcp_spark import plans

DRIVER_WINDOW = 50


def test_oracle_queries_fit_driver_window():
    n_oracle = sum(1 for s in plans.QUERIES.values() if s.oracle is not None and not s.defer)
    assert n_oracle <= DRIVER_WINDOW, (
        f"{n_oracle} primary (non-deferred) oracle queries registered but the driver "
        f"checks only the first {DRIVER_WINDOW} — consolidate or defer queries"
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
    primary = {n for n, s in plans.QUERIES.items() if s.oracle is not None and not s.defer}
    missing = primary - set(names)
    assert not missing, f"oracle queries outside the driver's {DRIVER_WINDOW}-entry window: {missing}"


def test_deferred_queries_keep_their_oracle():
    # defer moves a query out of the driver window but NOT out of the local
    # differential gate — a deferred query without an oracle is a mistake
    # (that's what oracle=None is for).
    for name, spec in plans.QUERIES.items():
        if spec.defer:
            assert spec.oracle is not None, f"{name} is deferred but has no oracle"
