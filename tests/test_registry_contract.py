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


def _load_ledger():
    import json
    from pathlib import Path

    path = Path(__file__).resolve().parent.parent / "WINDOW_LEDGER.json"
    return json.loads(path.read_text())


def test_ledger_current_round_matches_registry():
    """WINDOW_LEDGER.json's newest entry must equal the live window.

    The ledger is the rotation audit trail (which queries each round's driver
    run verified); if the registry's window drifts from the recorded entry the
    ledger must be regenerated before commit.
    """
    ledger = _load_ledger()
    newest = ledger[max(ledger, key=int)]
    live = list(plans.queries_map())[:DRIVER_WINDOW]
    assert newest == live, (
        "WINDOW_LEDGER.json is stale — regenerate its newest entry from "
        "list(queries())[:50] after changing defer flags"
    )


def test_no_oracle_query_deferred_forever():
    """Every oracle-bearing query must hit the driver window within 2 rounds.

    VERDICT r3 #9: deferral must not silently become permanent. A query is
    compliant if it is in the CURRENT window or appeared in either of the two
    most recent ledger entries.
    """
    ledger = _load_ledger()
    rounds = sorted(ledger, key=int)
    recent = set()
    for r in rounds[-2:]:
        recent.update(ledger[r])
    current = set(list(plans.queries_map())[:DRIVER_WINDOW])
    stale = []
    for name, spec in plans.QUERIES.items():
        if spec.oracle is None:
            continue
        if name not in current and name not in recent:
            stale.append(name)
    assert not stale, (
        f"oracle queries absent from the driver window for 2+ rounds: {stale} — "
        "rotate them in (flip defer flags) and regenerate WINDOW_LEDGER.json"
    )


def test_registry_fits_rotation_capacity():
    """Q oracle queries under a W-slot window and the 2-round staleness
    rule are satisfiable only while Q ≤ 2W: each round must rotate the
    Q−W deferred half back in, so past 2W some query necessarily misses
    two consecutive windows no matter how defer flags are set (VERDICT r6
    #7 — round 6 discovered this cap the hard way at Q=91). This test
    rejects the REGISTRATION that breaks the bound, instead of the
    after-the-fact staleness check catching it a round later."""
    q = sum(1 for s in plans.QUERIES.values() if s.oracle is not None)
    cap = 2 * DRIVER_WINDOW
    assert q <= cap, (
        f"{q} oracle queries > rotation capacity {cap} (window {DRIVER_WINDOW}, "
        "2-round staleness rule): the ledger contract is now UNSATISFIABLE — "
        "consolidate queries (merge related demos, ride assertions as extra "
        "columns) before registering more"
    )
    # advisory headroom in the failure message of the capacity math:
    # per-round free slots for NEW queries = 2W − Q. CLAUDE.md's policy
    # floor (≥10 free) is enforced socially, not here — this test only
    # rejects true unsatisfiability.


def test_rotation_tool_planner_is_consistent_with_contract():
    """tools/rotate_window.py `plan` must agree with the contract tests:
    with the current ledger, no oracle query may already be overdue."""
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "rotate_window", Path(__file__).resolve().parent.parent / "tools" / "rotate_window.py"
    )
    rw = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(rw)
    ledger = _load_ledger()
    rounds = sorted(ledger, key=int)
    recent = set()
    for r in rounds[-2:]:
        recent.update(ledger[r])
    current = set(list(plans.queries_map())[:DRIVER_WINDOW])
    oracle = {n for n, s in plans.QUERIES.items() if s.oracle is not None}
    assert oracle - current - recent == set()  # nothing overdue right now
    # the textual block finder locates every registered query exactly once
    found = 0
    for f in (Path(__file__).resolve().parent.parent / "mlops_pipelines_featurestore_gcp_spark" / "plans").glob("*.py"):
        src = f.read_text()
        for name in plans.QUERIES:
            if rw._find_register_block(src, name) is not None:
                found += 1
    assert found == len(plans.QUERIES), "every query's @register block must be findable"
