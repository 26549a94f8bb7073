"""Driver-window rotation helper (round 5+).

The driver verifies only the FIRST 50 registered queries; `defer=True`
sorts a query after the window while the local gate keeps checking its
oracle. The rotation contract (tests/test_registry_contract.py) requires
every oracle query to hit the window at least every 2 rounds, tracked in
WINDOW_LEDGER.json.

Usage:
  python tools/rotate_window.py plan  [round_no]
      Print which queries MUST rotate in next round (absent from the last
      two ledger windows), which are safe to rotate out (2+ recorded green
      windows), and whether the swap fits the 50 slots.
  python tools/rotate_window.py apply <round_no> IN:q1,q2 OUT:q3,q4
      Flip the defer flags in the plans/ sources (textual edit of the
      @register blocks), then regenerate the ledger entry for round_no
      from the live registry. Run the contract tests afterwards.
      Refuses if the IN list omits any contract-mandated query.
  python tools/rotate_window.py apply <round_no> --auto
      Compute the swap (IN = all must-ins; OUT = most-evidenced
      current-window queries) and apply it in one step.

The edit is textual on purpose: defer flags are declarative source, and
the flip must survive review like any other diff.
"""

from __future__ import annotations

import json
import os
import pathlib
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = pathlib.Path(__file__).resolve().parent.parent
PLANS = REPO / "mlops_pipelines_featurestore_gcp_spark" / "plans"
LEDGER = REPO / "WINDOW_LEDGER.json"
WINDOW = 50


def _registry():
    from mlops_pipelines_featurestore_gcp_spark import plans

    return plans


def _find_register_block(src: str, name: str) -> tuple[int, int] | None:
    m = re.search(r'@register\(\s*\n?\s*"' + re.escape(name) + '"', src)
    if not m:
        return None
    depth, j = 0, m.start()
    while True:
        c = src[j]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return m.start(), j + 1
        j += 1


def _split_inline_comment(line: str) -> tuple[str, str]:
    """Split a source line into (code, inline-comment) at the first '#'
    outside a string literal. Good enough for @register argument lines
    (no triple-quoted spans start AND end mid-line here)."""
    quote = None
    i = 0
    while i < len(line):
        c = line[i]
        if quote:
            if c == "\\":
                i += 1
            elif c == quote:
                quote = None
        elif c in "'\"":
            quote = c
        elif c == "#":
            return line[:i].rstrip(), line[i:]
        i += 1
    return line, ""


def set_defer(name: str, defer: bool) -> bool:
    for f in PLANS.glob("*.py"):
        src = f.read_text()
        span = _find_register_block(src, name)
        if span is None:
            continue
        a, b = span
        block = src[a:b]
        has = "defer=True" in block
        if has == defer:
            return False  # already in the requested state
        if defer:
            # Insert after the LAST real argument line, not after whatever
            # precedes ')' — a trailing comment line there would swallow
            # the comma and orphan defer=True (ADVICE r4). An INLINE
            # comment on that line gets the comma placed before it, on
            # the code part (review r5).
            lines = block[:-1].split("\n")
            idx = max(
                i for i, ln in enumerate(lines)
                if ln.strip() and not ln.strip().startswith("#")
            )
            code, comment = _split_inline_comment(lines[idx])
            if not code.rstrip().endswith(","):
                code = code.rstrip() + ","
            lines[idx] = code + (("  " + comment) if comment else "")
            lines.insert(idx + 1, "    defer=True,")
            nb = "\n".join(lines).rstrip() + "\n)"
        else:
            nb = re.sub(r"\n\s*defer=True,?", "", block)
        f.write_text(src[:a] + nb + src[b:])
        return True
    raise KeyError(f"query {name!r} not found in any plans/*.py")


def plan(round_no: int) -> int:
    plans = _registry()
    ledger = json.loads(LEDGER.read_text())
    # Rounds BEFORE round_no (a re-planned round's own entry must not
    # count as history). After round_no's rotation the contract test
    # reads rounds [round_no-1, round_no] — so only the NEWEST prior
    # window keeps a query compliant without entering round_no. Unioning
    # two ledger rounds here (the pre-r7s3 behavior) under-reported
    # must-ins by exactly the set deferred in the newest round.
    rounds = sorted((r for r in ledger if int(r) < round_no), key=int)
    recent = set(ledger[rounds[-1]]) if rounds else set()
    current = set(list(plans.queries_map())[:WINDOW])
    oracle = {n for n, s in plans.QUERIES.items() if s.oracle is not None}
    must_in = sorted(oracle - current - recent)
    green_counts = {n: sum(n in ledger[r] for r in rounds) for n in current}
    safe_out = sorted((n for n in current if green_counts[n] >= 2),
                      key=lambda n: -green_counts[n])
    print(f"round {round_no}: {len(must_in)} must rotate IN next: {must_in}")
    print(f"{len(safe_out)} in-window queries have 2+ recorded windows (well-evidenced OUT candidates):")
    for n in safe_out:
        print(f"  {green_counts[n]}x {n}")
    # Contract feasibility: every query in the newest ledger window may
    # defer one round, so the whole current window is swappable — the
    # 2+-windows list above is evidence-quality guidance, not the bound.
    need = max(0, len(must_in))
    contract_out = sorted(n for n in current if n in recent)
    print(f"swap feasible: need {need} slots, {len(contract_out)} contract-safe OUT "
          f"(in the newest ledger window) -> "
          f"{'OK' if len(contract_out) >= need else 'NOT ENOUGH — merge or extend'}")
    return 0


def compute_must_in(round_no: int) -> tuple[list[str], list[str], dict, set[str], list[str]]:
    """(must_in, current_window, ledger, recent, prior_rounds) for
    ``round_no``: must_in is every oracle query absent from both the
    current window and the NEWEST recorded ledger window. Factored out of
    the auto swap so a MANUAL apply can validate against must_in without
    running (or raising from) the auto OUT-selection (ADVICE r8); the
    recency rule lives HERE and only here — compute_auto_swap consumes
    the returned recent/rounds instead of re-deriving them (review r9:
    two copies of the rule would let a future edge-case fix diverge the
    validation window from the OUT-selection window)."""
    plans = _registry()
    ledger = json.loads(LEDGER.read_text())
    # "recent" = the newest ledger round BEFORE round_no: when round_no's
    # own entry already exists (re-applying after a mid-round registry
    # change), using rounds[-1] would read the window being replaced and
    # demand rotating every deferred query back in.
    rounds = sorted((r for r in ledger if int(r) < round_no), key=int)
    recent = set(ledger[rounds[-1]]) if rounds else set()
    current = list(plans.queries_map())[:WINDOW]
    oracle = {n for n, s in plans.QUERIES.items() if s.oracle is not None}
    must_in = sorted(oracle - set(current) - recent)
    return must_in, current, ledger, recent, rounds


def compute_auto_swap(round_no: int) -> tuple[list[str], list[str]]:
    """The rotation the contract test will demand for ``round_no``:
    IN = every oracle query absent from both the current window and the
    NEWEST recorded ledger window; OUT = enough current-window queries to
    make room, preferring those with the MOST recorded green windows
    (evidence balance — recent additions with one window stay in)."""
    must_in, current, ledger, recent, rounds = compute_must_in(round_no)
    counts = {n: sum(n in ledger[r] for r in rounds) for n in current}
    keep = sorted(current, key=lambda n: (counts[n], n))[: WINDOW - len(must_in)]
    outs = [n for n in current if n not in keep]
    not_contract_safe = [n for n in outs if n not in recent]
    if not_contract_safe:
        raise SystemExit(
            f"auto swap needs to rotate out {not_contract_safe}, which are "
            "NOT in the newest ledger window — merge or extend the registry"
        )
    return must_in, outs


def apply(round_no: int, ins: list[str], outs: list[str]) -> int:
    # Refuse a silent no-op: `apply N` with no IN/OUT used to just
    # rewrite ledger[N] from the unchanged registry, recording a window
    # that fails the 2-round contract while LOOKING like a rotation
    # (round-8 near-miss). Demand explicit lists or --auto. Validation
    # uses compute_must_in, NOT compute_auto_swap — the auto path's
    # OUT-selection can legitimately fail (not_contract_safe) even when
    # the manual lists form a valid rotation (ADVICE r8).
    required = compute_must_in(round_no)[0]
    missing = [n for n in required if n not in ins]
    if missing:
        print(
            f"ERROR: round {round_no} must rotate IN {len(required)} queries "
            f"but the IN list omits {len(missing)}: {missing[:6]}{'…' if len(missing) > 6 else ''}\n"
            "Use `apply <round> --auto` or pass complete IN:/OUT: lists."
        )
        return 1
    for n in ins:
        changed = set_defer(n, False)
        print(f"IN  {n}: {'flipped' if changed else 'already primary'}")
    for n in outs:
        changed = set_defer(n, True)
        print(f"OUT {n}: {'flipped' if changed else 'already deferred'}")
    # re-import fresh to pick up the edited defer flags
    for mod in list(sys.modules):
        if mod.startswith("mlops_pipelines_featurestore_gcp_spark"):
            del sys.modules[mod]
    plans = _registry()
    win = list(plans.queries_map())[:WINDOW]
    n_primary = sum(1 for s in plans.QUERIES.values() if s.oracle is not None and not s.defer)
    if n_primary > WINDOW:
        print(f"ERROR: {n_primary} primary oracle queries > {WINDOW}-slot window")
        return 1
    ledger = json.loads(LEDGER.read_text())
    ledger[str(round_no)] = win
    LEDGER.write_text(json.dumps(ledger, indent=1))
    print(f"ledger[{round_no}] = {len(win)} entries; run "
          "pytest tests/test_registry_contract.py next")
    return 0


def main() -> int:
    if len(sys.argv) < 2 or sys.argv[1] not in ("plan", "apply"):
        print(__doc__)
        return 2
    if sys.argv[1] == "plan":
        ledger = json.loads(LEDGER.read_text())
        rn = int(sys.argv[2]) if len(sys.argv) > 2 else max(int(k) for k in ledger) + 1
        return plan(rn)
    rn = int(sys.argv[2])
    if sys.argv[3:4] == ["--auto"]:
        ins, outs = compute_auto_swap(rn)
        print(f"auto swap: {len(ins)} IN, {len(outs)} OUT")
        return apply(rn, ins, outs)
    ins: list[str] = []
    outs: list[str] = []
    for arg in sys.argv[3:]:
        if arg.startswith("IN:"):
            ins += [x for x in arg[3:].split(",") if x]
        elif arg.startswith("OUT:"):
            outs += [x for x in arg[4:].split(",") if x]
    return apply(rn, ins, outs)


if __name__ == "__main__":
    raise SystemExit(main())
