"""Registry wiring query callables to their DuckDB oracle SQL.

The driver contract (``__spark_entry__.py``) needs two dicts:
``queries()[name](spark, sf_dir) -> DataFrame`` and ``oracle_sql()[name]`` —
this module is the single source of truth both are generated from.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""
    # defer=True: keep the oracle (the local differential gate still checks
    # it) but sort after the driver's 50-entry verification window — for
    # queries whose operator coverage is subsumed by another checked query.
    defer: bool = False


QUERIES: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    defer: bool = False,
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a query to the inventory.

    ``oracle`` is DuckDB-runnable ANSI SQL over the pre-registered views
    (region nation customer supplier part orders lineitem events documents
    embeddings). Column aliases MUST match the Spark result exactly.
    """

    def _wrap(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, tags=tags, doc=fn.__doc__ or "", defer=defer
        )
        return fn

    return _wrap


def queries_map() -> dict[str, QueryFn]:
    """Registration-ordered query dict, checked oracle queries FIRST.

    The driver verifies only the first 50 entries of this dict; rows-only
    (oracle=None) and deferred queries would burn verified slots without
    adding signal, so they sort to the end (stable within each group):
    primary oracle queries, then deferred-oracle, then rows-only.
    """
    specs = sorted(QUERIES.values(), key=lambda s: (s.oracle is None, s.defer))
    return {s.name: s.fn for s in specs}


def oracle_sql_map() -> dict[str, str]:
    return {name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None}
