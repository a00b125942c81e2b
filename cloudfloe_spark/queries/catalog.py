"""Registry infrastructure for the query catalog.

Each catalog entry pairs a PySpark DataFrame program with an equivalent
ANSI/DuckDB SQL oracle over the same parquet fixture tables. The driver (and
our own tests) run both and compare row count + schema + order-insensitive
value hash. This is strictly stronger than the reference's mocked unit tests
(reference backend/tests/ — SURVEY.md §5).

Parity rules every entry follows (FIXTURES.md §4):
- alias every computed column identically on both sides;
- cast integer SUMs to BIGINT in the oracle (DuckDB sums to HUGEINT);
- round double aggregates on both sides to absorb float summation order;
- no bare LIMIT without a deterministic ORDER BY.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class CatalogQuery:
    name: str
    fn: SparkQuery
    oracle: str | None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, CatalogQuery] = {}
# Immutable registration order — reorder() permutes _REGISTRY but never this,
# so priority computations stay deterministic (and idempotent) after reorders.
_REGISTRATION_ORDER: list[str] = []


def register(
    name: str, oracle: str | None = None, tags: tuple[str, ...] = ()
) -> Callable[[SparkQuery], SparkQuery]:
    """Decorator: add a (spark_fn, oracle_sql) pair to the catalog."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in _REGISTRY:
            raise ValueError(f"duplicate catalog query name {name!r}")
        _REGISTRY[name] = CatalogQuery(
            name=name, fn=fn, oracle=oracle, doc=(fn.__doc__ or "").strip(), tags=tags
        )
        _REGISTRATION_ORDER.append(name)
        return fn

    return deco


def all_queries() -> dict[str, CatalogQuery]:
    return dict(_REGISTRY)


def registration_order() -> list[str]:
    """Catalog names in original registration order, unaffected by reorder()."""
    return list(_REGISTRATION_ORDER)


def reorder(first: list[str]) -> None:
    """Rebuild registry ordering: ``first`` names lead (in the given order),
    everything else follows in original registration order.

    The driver's correctness gate samples queries() in dict order, so ordering
    controls which operators get a hard driver CORRECTNESS row each round.
    """
    missing = [n for n in first if n not in _REGISTRY]
    if missing:
        raise KeyError(f"reorder: unknown catalog names {missing}")
    lead = {n: _REGISTRY[n] for n in first}
    rest = {n: q for n, q in _REGISTRY.items() if n not in lead}
    _REGISTRY.clear()
    _REGISTRY.update(lead)
    _REGISTRY.update(rest)


def query_map() -> dict[str, SparkQuery]:
    """The driver-contract ``queries()`` dict."""
    return {name: q.fn for name, q in _REGISTRY.items()}


def oracle_map() -> dict[str, str]:
    """The driver-contract ``oracle_sql()`` dict (only SQL-expressible ops)."""
    return {name: q.oracle for name, q in _REGISTRY.items() if q.oracle is not None}
