"""Query registry: the single source of truth for the t2 contract.

Each operator from SURVEY.md §2 Tier B registers itself here with

- a name (the ``queries()`` key the driver grades),
- a callable ``(spark, sf_dir) -> DataFrame`` (the engine side),
- optionally a DuckDB-SQL oracle string (the reference side); queries
  without an oracle get the driver's weaker rows-only check.

Determinism rules (SURVEY.md §2) are enforced by convention in every
registered query: float aggregates rounded to 4 decimals on both
sides, unique tiebreak keys in every window/top-k ``ORDER BY``,
identical column aliases, ``events.ts`` truncated before returning.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str


QUERIES: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a declared query (and its DuckDB oracle)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


def get_queries() -> dict[str, QueryFn]:
    import frafka_spark

    frafka_spark.load_all()
    return {name: spec.fn for name, spec in QUERIES.items()}


def get_oracle_sql() -> dict[str, str]:
    import frafka_spark

    frafka_spark.load_all()
    return {
        name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None
    }
