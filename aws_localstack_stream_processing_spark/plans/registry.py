"""Named query registry — the engine's public query surface.

Every operator from SURVEY.md §2 (plus the LLM-pipeline extensions) is
registered here as a named query: a Spark builder ``(spark, sf_dir) ->
DataFrame`` and, where SQL-expressible, an equivalent DuckDB oracle SQL
string. The verification driver hash-compares the two at sf=0.01.

Determinism contract (both engines must agree bit-for-bit):
- double aggregates go through DECIMAL addends (order-independent sums);
- timestamps are emitted as formatted strings;
- every LIMIT is preceded by a total ORDER BY;
- hash/fold expressions come from :mod:`..functions` with per-dialect
  fragments verified equivalent.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QueryDef:
    name: str
    fn: QueryFn
    oracle: str | None = None
    tags: tuple[str, ...] = field(default=())


QUERIES: dict[str, QueryDef] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Register a named query. ``oracle=None`` → the driver records a weaker
    rows-only check (reserved for genuinely non-SQL-expressible operators)."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = QueryDef(name=name, fn=fn, oracle=oracle, tags=tags)
        return fn

    return deco


def all_queries() -> dict[str, QueryDef]:
    """Import every query module and return the populated registry."""
    from . import (  # noqa: F401
        llm_ops,
        reference_ops,
        scale_ops,
        sql_surface,
        streaming_surface,
        timeseries,
        tpch,
    )

    return QUERIES
