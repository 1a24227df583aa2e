"""Query registry mechanism (see api.py for the assembled surface).

``QUERIES[name] = QuerySpec(fn, oracle)`` where ``fn(spark, sf_dir) ->
DataFrame`` and ``oracle`` is equivalent ANSI SQL for the DuckDB oracle
(None → the driver records a weaker rows-only check).

Oracle-hash compatibility conventions:
- every computed column aliased identically in Spark and SQL;
- aggregate doubles rounded (2-4 dp) on both sides so sum-order FP
  drift cannot flip the value hash;
- timestamps emitted as formatted strings;
- integer sums cast to bigint on both sides (DuckDB promotes to
  HUGEINT).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check


QUERIES: dict[str, QuerySpec] = {}

# Benchmark set: representative, scale-sensitive queries (bench.py)
HEADLINE_QUERIES: list[str] = []


def register(name: str, oracle: str | None = None, headline: bool = False):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = QuerySpec(fn, oracle)
        if headline:
            HEADLINE_QUERIES.append(name)
        return fn

    return deco
