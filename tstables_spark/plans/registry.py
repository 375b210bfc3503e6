"""Registry mapping query name -> (Spark callable, DuckDB oracle SQL).

The driver contract (``__spark_entry__.py``): each query is a callable
``(spark, sf_dir) -> DataFrame``; the oracle is ANSI SQL DuckDB runs on
the same parquet. Column names are aliased identically on both sides
(the driver sorts columns by name before hashing values). Double-typed
aggregates are rounded on BOTH sides wherever floating-point summation
order could differ between engines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query; ``oracle=None`` => driver does a rows-only check
    (reserved for genuinely non-SQL-expressible ops per the contract)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
