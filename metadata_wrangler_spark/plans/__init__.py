"""Named query plans — the engine's public query surface.

Every operator family from SURVEY.md §2.11 is exposed as a named
query: a callable ``(spark, sf_dir) -> DataFrame`` registered in
``QUERIES``, paired (where SQL-expressible) with an ANSI-SQL oracle
string in ``ORACLES`` that DuckDB runs on the same parquet tables.

Numeric-stability convention: any aggregate over DOUBLE columns goes
through an exact DECIMAL(18,4) accumulation and is cast back to
DOUBLE, so Spark and the oracle produce bit-identical values
regardless of floating-point summation order (which differs between
engines and, at scale, between partitionings of the same data).
Non-aggregated doubles pass through untouched — they are the same
bits in both engines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator registering a plan under ``name`` with an optional
    DuckDB oracle. Plans without an oracle get a rows-only check."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all_plans() -> None:
    """Import every plan module so registration side effects run."""
    from metadata_wrangler_spark.plans import (  # noqa: F401
        documents,
        dml,
        events,
        functions,
        graph,
        pipeline,
        relational,
        sources,
        vectors,
    )
