"""Driver contract for the spark-graft builder (PySpark target).

`queries()` / `oracle_sql()` expose the engine's named plans (see
metadata_wrangler_spark.plans) — one entry per implemented operator
family from SURVEY.md §2, each paired (where SQL-expressible) with a
DuckDB oracle. `entry()` runs the flagship query at sf0.001.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from metadata_wrangler_spark import plans


def _plans() -> tuple[dict, dict]:
    plans.load_all_plans()
    # VERIFICATION_PRIORITY ordering: one representative of every
    # SURVEY.md §2 family sits inside the driver's leading
    # correctness window (see plans/__init__.py).
    queries = plans.ordered_queries()
    oracles = {n: plans.ORACLES[n] for n in queries if n in plans.ORACLES}
    return queries, oracles


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the coverage-provider
    pipeline end to end — queue anti-join → TTL'd cached fetch →
    XML parse → policy-guarded metadata merge (SURVEY.md §3.3 as one
    DAG)."""
    queries, _ = _plans()
    return queries["pipe_provider_end_to_end"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    q, _ = _plans()
    return dict(q)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each hash-checkable query.
    Keys missing here (vs `queries()`) are approximate/streaming ops
    that get the driver's weaker rows-only check."""
    _, o = _plans()
    return dict(o)
