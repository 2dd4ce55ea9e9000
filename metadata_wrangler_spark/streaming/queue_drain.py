"""foreachBatch queue drain — the CoverageRecord-provider twin.

Reference: the cron entries draining `registered` records
(`/root/reference/docker/services/simplified_crontab:13-27`,
`items_that_need_coverage` `/root/reference/overdrive.py:92-107`,
register/succeed/fail `/root/reference/coverage_provider.py:328-354`).

Design: a stream of incoming work items; every micro-batch runs the
SAME set-oriented queue transitions as the batch path
(operators.queue) against a ParquetStateTable — register the new
items, process the eligible set, apply outcomes, commit. State
consistency comes from the table, exactness from the checkpointed
source offsets.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from metadata_wrangler_spark.operators import queue
from metadata_wrangler_spark.operators.merge import ParquetStateTable

ITEMS_SCHEMA = "identifier_id BIGINT"


def default_processor(todo: DataFrame) -> DataFrame:
    """Deterministic stand-in provider: succeed on even identifiers,
    transient-fail odd ones (a real provider fetches/parses here).
    Returns the outcomes frame apply_outcomes expects."""
    return todo.select(
        *queue.KEY,
        F.when(F.col("identifier_id") % 2 == 0, queue.SUCCESS)
        .otherwise(queue.TRANSIENT).alias("new_status"),
        F.when(F.col("identifier_id") % 2 == 0, F.lit(None))
        .otherwise(F.lit("transient: remote boom"))
        .cast("string").alias("new_exception"),
    )


def _transition(
    records: DataFrame,
    items: DataFrame,
    data_source: str,
    operation: str,
    now: str,
    processor: Callable[[DataFrame], DataFrame],
    backoff_seconds: int,
) -> DataFrame:
    """register → claim eligible → process → post-state (pure)."""
    registered = queue.register(
        records, items, data_source, operation, ts=now
    )
    todo = queue.eligible(registered, now, backoff_seconds)
    outcomes = processor(todo)
    return queue.apply_outcomes(registered, outcomes)


def drain_batch(
    table,
    items: DataFrame,
    data_source: str,
    operation: str,
    now: str,
    processor: Callable[[DataFrame], DataFrame] = default_processor,
    backoff_seconds: int = 0,
) -> None:
    """One drain step (shared by the streaming foreachBatch and any
    batch cron). ``table`` is either a ParquetStateTable (read +
    overwrite commit — single-writer crons) or a
    VersionedParquetTable (the transition runs inside an optimistic
    merge, so a drain racing a registrar serializes instead of
    losing updates)."""
    def fn(records: DataFrame) -> DataFrame:
        return _transition(records, items, data_source, operation,
                           now, processor, backoff_seconds)

    if hasattr(table, "merge"):
        table.merge(fn)
    else:
        table.commit(fn(table.read()))


def run_drain_stream(
    spark: SparkSession,
    items_dir: str,
    table: ParquetStateTable,
    checkpoint_dir: str,
    data_source: str = "oclc",
    operation: str = "classify",
    now: str = "2024-01-15 00:00:00",
    processor: Callable[[DataFrame], DataFrame] = default_processor,
) -> None:
    """AvailableNow drain of the items stream through foreachBatch."""
    items = spark.readStream.schema(ITEMS_SCHEMA).parquet(items_dir)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        drain_batch(table, batch_df, data_source, operation, now,
                    processor)

    q = (
        items.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
