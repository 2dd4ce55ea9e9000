"""Streaming materialized-view maintenance: the AvailableNow /
foreachBatch driver for operators.matview.

Each micro-batch hands its slice to ``MaterializedDailyRollup.
refresh`` — the additive merge — so the view stays current as files
land, with the checkpoint guaranteeing each file is consumed once
and the view's own microsecond watermark making a replayed batch a
no-op (defense in depth: either mechanism alone keeps the merge
exactly-once).

Reference: the cron-driven stale-flag recompute this replaces
(`/root/reference/coverage_provider.py:132-134`); the streaming
shape is the same one queue_drain uses for the work queue.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from metadata_wrangler_spark.operators.matview import MaterializedDailyRollup
from metadata_wrangler_spark.streaming.incremental import read_events_stream


def run_view_maintenance_stream(
    spark: SparkSession,
    source_dir: str,
    view_path: str,
    checkpoint_dir: str,
    query_name: str = "view_maintenance",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """One AvailableNow pass: every micro-batch of new event files is
    merged into the rollup at ``view_path`` (which must be
    bootstrapped with ``MaterializedDailyRollup.init`` first — an
    empty init is fine). Returns the refreshed view."""
    mv = MaterializedDailyRollup(spark, view_path)
    events = read_events_stream(
        spark, source_dir,
        **({"maxFilesPerTrigger": str(max_files_per_trigger)}
           if max_files_per_trigger else {}),
    )

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        mv.refresh(batch_df)

    q = (
        events.writeStream.foreachBatch(handle)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return mv.read()
