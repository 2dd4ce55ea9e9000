"""Streaming CDC apply — the change-feed-to-snapshot sink.

The batch operator (`plans/dml.py::d_cdc_apply`) compacts a complete
change feed in one ``max_by`` aggregate. This module is its
STREAMING twin: micro-batches of changes arrive out of order across
batches, and the state table converges to the same latest-wins
snapshot the batch operator computes over the union of all batches —
because the merge is an associative, commutative fold (per key, keep
the champion by version; sum the change counts), batch boundaries
cannot change the result.

Tombstones are RETAINED in state (key, last op = 'D') rather than
deleted: a later micro-batch carrying an OLDER change for the key
must lose to the tombstone, which only works if the tombstone's
version stays around to compare against. The serving view filters
them out.

Reference: the reference replays per-identifier coverage transitions
into current state (`coverage_provider.py:82-118`); crons re-run it
incrementally (`docker/services/simplified_crontab:13-27`). This is
that replay as an idempotent streaming sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from metadata_wrangler_spark.operators.merge import (
    ParquetStateTable,
    VersionedParquetTable,
)

CHANGES_SCHEMA = "key BIGINT, version BIGINT, op STRING, qv BIGINT"


def compact(changes: DataFrame) -> DataFrame:
    """Latest-wins compaction of a change set: one hash aggregate,
    ``max_by`` keyed on the (unique) version — partial-aggregable,
    so each partition keeps only its champion before the shuffle."""
    return changes.groupBy("key").agg(
        F.count(F.lit(1)).alias("n_changes"),
        F.max("version").alias("last_version"),
        F.max_by("op", "version").alias("last_op"),
        F.max_by("qv", "version").alias("last_qv"),
    )


def apply_changes(state: DataFrame, batch: DataFrame) -> DataFrame:
    """Merge one compacted micro-batch into the compacted state —
    the same aggregate shape again, over state ∪ batch, with change
    counts summed. Associative + commutative in the batch partition,
    so any arrival order converges to the full-feed compaction."""
    both = state.unionByName(compact(batch))
    return both.groupBy("key").agg(
        F.sum("n_changes").alias("n_changes"),
        F.max("last_version").alias("last_version"),
        F.max_by("last_op", "last_version").alias("last_op"),
        F.max_by("last_qv", "last_version").alias("last_qv"),
    )


def current_view(state: DataFrame) -> DataFrame:
    """The serving snapshot: tombstoned keys hidden, value scaled
    back — column-compatible with d_cdc_apply's output."""
    return state.where(F.col("last_op") != "D").select(
        "key",
        "n_changes",
        "last_version",
        (F.col("last_qv") / 100.0).alias("last_value"),
    )


def empty_state(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [],
        "key BIGINT, n_changes BIGINT, last_version BIGINT,"
        " last_op STRING, last_qv BIGINT",
    )


def run_cdc_stream(
    spark: SparkSession,
    changes_dir: str,
    table: ParquetStateTable | VersionedParquetTable,
    checkpoint_dir: str,
) -> None:
    """AvailableNow drain of a parquet change feed through
    foreachBatch into the state table.

    With a :class:`VersionedParquetTable` this is EXACTLY-ONCE in
    every field including ``n_changes``: each micro-batch commits
    through the table's atomic manifest claim with the batch id
    riding in the manifest's ``meta`` (the Delta ``txn`` pattern), so
    state + progress linearize in one step — a replayed batch (crash
    after the state commit, before the source-offset commit) is
    detected by ``meta()["last_batch_id"]`` and skipped, and a crash
    mid-commit loses nothing (the previous snapshot stays current
    until the new manifest appears). Interleaved writers that don't
    supply meta (compaction, a second stream) are safe too:
    ``try_commit`` merges meta key-wise over the base version's map,
    so ``last_batch_id`` is carried forward, never reset.

    With a :class:`ParquetStateTable` the commit is a plain-parquet
    directory overwrite — NOT atomic: a crash mid-commit can lose
    state, and a replayed batch double-counts ``n_changes`` (the
    LATEST-WINS fields stay correct either way: re-applying a batch
    can only re-elect the same champion). At-least-once with
    idempotent champions, in other words — fine for a serving cache,
    not for an audit count. Prefer the versioned table when
    ``n_changes`` matters."""
    changes = spark.readStream.schema(CHANGES_SCHEMA).parquet(changes_dir)

    if isinstance(table, VersionedParquetTable):

        def handle(batch_df: DataFrame, batch_id: int) -> None:
            last = table.meta().get("last_batch_id", -1)
            if batch_id <= last:
                return  # replayed batch: state already holds it
            table.merge(
                lambda cur: apply_changes(cur, batch_df),
                meta={"last_batch_id": batch_id},
            )

    else:

        def handle(batch_df: DataFrame, batch_id: int) -> None:
            table.commit(apply_changes(table.read(), batch_df))

    (
        changes.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
