"""Incrementally-maintained materialized rollup — the engine's
materialized-view maintenance primitive.

The reference maintains derived state (cached OPDS entries, work
presentation) by recomputing rows flagged stale through
WorkCoverageRecords (`/root/reference/coverage_provider.py:132-134`,
`migration/20180626-move-cover-s3-bucket.sql:6-7`). For ADDITIVE
aggregates the cluster-scale version is cheaper than recompute:
aggregate only the events past the stored high-watermark and MERGE
the delta into the stored rollup by group key — history is never
re-aggregated, so maintenance cost tracks the delta, not the table.

Additivity is the contract: COUNT and decimal-quantized SUM merge by
addition (the same per-row floor quantization as plans.relational.
dsum, applied BEFORE summation, makes partial-then-merge equal
one-shot aggregation bit-for-bit). Non-additive aggregates
(count-distinct, percentiles) need a mergeable sketch instead — the
KMV sketch (plans/events.a_kmv_distinct_sketch) is the shipped
example of that class.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from metadata_wrangler_spark.operators.lineage import free_checkpoint
from metadata_wrangler_spark.operators.merge import VersionedParquetTable

def _micros(col: str):
    """unix_micros over either TIMESTAMP or TIMESTAMP_NTZ ``ts``
    (sessions pin UTC, so the ntz→ltz cast is value-stable)."""
    return F.unix_micros(F.col(col).cast("timestamp"))


def _partial(events: DataFrame) -> DataFrame:
    """Partial (additive) aggregate of an event slice: counts and the
    1e-4-quantized value sum as BIGINT — exact, mergeable units."""
    return events.groupBy(
        F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(
            F.floor(F.col("value") * 10000 + F.lit(0.5)).cast("bigint")
        ).alias("q_value"),
    )


class MaterializedDailyRollup:
    """Daily (day × event_type) rollup maintained incrementally.

    State lives in a ``VersionedParquetTable``: every refresh is one
    ATOMIC snapshot commit (manifest claim), so a crash mid-refresh
    leaves the previous version — rollup rows and their watermark —
    fully intact, and the retry re-consumes the same delta exactly
    once. (A partition-overwrite layout would write only touched
    days but commits partition-by-partition; a crash between
    partitions would strand a half-applied delta behind an advanced
    watermark and permanently under-count. On a cluster with a real
    table format, Delta's ``MERGE INTO`` gives atomicity AND
    touched-partition writes; this class is the format-free
    equivalent that chooses atomicity.)

    The watermark guard inside ``refresh`` is an EXACTNESS mechanism
    (each event merges once), not a pruning mechanism: it compares a
    derived microsecond epoch, which parquet scan statistics cannot
    evaluate. At 100 TB pass the pre-pruned incremental slice —
    ``catalog.events_since``'s raw-column band filter reaches
    row-group stats, and on a date-partitioned layout only fresh
    partitions are listed at all.
    """

    #: fixed rollup schema — pinned on every read so parquet footer
    #: inference never runs a job (round-9 floor cut).
    SCHEMA = (
        "day date, event_type string, n_events bigint, q_value bigint, "
        "watermark_epoch bigint, applied_batch bigint"
    )

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.table = VersionedParquetTable(spark, path, schema=self.SCHEMA)

    def init(self, events: DataFrame) -> None:
        # Microsecond-precision watermark: a floor-to-seconds epoch
        # silently drops same-second-higher-fraction events at the
        # boundary (the latent-mismatch class ADVICE.md flagged on
        # the session-window oracle) — unix_micros is exact for
        # parquet MICROS/NANOS-derived timestamps.
        #
        # The watermark folds into the SAME aggregate that builds the
        # bootstrap rollup (max over per-group maxes == global max),
        # so the bootstrap slice is scanned ONCE: the grouped partial
        # materializes as a rollup-sized checkpoint, the watermark is
        # a tiny collect over it, and the committed rows read the
        # same checkpoint (round 11; the first cut ran a separate
        # full-slice max(ts) job before the aggregate).
        pagg = (
            events.groupBy(
                F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
                "event_type",
            )
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(
                    F.floor(F.col("value") * 10000 + F.lit(0.5))
                    .cast("bigint")
                ).alias("q_value"),
                F.max(_micros("ts")).alias("__mx"),
            )
            .localCheckpoint(eager=False)
        )
        row = pagg.agg(
            F.coalesce(F.max("__mx"), F.lit(0)).alias("wm")
        ).collect()[0]
        wm = int(row["wm"])
        base = pagg.select(
            "day", "event_type", "n_events", "q_value",
            F.lit(wm).alias("watermark_epoch"),
            F.lit(-1).cast("bigint").alias("applied_batch"),
        )
        # The watermark ALSO commits as manifest meta — the
        # linearization point carries the stream progress, exactly
        # how real table formats record it (Delta txn action /
        # Iceberg snapshot summary) — so state reads are zero-job
        # manifest lookups, not table scans (round-9 floor cut; the
        # row columns stay as the scan-based fallback for tables
        # written before this round).
        self.table.init(
            base, meta={"watermark_epoch": wm, "applied_batch": -1}
        )
        # committed to disk; the bootstrap partial is dead
        free_checkpoint(pagg)

    def _state(self, version: int | None = None) -> tuple[int, int]:
        """(watermark_epoch, applied_batch) of ``version`` (default
        current) — manifest meta when present (zero Spark jobs),
        table-scan fallback otherwise."""
        m = self.table.meta(version)
        if "watermark_epoch" in m:
            return int(m["watermark_epoch"]), int(m.get("applied_batch", -1))
        row = self.table.read(version).agg(
            F.coalesce(F.max("watermark_epoch"), F.lit(0)).alias("w"),
            F.coalesce(F.max("applied_batch"), F.lit(-1)).alias("b"),
        ).collect()[0]
        return int(row["w"]), int(row["b"])

    def watermark_epoch(self) -> int:
        return self._state()[0]

    def refresh(self, events: DataFrame) -> int:
        """Merge events newer than the stored watermark into the
        rollup. Returns the number of fresh events consumed.

        The fresh slice is materialized ONCE (localCheckpoint) before
        anything is measured or merged: the count, the new watermark,
        and the committed delta must come from the same snapshot of
        the source — re-reading a live directory between those jobs
        could fold late-arriving files into the delta without
        covering them with the stored watermark, double-counting them
        on the next refresh. The checkpoint is bounded by the delta,
        never the table.

        Job shape (round-9 floor cut — this query's wall was pure
        per-job scheduling tax at every SF): the slice is a LAZY
        checkpoint whose count() both materializes it and serves as
        the emptiness probe (closure-style — the old eager
        checkpoint + take(1) was two jobs), and the delta snapshot's
        blocks are released synchronously once the version commits.
        Driver-side state reads stay tiny literal-collects — a
        broadcast-1-row-aggregate fusion was tried and REVERTED:
        each broadcast build is its own job and costs more than the
        sub-0.1 s collect it replaces on a |days×types|-row table."""
        wm = self.watermark_epoch()
        fresh = events.where(_micros("ts") > F.lit(wm)).localCheckpoint(
            eager=False
        )
        if fresh.count() == 0:
            free_checkpoint(fresh)
            return 0

        merged_count = 0

        def merge_fn(current: DataFrame, base: int):
            # Everything derives from the pinned BASE snapshot INSIDE
            # the retry loop: after losing an optimistic race, the
            # competitor may have merged part (or all) of our slice
            # and advanced the watermark — re-slicing against the
            # CURRENT watermark keeps the merge exactly-once, and the
            # new watermark is max(current, slice) so a retry can
            # never regress it below events already covered. (The
            # first cut captured delta and new_wm once, outside the
            # loop — a retry would have double-counted every fresh
            # event.) State comes from the base manifest's meta —
            # committed atomically with that snapshot, so exactly as
            # race-safe as scanning its rows, for zero jobs.
            nonlocal merged_count
            cur_wm, applied = self._state(base)
            mine = fresh.where(_micros("ts") > F.lit(cur_wm))
            stats = mine.agg(
                F.count(F.lit(1)).alias("n"),
                F.coalesce(F.max(_micros("ts")), F.lit(cur_wm)).alias("wm"),
            ).collect()[0]
            merged_count = int(stats["n"])
            new_wm = max(cur_wm, int(stats["wm"]))
            post = (
                current.select("day", "event_type", "n_events", "q_value")
                .unionByName(_partial(mine))
                .groupBy("day", "event_type")
                .agg(
                    F.sum("n_events").alias("n_events"),
                    F.sum("q_value").alias("q_value"),
                )
                .select(
                    "day", "event_type", "n_events", "q_value",
                    F.lit(new_wm).alias("watermark_epoch"),
                    F.lit(applied).cast("bigint").alias("applied_batch"),
                )
            )
            # BOTH state fields go into the meta: committing only the
            # watermark would leave a pre-meta table (empty manifest
            # meta, state in rows) with meta = {watermark_epoch} after
            # its first refresh — _state() would then take the meta
            # path and report applied_batch=-1, letting a replayed
            # foreachBatch micro-batch past the batch_id<=applied
            # guard and double-counting it.
            return post, {"watermark_epoch": new_wm, "applied_batch": applied}

        self.table.merge(merge_fn)
        # The committed version is on disk; the delta snapshot is
        # dead — release its blocks synchronously (round-9
        # checkpoint-lifetime discipline).
        free_checkpoint(fresh)
        return merged_count

    def merge_batch(self, batch_df: DataFrame, batch_id: int) -> int:
        """Streaming-side merge: idempotent on the micro-batch ID,
        NOT filtered by event time — a late-arriving file whose
        events predate the stored watermark still merges (the
        event-time guard in ``refresh`` would silently drop it; the
        first streaming driver did exactly that). foreachBatch
        batch ids are monotonic, and foreachBatch is at-least-once
        on failure recovery, so: batch_id <= last applied → replay,
        skip; otherwise merge everything and record the id in the
        same atomic snapshot commit. Returns rows merged."""
        merged_count = 0
        batch = batch_df.localCheckpoint(eager=True)

        def merge_fn(current: DataFrame, base: int):
            nonlocal merged_count
            cur_wm, applied = self._state(base)
            if batch_id <= applied:
                merged_count = 0
                return current
            stats = batch.agg(
                F.count(F.lit(1)).alias("n"),
                F.coalesce(F.max(_micros("ts")), F.lit(0)).alias("wm"),
            ).collect()[0]
            merged_count = int(stats["n"])
            new_wm = max(cur_wm, int(stats["wm"]))
            post = (
                current.select("day", "event_type", "n_events", "q_value")
                .unionByName(_partial(batch))
                .groupBy("day", "event_type")
                .agg(
                    F.sum("n_events").alias("n_events"),
                    F.sum("q_value").alias("q_value"),
                )
                .select(
                    "day", "event_type", "n_events", "q_value",
                    F.lit(new_wm).alias("watermark_epoch"),
                    F.lit(batch_id).cast("bigint").alias("applied_batch"),
                )
            )
            return post, {
                "watermark_epoch": new_wm, "applied_batch": batch_id
            }

        self.table.merge(merge_fn)
        free_checkpoint(batch)
        return merged_count

    def read(self) -> DataFrame:
        """The rollup in reporting shape (quantized sum back to
        DOUBLE — identical bits to a one-shot dsum aggregation)."""
        return self.table.read().select(
            "day", "event_type", "n_events",
            (F.col("q_value") / F.lit(10000.0)).alias("total_value"),
        )
