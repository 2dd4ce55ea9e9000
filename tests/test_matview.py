"""Incremental materialized-view maintenance: N incremental
refreshes must equal one full recompute, bit for bit."""

from __future__ import annotations

from pyspark.sql import functions as F

from metadata_wrangler_spark.catalog import load
from metadata_wrangler_spark.operators.matview import MaterializedDailyRollup

SF_DIR = "/root/testdata/sf0.001"


def _full_rollup(events):
    return events.groupBy(
        F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        (
            F.sum(F.floor(F.col("value") * 10000 + F.lit(0.5)).cast("bigint"))
            / F.lit(10000.0)
        ).alias("total_value"),
    )


def test_incremental_refresh_equals_full_recompute(spark, tmp_path):
    ev = load(spark, SF_DIR, "events")
    cutoff = "2024-01-15 00:00:00"
    early = ev.where(F.col("ts") <= F.lit(cutoff).cast("timestamp"))
    mv = MaterializedDailyRollup(spark, str(tmp_path / "mv"))
    mv.init(early)

    # refresh consumes exactly the post-cutoff slice...
    n = mv.refresh(ev)
    assert n == ev.count() - early.count()
    # ...and a second refresh with no new data is a no-op
    assert mv.refresh(ev) == 0

    got = sorted(tuple(r) for r in mv.read().collect())
    exp = sorted(tuple(r) for r in _full_rollup(ev).collect())
    assert got == exp
    assert len(got) > 0


def test_refresh_boundary_second_not_lost(spark, tmp_path):
    """Watermark precision: an event in the SAME second as the stored
    watermark but with a later fraction must still be consumed — the
    floor-to-seconds spelling silently drops it (the latent-mismatch
    class ADVICE.md flagged)."""
    from datetime import datetime

    schema = (
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double"
    )
    early = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 0, 0, 0, 250000), 1, "click", 1.0)],
        schema,
    )
    late = spark.createDataFrame(
        [(2, datetime(2024, 1, 1, 0, 0, 0, 750000), 1, "click", 2.0)],
        schema,
    )
    mv = MaterializedDailyRollup(spark, str(tmp_path / "mv"))
    mv.init(early)
    assert mv.refresh(early.unionByName(late)) == 1
    row = mv.read().collect()[0]
    assert row["n_events"] == 2
    assert row["total_value"] == 3.0


def test_init_on_empty_slice_then_refresh(spark, tmp_path):
    """Bootstrapping before any events exist must work: empty init,
    then the first refresh consumes everything."""
    ev = load(spark, SF_DIR, "events")
    empty = ev.where(F.lit(False))
    mv = MaterializedDailyRollup(spark, str(tmp_path / "mv"))
    mv.init(empty)
    assert mv.watermark_epoch() == 0
    assert mv.refresh(ev) == ev.count()
    got = sorted(tuple(r) for r in mv.read().collect())
    exp = sorted(tuple(r) for r in _full_rollup(ev).collect())
    assert got == exp


def test_refresh_on_pre_meta_table_keeps_applied_batch(spark, tmp_path):
    """Exactly-once across the meta upgrade: a table written BEFORE
    manifest-meta state (empty meta, state in rows) that has already
    applied micro-batch 7 must still reject a replay of batch 7 after
    a refresh(). The round-9 refresh committed only
    {watermark_epoch}, so the first refresh on such a table flipped
    _state() onto the meta path with applied_batch=-1 and the replay
    double-counted (ADVICE round 9)."""
    from datetime import datetime

    schema = (
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double"
    )
    base = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 12, 0, 0), 1, "click", 1.0)], schema
    )
    batch7 = spark.createDataFrame(
        [(2, datetime(2024, 1, 2, 12, 0, 0), 1, "click", 2.0)], schema
    )
    mv = MaterializedDailyRollup(spark, str(tmp_path / "mv"))
    mv.init(base)
    assert mv.merge_batch(batch7, batch_id=7) == 1

    # Strip the manifest meta to simulate a pre-round-9 table whose
    # state lives only in the rows (the scan-based fallback path).
    rows = mv.table.read()
    pre_meta = MaterializedDailyRollup(spark, str(tmp_path / "mv2"))
    pre_meta.table.init(rows)  # no meta kwarg: empty manifest meta
    assert pre_meta.table.meta() == {}
    assert pre_meta._state() == mv._state()  # row-scan fallback works

    # A refresh with new data commits meta; BOTH fields must survive.
    fresh = spark.createDataFrame(
        [(3, datetime(2024, 1, 3, 12, 0, 0), 1, "click", 4.0)], schema
    )
    assert pre_meta.refresh(base.unionByName(batch7).unionByName(fresh)) == 1
    assert pre_meta._state()[1] == 7  # applied_batch not reset to -1

    # The replayed micro-batch is skipped, not double-counted.
    assert pre_meta.merge_batch(batch7, batch_id=7) == 0
    total = pre_meta.read().agg(F.sum("n_events").alias("n")).collect()[0]
    assert total["n"] == 3


def test_streaming_view_maintenance_equals_full_recompute(spark, tmp_path):
    """Files delivered as micro-batches through foreachBatch must
    leave the view identical to a one-shot aggregation of all
    events, and a checkpointed re-run must change nothing."""
    import shutil

    from metadata_wrangler_spark.streaming import view_maintenance

    src = tmp_path / "events_src"
    src.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", src / "part-000.parquet")

    ev = load(spark, SF_DIR, "events")
    mv = MaterializedDailyRollup(spark, str(tmp_path / "mv"))
    mv.init(ev.where(F.lit(False)))

    got = view_maintenance.run_view_maintenance_stream(
        spark, str(src), str(tmp_path / "mv"), str(tmp_path / "cp"),
        query_name="t_vm", max_files_per_trigger=1,
    )
    exp = sorted(tuple(r) for r in _full_rollup(ev).collect())
    assert sorted(tuple(r) for r in got.collect()) == exp

    # re-run with nothing new: checkpoint skips the file, view unchanged
    again = view_maintenance.run_view_maintenance_stream(
        spark, str(src), str(tmp_path / "mv"), str(tmp_path / "cp"),
        query_name="t_vm2",
    )
    assert sorted(tuple(r) for r in again.collect()) == exp


def test_streaming_view_merges_late_event_time_files(spark, tmp_path):
    """A file landing AFTER the watermark has advanced past its event
    times must still merge (batch-id idempotence, not event-time
    filtering, guards the streaming path — the first driver dropped
    such files forever)."""
    import glob
    import os
    import shutil
    from datetime import datetime

    from metadata_wrangler_spark.streaming import view_maintenance

    src = tmp_path / "events_src"
    src.mkdir()
    schema = (
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double"
    )

    def ev(eid, ts):
        return (eid, datetime.fromisoformat(ts), 1, "click", 1.0)

    newer = spark.createDataFrame([ev(1, "2024-01-05 00:00:00")], schema)
    late = spark.createDataFrame([ev(2, "2024-01-02 00:00:00")], schema)
    files = [str(src / "part-000.parquet"), str(src / "part-001.parquet")]
    for i, (batch, dest) in enumerate(zip((newer, late), files)):
        scratch = str(tmp_path / f"s{i}")
        batch.coalesce(1).write.mode("overwrite").parquet(scratch)
        shutil.move(
            glob.glob(os.path.join(scratch, "part-*.parquet"))[0], dest
        )
        os.utime(dest, (1700000000 + 100 * i,) * 2)

    mv = MaterializedDailyRollup(spark, str(tmp_path / "mv"))
    mv.init(load(spark, SF_DIR, "events").where(F.lit(False)))
    got = view_maintenance.run_view_maintenance_stream(
        spark, str(src), str(tmp_path / "mv"), str(tmp_path / "cp"),
        query_name="t_late", max_files_per_trigger=1,
    )
    rows = {(str(r["day"]), r["n_events"]) for r in got.collect()}
    # BOTH days present: the late file's event was not dropped
    assert rows == {("2024-01-05", 1), ("2024-01-02", 1)}
