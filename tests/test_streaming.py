"""Stream/batch equivalence tests: the streaming twins must produce
exactly the rows their batch counterparts produce on the same data
slice, and checkpointed re-runs must be incremental (no
reprocessing)."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from metadata_wrangler_spark.catalog import load
from metadata_wrangler_spark.operators import queue
from metadata_wrangler_spark.operators.merge import ParquetStateTable
from metadata_wrangler_spark.streaming import incremental, queue_drain

SF_DIR = "/root/testdata/sf0.001"


def test_windowed_stream_equals_batch(spark, tmp_path):
    src = tmp_path / "events_src"
    src.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", src / "part-000.parquet")

    got = incremental.run_windowed_stream(
        spark, str(src), str(tmp_path / "cp"), query_name="t_rollup"
    )
    batch = incremental.windowed_rollup(load(spark, SF_DIR, "events"))

    sgot = sorted(tuple(r) for r in got.collect())
    sexp = sorted(tuple(r) for r in batch.collect())
    assert sgot == sexp
    assert len(sgot) > 0


def test_windowed_stream_checkpoint_no_reprocess(spark, tmp_path):
    src = tmp_path / "events_src"
    src.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", src / "part-000.parquet")
    cp = str(tmp_path / "cp")

    first = incremental.run_windowed_stream(
        spark, str(src), cp, query_name="t_cp1"
    ).collect()
    # second AvailableNow run with no new files: complete-mode memory
    # sink restarts empty, and the checkpoint must mark every file as
    # already processed -> zero rows
    second = incremental.run_windowed_stream(
        spark, str(src), cp, query_name="t_cp2"
    ).collect()
    assert len(first) > 0
    assert len(second) == 0


def test_queue_drain_stream_equals_batch(spark, tmp_path):
    initial = spark.createDataFrame(
        [
            (1, "oclc", "classify", queue.SUCCESS, "2024-01-01 00:00:00", None),
            (2, "oclc", "classify", queue.TRANSIENT, "2024-01-01 00:00:00", "boom"),
        ],
        "identifier_id bigint, data_source string, operation string, "
        "status string, ts string, exception string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    items = spark.createDataFrame(
        [(2,), (3,), (4,)], "identifier_id bigint"
    )
    items_dir = str(tmp_path / "items")
    items.write.parquet(items_dir)

    # streaming drain
    stream_table = ParquetStateTable(spark, str(tmp_path / "stream_state"))
    stream_table.init(initial)
    queue_drain.run_drain_stream(
        spark, items_dir, stream_table, str(tmp_path / "cp"),
    )

    # batch drain of the same items against the same initial state
    batch_table = ParquetStateTable(spark, str(tmp_path / "batch_state"))
    batch_table.init(initial)
    queue_drain.drain_batch(
        batch_table, items, "oclc", "classify", "2024-01-15 00:00:00"
    )

    sgot = sorted(tuple(r) for r in stream_table.read().collect())
    sexp = sorted(tuple(r) for r in batch_table.read().collect())
    assert sgot == sexp

    got = {r["identifier_id"]: (r["status"], r["exception"])
           for r in stream_table.read().collect()}
    # 1: success, untouched. 2: transient retried (eligible) -> even
    # -> success. 3: new registration -> odd -> transient failure.
    # 4: new -> even -> success.
    assert got[1] == (queue.SUCCESS, None)
    assert got[2] == (queue.SUCCESS, None)
    assert got[3] == (queue.TRANSIENT, "transient: remote boom")
    assert got[4] == (queue.SUCCESS, None)


def test_dedup_stream_drops_cross_batch_duplicates(spark, tmp_path):
    """The same events file delivered twice (e.g. a re-sent feed)
    yields each event exactly once — the streaming twin of the
    reference's processed_uris set / so_drop_duplicates."""
    from metadata_wrangler_spark.streaming import dedup as sdedup

    src = tmp_path / "events_src"
    src.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", src / "part-000.parquet")
    shutil.copy(f"{SF_DIR}/events.parquet", src / "part-001.parquet")

    got = sdedup.run_dedup_stream(
        spark, str(src), str(tmp_path / "cp"), query_name="t_dedup"
    )
    batch = load(spark, SF_DIR, "events").dropDuplicates(["event_id"])

    assert got.count() == batch.count()
    sgot = sorted(r["event_id"] for r in got.select("event_id").collect())
    sexp = sorted(r["event_id"] for r in batch.select("event_id").collect())
    assert sgot == sexp


def test_admission_stream_admits_each_content_once(spark, tmp_path):
    """Rolling corpus build: the first delivery admits unique
    contents; a second delivery of the SAME file (new filename, so
    the source treats it as new data) admits nothing."""
    from metadata_wrangler_spark.streaming import admission

    src = tmp_path / "docs_src"
    src.mkdir()
    state = str(tmp_path / "corpus_state")
    cp = str(tmp_path / "cp")
    shutil.copy(f"{SF_DIR}/documents.parquet", src / "drop-001.parquet")

    first = admission.run_admission_stream(spark, str(src), state, cp)
    batch_distinct = (
        load(spark, SF_DIR, "documents")
        .select(F.md5(F.expr(
            r"trim(regexp_replace(lower(text), '\\s+', ' '))"
        )).alias("fp"))
        .distinct().count()
    )
    assert first.count() == batch_distinct

    # same content re-delivered under a new filename
    shutil.copy(f"{SF_DIR}/documents.parquet", src / "drop-002.parquet")
    second = admission.run_admission_stream(spark, str(src), state, cp)
    assert second.count() == batch_distinct          # nothing re-admitted
    assert second.select("fingerprint").distinct().count() == batch_distinct


def test_windowed_append_finalizes_windows_behind_watermark(spark, tmp_path):
    # Three single-file micro-batches (maxFilesPerTrigger=1) at day 1,
    # day 5, day 9. The watermark advances at batch boundaries (plus
    # Spark's trailing no-data batch, which commits the final
    # advance), so it ends at day9-1d = day 8: the day-1 and day-5
    # windows finalize and emit exactly once, while the day-9 window
    # stays in state awaiting later data. Append mode = each window
    # emitted once, then dropped from state — the bounded-state
    # production shape.
    import datetime as dt
    import glob

    src = tmp_path / "src"
    src.mkdir()

    def _write(name, day, n):
        staging = tmp_path / f"_stage_{name}"
        spark.createDataFrame(
            [(day * 100 + i, dt.datetime(2024, 1, day, 10, 0, i),
              7, "click", 1.0) for i in range(n)],
            "event_id bigint, ts timestamp, user_id bigint, "
            "event_type string, value double",
        ).coalesce(1).write.mode("overwrite").parquet(str(staging))
        (part,) = glob.glob(str(staging / "part-*.parquet"))
        shutil.copy(part, src / f"{name}.parquet")

    _write("f1", 1, 4)
    _write("f2", 5, 2)
    _write("f3", 9, 3)

    got = incremental.run_windowed_stream_append(
        spark, str(src), str(tmp_path / "cp"), str(tmp_path / "out"),
        max_files_per_trigger=1, query_name="t_append",
    )
    rows = sorted(
        (str(r["window_day"]), r["event_type"], r["n_events"],
         r["total_value"]) for r in got.collect()
    )
    assert rows == [
        ("2024-01-01", "click", 4, 4.0),
        ("2024-01-05", "click", 2, 2.0),
    ]


def test_queue_drain_through_versioned_table_commits_per_batch(spark, tmp_path):
    # The same drain, but committed through the optimistic ACID
    # table: every micro-batch lands as one atomic version, and the
    # final state matches the single-writer overwrite path.
    from metadata_wrangler_spark.operators.merge import (
        VersionedParquetTable,
    )

    initial = spark.createDataFrame(
        [(2, "oclc", "classify", queue.TRANSIENT,
          "2024-01-01 00:00:00", "boom")],
        "identifier_id bigint, data_source string, operation string, "
        "status string, ts string, exception string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    items = spark.createDataFrame([(2,), (3,)], "identifier_id bigint")
    items_dir = str(tmp_path / "items")
    items.write.parquet(items_dir)

    vt = VersionedParquetTable(spark, str(tmp_path / "acid_state"))
    vt.init(initial)
    queue_drain.run_drain_stream(
        spark, items_dir, vt, str(tmp_path / "cp"),
    )
    assert vt.current_version() >= 1  # init + >=1 drain commit

    plain = ParquetStateTable(spark, str(tmp_path / "plain_state"))
    plain.init(initial)
    queue_drain.drain_batch(
        plain, items, "oclc", "classify", "2024-01-15 00:00:00"
    )
    sgot = sorted(tuple(r) for r in vt.read().collect())
    sexp = sorted(tuple(r) for r in plain.read().collect())
    assert sgot == sexp


def test_native_session_window_streams_with_watermark(spark, tmp_path):
    # The ev_session_window_native expression running under
    # readStream + watermark: sessions whose close falls behind the
    # final watermark emit exactly once; the open tail stays in
    # state. Three single-file batches; user 7's day-1 burst (two
    # events 10 s apart) is one closed session.
    import datetime as dt
    import glob

    src = tmp_path / "src"
    src.mkdir()

    def _write(name, day, secs):
        staging = tmp_path / f"_stage_{name}"
        spark.createDataFrame(
            [(day * 1000 + s, dt.datetime(2024, 1, day, 12, 0, 0)
              + dt.timedelta(seconds=s), 7, "click", 1.0) for s in secs],
            "event_id bigint, ts timestamp, user_id bigint, "
            "event_type string, value double",
        ).coalesce(1).write.mode("overwrite").parquet(str(staging))
        (part,) = glob.glob(str(staging / "part-*.parquet"))
        shutil.copy(part, src / f"{name}.parquet")

    _write("f1", 1, [0, 10])
    _write("f2", 5, [0])
    _write("f3", 9, [0])

    events = incremental.read_events_stream(
        spark, str(src), maxFilesPerTrigger="1"
    )
    if dict(events.dtypes).get("ts") == "timestamp_ntz":
        events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    agg = (
        events.withWatermark("ts", "1 day")
        .groupBy("user_id", F.session_window("ts", "1 hour").alias("win"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_timestamp("win.start").alias("start_epoch"),
            F.unix_timestamp("win.end").alias("end_epoch"),
            "n_events",
        )
    )
    q = (
        agg.writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "cp"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out_schema = ("user_id bigint, start_epoch bigint, "
                  "end_epoch bigint, n_events bigint")
    got = sorted(
        tuple(r) for r in spark.read.schema(out_schema)
        .parquet(str(tmp_path / "out")).collect()
    )
    base = int(dt.datetime(2024, 1, 1, 12, tzinfo=dt.timezone.utc)
               .timestamp())
    day5 = int(dt.datetime(2024, 1, 5, 12, tzinfo=dt.timezone.utc)
               .timestamp())
    # day-1 session: [noon, noon+10s+1h), 2 events; day-5 session
    # emitted by the final watermark (day 8); day-9 stays in state.
    assert got == [
        (7, base, base + 10 + 3600, 2),
        (7, day5, day5 + 3600, 1),
    ]


def test_stream_stream_join_equals_batch(spark, tmp_path):
    from metadata_wrangler_spark.plans import QUERIES, load_all_plans
    from metadata_wrangler_spark.streaming import joins

    load_all_plans()
    src = tmp_path / "events_src"
    src.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", src / "part-000.parquet")

    got = joins.run_attribution_stream(
        spark, str(src), str(tmp_path / "cp"), str(tmp_path / "out"),
        query_name="t_attr",
    )
    batch = QUERIES["ev_stream_stream_join"](spark, SF_DIR)

    sgot = sorted(tuple(r) for r in got.collect())
    sexp = sorted(tuple(r) for r in batch.collect())
    assert sgot == sexp
    assert len(sgot) > 0


def test_stream_stream_join_evicts_state_behind_watermark(spark, tmp_path):
    """The join's bounded-state claim, behaviorally: once the
    watermark passes a click's join window its state is evicted
    (visible in numRowsRemoved), and a purchase whose EVENT time
    would match but which arrives after eviction produces no pair.

    Subtlety this test encodes: the watermark operators sit on the
    type-filtered legs, so only click/purchase events advance them —
    an event of another type is filtered out upstream and moves
    nothing (the first version of this test drove the watermark with
    a 'view' and proved only that)."""
    import glob
    import os
    from datetime import datetime

    from metadata_wrangler_spark.streaming import incremental, joins

    src = tmp_path / "events_src"
    src.mkdir()
    schema = (
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double"
    )

    def ev(eid, ts, uid, etype):
        return (eid, datetime.fromisoformat(ts), uid, etype, 1.0)

    # batch 1: the in-window pair, plus far-future click/purchase
    # events (user 2, 3 h apart so they never pair) that push BOTH
    # legs' watermarks past click@00:00's join window (2 h + 10 min)
    batch1 = spark.createDataFrame([
        ev(1, "2024-01-01 00:00:00", 1, "click"),
        ev(2, "2024-01-01 00:10:00", 1, "purchase"),
        ev(5, "2024-01-01 10:00:00", 2, "click"),
        ev(6, "2024-01-01 13:00:00", 2, "purchase"),
    ], schema)
    # batch 2: quiet traffic; state cleanup runs at micro-batch END,
    # so this batch is where click@00:00's state is removed
    batch2 = spark.createDataFrame([
        ev(7, "2024-01-01 13:00:00", 3, "click"),
        ev(8, "2024-01-01 16:30:00", 3, "purchase"),
    ], schema)
    # batch 3: event time WOULD match click@00:00 (20 min gap), but
    # it arrives two batches after the watermark passed the window
    batch3 = spark.createDataFrame([
        ev(4, "2024-01-01 00:20:00", 1, "purchase"),
    ], schema)

    files = [str(src / f"part-00{i}.parquet") for i in range(3)]
    for i, (batch, dest) in enumerate(
        zip((batch1, batch2, batch3), files)
    ):
        scratch = str(tmp_path / ("scratch_" + os.path.basename(dest)))
        batch.coalesce(1).write.mode("overwrite").parquet(scratch)
        shutil.move(
            glob.glob(os.path.join(scratch, "part-*.parquet"))[0], dest
        )
        # file source orders batches by modification time
        os.utime(dest, (1700000000 + 100 * i,) * 2)

    events = incremental.read_events_stream(
        spark, str(src), maxFilesPerTrigger="1"
    )
    clicks = joins._typed_leg(events, "click").withWatermark(
        "ts", "10 minutes"
    )
    purchases = joins._typed_leg(events, "purchase").withWatermark(
        "ts", "10 minutes"
    )
    q = (
        joins.attribution_pairs(clicks, purchases)
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    out = spark.read.schema(joins.PAIRS_SCHEMA).parquet(
        str(tmp_path / "out")
    )
    pair_ids = sorted((r[0], r[1]) for r in out.collect())
    assert pair_ids == [(1, 2)]  # late (1, 4) never materializes
    removed = sum(
        p["stateOperators"][0]["numRowsRemoved"]
        for p in q.recentProgress
        if p["stateOperators"]
    )
    assert removed >= 2  # click@00:00 + purchase@00:10 state evicted


def test_dedup_within_watermark_bounds_state_and_drops_dupes(
    spark, tmp_path
):
    """The bounded-state twin: duplicates delivered twice (same ids,
    second copy time-shifted inside the watermark window — a retry
    with a fresh timestamp) are emitted exactly once, which the plain
    dropDuplicates spelling also achieves but only at unbounded
    state; this asserts the WithinWatermark operator's semantics on
    the same re-sent-feed scenario."""
    from pyspark.sql import functions as F

    from metadata_wrangler_spark.streaming import dedup as sdedup

    src = tmp_path / "events_src"
    src.mkdir()
    ev = load(spark, SF_DIR, "events")
    stage0 = tmp_path / "stage0"
    stage1 = tmp_path / "stage1"
    ev.coalesce(1).write.parquet(str(stage0))
    # the retry: same ids, timestamps nudged 1 min — still dupes
    ev.withColumn(
        "ts", F.col("ts") + F.expr("INTERVAL 1 MINUTE")
    ).coalesce(1).write.parquet(str(stage1))
    for i, stage in enumerate((stage0, stage1)):
        part = next(stage.glob("part-*.parquet"))
        shutil.copy(part, src / f"part-{i:03d}.parquet")

    got = sdedup.run_dedup_stream_within_watermark(
        spark,
        str(src),
        str(tmp_path / "cp_ww"),
        query_name="t_dedup_ww",
    )
    assert got.count() == ev.count()
    assert sorted(
        r["event_id"] for r in got.select("event_id").collect()
    ) == sorted(r["event_id"] for r in ev.select("event_id").collect())


def test_cdc_apply_stream_equals_batch(spark, tmp_path):
    """Stream/batch equivalence for the CDC apply: the change feed
    split into out-of-order micro-batch files converges, through
    foreachBatch latest-wins merges, to exactly the snapshot the
    one-shot batch operator (d_cdc_apply semantics) computes over
    the full feed."""
    import random

    from metadata_wrangler_spark.streaming import cdc_apply

    rng = random.Random(31)
    # versions unique; every 13th change is a tombstone; some keys'
    # LATEST change is a delete, some get deleted then re-inserted.
    feed = [
        (k, v, "D" if v % 13 == 0 else "U", rng.randrange(100, 99999))
        for v, k in enumerate(
            [rng.randrange(0, 40) for _ in range(400)], start=1
        )
    ]
    # out-of-order micro-batches: shuffle, then slice into 5 files
    rng.shuffle(feed)
    src = tmp_path / "changes"
    src.mkdir()
    for i in range(5):
        spark.createDataFrame(
            feed[i * 80:(i + 1) * 80], cdc_apply.CHANGES_SCHEMA
        ).coalesce(1).write.mode("overwrite").parquet(
            str(src / f"b{i}.parquet")
        )

    table = ParquetStateTable(spark, str(tmp_path / "cdc_state"))
    table.init(cdc_apply.empty_state(spark))
    cdc_apply.run_cdc_stream(
        spark, str(src) + "/*", table, str(tmp_path / "cdc_cp")
    )
    got = {
        r["key"]: (r["n_changes"], r["last_version"], r["last_value"])
        for r in cdc_apply.current_view(table.read()).collect()
    }

    # batch reference over the full feed
    full = spark.createDataFrame(feed, cdc_apply.CHANGES_SCHEMA)
    exp = {
        r["key"]: (r["n_changes"], r["last_version"], r["last_value"])
        for r in cdc_apply.current_view(
            cdc_apply.apply_changes(cdc_apply.empty_state(spark), full)
        ).collect()
    }
    assert got == exp
    # sanity: tombstoned keys really are hidden, and at least one
    # delete-then-reinsert key survived
    state = {r["key"]: r["last_op"] for r in table.read().collect()}
    assert any(op == "D" for op in state.values())
    assert all(
        state[k] != "D" for k in got
    )


def test_cdc_apply_versioned_table_replay_exactly_once(spark, tmp_path):
    """The VersionedParquetTable CDC sink commits the applied batch
    id atomically with the state (manifest meta), so a REPLAYED
    micro-batch — crash after the state commit, before the source
    offset commit — is skipped and n_changes stays exact. The plain
    ParquetStateTable sink double-counts the same replay."""
    from metadata_wrangler_spark.operators.merge import (
        VersionedParquetTable,
    )
    from metadata_wrangler_spark.streaming import cdc_apply

    feed = [(k, v, "U", 100 + k) for v, k in enumerate(
        [0, 1, 2, 0, 1, 0], start=1
    )]
    batch = spark.createDataFrame(feed, cdc_apply.CHANGES_SCHEMA)

    vt = VersionedParquetTable(spark, str(tmp_path / "cdc_v"))
    vt.init(cdc_apply.empty_state(spark))

    def apply_once(batch_id: int) -> None:
        # the same handler body run_cdc_stream installs for a
        # VersionedParquetTable
        last = vt.meta().get("last_batch_id", -1)
        if batch_id <= last:
            return
        vt.merge(
            lambda cur: cdc_apply.apply_changes(cur, batch),
            meta={"last_batch_id": batch_id},
        )

    apply_once(0)
    v_after_first = vt.current_version()
    apply_once(0)  # replay of the same micro-batch
    assert vt.current_version() == v_after_first  # no second commit
    got = {r["key"]: r["n_changes"] for r in vt.read().collect()}
    assert got == {0: 3, 1: 2, 2: 1}  # exact, not doubled
    assert vt.meta() == {"last_batch_id": 0}

    # contrast: the plain overwrite table double-counts the replay
    # (latest-wins fields stay correct; only the count drifts)
    pt = ParquetStateTable(spark, str(tmp_path / "cdc_p"))
    pt.init(cdc_apply.empty_state(spark))
    pt.commit(cdc_apply.apply_changes(pt.read(), batch))
    pt.commit(cdc_apply.apply_changes(pt.read(), batch))
    doubled = {r["key"]: r["n_changes"] for r in pt.read().collect()}
    assert doubled == {0: 6, 1: 4, 2: 2}
