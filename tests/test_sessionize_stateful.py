"""applyInPandasWithState sessionizer vs the batch sessionization:
closed sessions from the stateful stream must match the batch
twin's sessions (except each user's final, still-open session, which
correctly stays in state)."""

from __future__ import annotations

import shutil

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from metadata_wrangler_spark.catalog import load
from metadata_wrangler_spark.streaming import sessionize

SF_DIR = "/root/testdata/sf0.001"


def _batch_sessions(spark):
    ev = load(spark, SF_DIR, "events")
    by_user = W.partitionBy("user_id").orderBy("ts", "event_id")
    run = W.partitionBy("user_id").orderBy("epoch", "event_id").rowsBetween(
        W.unboundedPreceding, 0
    )
    flagged = ev.select(
        "user_id", F.unix_timestamp("ts").alias("epoch"), "event_id",
        F.when(
            F.lag("ts").over(by_user).isNull()
            | (F.unix_timestamp("ts")
               - F.unix_timestamp(F.lag("ts").over(by_user)) > 3600),
            1,
        ).otherwise(0).alias("new_session"),
    )
    sess = flagged.withColumn(
        "session_no", F.sum("new_session").over(run).cast("bigint")
    )
    return sess.groupBy("user_id", "session_no").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("epoch").alias("session_start_epoch"),
        F.max("epoch").alias("session_end_epoch"),
    )


def test_stateful_sessionizer_matches_batch_closed_sessions(spark, tmp_path):
    src = tmp_path / "events_src"
    src.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", src / "part-000.parquet")

    got = sessionize.sessionize_stream(
        spark, str(src), str(tmp_path / "cp"), query_name="t_sessions"
    )
    stream_rows = {
        (r["user_id"], r["session_no"]):
            (r["n_events"], r["session_start_epoch"], r["session_end_epoch"])
        for r in got.collect()
    }

    batch = _batch_sessions(spark)
    # the stream withholds each user's final (open) session
    w = W.partitionBy("user_id")
    closed_batch = (
        batch.withColumn("max_no", F.max("session_no").over(w))
        .where(F.col("session_no") < F.col("max_no"))
    )
    batch_rows = {
        (r["user_id"], r["session_no"]):
            (r["n_events"], r["session_start_epoch"], r["session_end_epoch"])
        for r in closed_batch.collect()
    }
    assert len(stream_rows) > 0
    assert stream_rows == batch_rows


def test_cross_batch_late_event_merges_within_gap_bound(spark, tmp_path):
    # Two AvailableNow passes over a growing directory = two
    # micro-batches against one checkpoint/state store. Batch 2
    # delivers an event EARLIER than everything in batch 1 (late,
    # within the gap bound) plus a far-future event that closes the
    # session — the closed session must count the late event and
    # keep the batch-equivalent span.
    import datetime as dt
    import glob

    src = tmp_path / "src"
    src.mkdir()

    def _write(name, rows):
        staging = tmp_path / f"_stage_{name}"
        spark.createDataFrame(
            [(i, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s),
              100, "click", 1.0) for i, s in rows],
            "event_id bigint, ts timestamp, user_id bigint, "
            "event_type string, value double",
        ).coalesce(1).write.mode("overwrite").parquet(str(staging))
        (part,) = glob.glob(str(staging / "part-*.parquet"))
        shutil.copy(part, src / f"{name}.parquet")

    base = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc).timestamp()
    _write("b1", [(1, 1000), (2, 2000)])
    got1 = sessionize.sessionize_stream(
        spark, str(src), str(tmp_path / "cp"), query_name="late_s1",
        output_dir=str(tmp_path / "out"),
    )
    assert got1.count() == 0  # session still open, nothing closed

    # 500 is LATE (before both batch-1 events, within the 3600 s gap
    # of the open session's end); 9000 exceeds the gap and closes it.
    _write("b2", [(3, 500), (4, 9000)])
    got2 = sessionize.sessionize_stream(
        spark, str(src), str(tmp_path / "cp"), query_name="late_s2",
        output_dir=str(tmp_path / "out"),
    )
    out = [(r["user_id"], r["session_no"], r["n_events"],
            r["session_start_epoch"], r["session_end_epoch"])
           for r in got2.collect()]
    assert out == [(100, 1, 3, int(base) + 500, int(base) + 2000)]
