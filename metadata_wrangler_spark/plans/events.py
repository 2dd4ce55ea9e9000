"""Event-stream plans (SURVEY.md §2.9) — the reference's cron+state
mechanisms re-expressed as windowed / incremental aggregations over
the ``events`` table. The Structured Streaming twins of these plans
live in metadata_wrangler_spark.streaming; these batch forms are the
oracle-checkable semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from metadata_wrangler_spark.catalog import load
from metadata_wrangler_spark.plans import register
from metadata_wrangler_spark.plans.relational import dsum

_WATERMARK = "2024-01-20 00:00:00"


@register(
    "ev_tumbling_window",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS DATE) AS window_day,
           event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           CAST(SUM(CAST(floor((value) * 10000 + 0.5) AS BIGINT)) AS BIGINT) / 10000.0 AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def ev_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-day window aggregation using the streaming-native
    `window()` operator (epoch-aligned ⇒ equals date_trunc).

    Reference mapping: the Monitor sweep cadence / daily report
    buckets (`monitor.py:65-71`, `scripts.py:613-632`). Identical
    code runs under readStream with a watermark — see
    streaming.incremental.
    """
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 day").alias("win"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            dsum(F.col("value")).alias("total_value"),
        )
        .select(
            F.col("win.start").cast("date").alias("window_day"),
            "event_type", "n_events", "n_users", "total_value",
        )
    )


@register(
    "ev_incremental_updates",
    oracle=f"""
    SELECT user_id,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(floor((value) * 10000 + 0.5) AS BIGINT)) AS BIGINT) / 10000.0 AS total_value,
           CAST(floor(epoch(max(ts))) AS BIGINT) AS last_seen_epoch
    FROM events
    WHERE ts > TIMESTAMP '{_WATERMARK}'
    GROUP BY user_id
    """,
)
def ev_incremental_updates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The "updates since T" incremental feed: high-watermark filter
    + per-key rollup.

    Reference: `licensepools_with_works_updated_since`
    (`controller.py:434-438`) — the wrangler's updates feed. The
    watermark predicate pushes down to the scan, so the incremental
    run reads only fresh partitions when the table is
    date-partitioned (the 100 TB layout).
    """
    from metadata_wrangler_spark.catalog import events_since
    ev = events_since(spark, sf_dir, _WATERMARK)
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum(F.col("value")).alias("total_value"),
        F.floor(F.unix_timestamp(F.max("ts"))).cast("bigint")
        .alias("last_seen_epoch"),
    )


@register(
    "ev_sessionized_gaps",
    oracle="""
    WITH ordered AS (
        SELECT user_id, ts, event_id, event_type,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        FROM events
    ), flagged AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN prev_ts IS NULL
                         OR CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(prev_ts)) AS BIGINT) > 3600
                    THEN 1 ELSE 0 END AS new_session
        FROM ordered
    ), sessions AS (
        SELECT user_id, ts, event_id, event_type,
               SUM(new_session) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS session_no
        FROM flagged
    )
    SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
           COUNT(*) AS n_events,
           COUNT(DISTINCT event_type) AS n_event_types
    FROM sessions
    GROUP BY 1, 2
    """,
)
def ev_sessionized_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows by inactivity gap (1 h): lag + cumulative-sum
    session numbering — the batch twin of a
    `session_window`/`applyInPandasWithState` streaming op.

    Scale note: one shuffle on user_id; both windows share the same
    partitioning so Catalyst plans a single exchange.
    """
    ev = load(spark, sf_dir, "events")
    by_user = W.partitionBy("user_id").orderBy("ts", "event_id")
    # event_id tiebreak: with two events at the same (user_id, ts)
    # the cumulative sum would otherwise depend on partition order.
    run = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        W.unboundedPreceding, 0
    )
    flagged = ev.select(
        "user_id", "ts", "event_id", "event_type",
        F.when(
            F.lag("ts").over(by_user).isNull()
            | (
                F.unix_timestamp("ts")
                - F.unix_timestamp(F.lag("ts").over(by_user))
                > 3600
            ),
            1,
        ).otherwise(0).alias("new_session"),
    )
    sessions = flagged.withColumn(
        "session_no", F.sum("new_session").over(run).cast("bigint")
    )
    return sessions.groupBy("user_id", "session_no").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("event_type").alias("n_event_types"),
    )
