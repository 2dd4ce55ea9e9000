"""Structured Streaming twins of the reference's cron+state
mechanisms (SURVEY.md §2.9).

The reference has no stream processor — its streaming-equivalents
are cron scripts sweeping state tables with Timestamp checkpoints
(`/root/reference/monitor.py:65-106`, crontab
`/root/reference/docker/services/simplified_crontab:13-27`). Here
those become:

  incremental   readStream → windowed aggregation, checkpointed,
                Trigger.AvailableNow (the Monitor sweep)
  queue_drain   readStream of work items → foreachBatch applying the
                operators.queue state machine to a ParquetStateTable
                (the CoverageRecord drain)

Batch/stream equivalence is asserted in tests/test_streaming.py:
the same aggregation code produces identical rows under
spark.read and spark.readStream.
"""
