"""Batch-granularity contracts for the pluggable transport seams.

The HTTP fetcher, SOAP transport, and image-mirror client are
deterministic stubs in this container, but their SHAPE is the
deliverable: a real deployment swaps in requests/zeep/S3 clients at
the same seam, and the seam must guarantee one client/call per
PARTITION, never per row — the reference's batch-size knobs
(`/root/reference/oclc/linked_data.py:920`,
`/root/reference/integration_client.py:32`) map to partition counts.
These tests inject counting transports (Spark accumulators survive
the worker-process boundary) and pin that granularity against
regression.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from metadata_wrangler_spark.sources import http_cache, sinks, soap


def test_cached_get_fetcher_called_per_partition_not_per_row(spark):
    sc = spark.sparkContext
    calls = sc.accumulator(0)
    rows_seen = sc.accumulator(0)

    def counting_fetcher(batches):
        calls.add(1)
        for pdf in batches:
            rows_seen.add(len(pdf))
            yield pd.DataFrame({
                "url": pdf["url"],
                "content": "fetched:" + pdf["url"],
            })

    n_rows, n_parts = 40, 4
    requests = (
        spark.range(n_rows)
        .select(F.concat(F.lit("http://x/"), F.col("id")).alias("url"))
        .repartition(n_parts)
    )
    cache = spark.createDataFrame(
        [], "url string, content string, fetched_at timestamp"
    )
    out = http_cache.cached_get(
        requests, cache, "2024-01-01 00:00:00", 3600,
        fetcher=counting_fetcher,
    )
    assert out.count() == n_rows
    # Every row went through the seam, in ≤ one call per partition —
    # a per-row transport would show calls == rows.
    assert rows_seen.value == n_rows
    assert 1 <= calls.value <= n_parts


def test_soap_transport_called_per_partition_not_per_row(spark):
    sc = spark.sparkContext
    calls = sc.accumulator(0)

    def counting_transport(batches):
        calls.add(1)
        yield from soap.fake_transport(batches)

    n_rows, n_parts = 30, 3
    ids = spark.range(n_rows).select(
        F.col("id").alias("identifier_id")
    ).repartition(n_parts)
    out = soap.demand_history(ids, transport=counting_transport)
    assert out.count() == n_rows * 6  # 6 demand months per identifier
    assert 1 <= calls.value <= n_parts


def test_mirror_images_one_client_per_partition(spark):
    sc = spark.sparkContext
    clients_built = sc.accumulator(0)
    uploads = sc.accumulator(0)

    def client_factory():
        clients_built.add(1)

        def upload(url, payload):
            uploads.add(1)

        return upload

    n_rows, n_parts = 20, 4
    df = (
        spark.range(n_rows)
        .select(
            F.concat(F.lit("img://"), F.col("id")).alias("url"),
            F.encode(F.col("id").cast("string"), "utf-8").alias("payload"),
        )
        .repartition(n_parts)
    )
    n = sinks.mirror_images(df, "url", "payload",
                            client_factory=client_factory)
    assert n == n_rows
    assert uploads.value == n_rows
    # Connection setup happens per partition, not per row.
    assert 1 <= clients_built.value <= n_parts


def test_cached_get_serves_hits_when_fetcher_exits_early(spark):
    """A fetcher that returns WITHOUT draining its input iterator
    (early exit after the first miss batch) must not lose the cache
    hits buffered in the undrained batches — the operator, not the
    fetcher, owns hit serving (ADVICE round 9). The declined misses
    stay unfetched (at-most-once seam: no second invocation)."""
    import datetime

    def early_exit_fetcher(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "url": pdf["url"],
                "content": "fetched:" + pdf["url"],
            })
            return  # bails after ONE miss batch, iterator undrained

    n_rows = 400
    # one partition, tiny Arrow batches → many batches per partition
    # (the early exit only leaves batches undrained if there are
    # several; with the default 10k batch size this test would pass
    # vacuously)
    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "50")
    requests = (
        spark.range(n_rows)
        .select(F.concat(F.lit("http://x/"), F.col("id")).alias("url"))
        .coalesce(1)
    )
    # every odd row is a fresh cache hit
    cache = requests.where(F.expr("CAST(substring(url, 10) AS BIGINT) % 2 = 1")).select(
        "url",
        F.concat(F.lit("cached:"), F.col("url")).alias("content"),
        F.lit(datetime.datetime(2024, 1, 1)).cast("timestamp").alias("fetched_at"),
    )
    try:
        out = http_cache.cached_get(
            requests, cache, "2024-01-01 00:30:00", 3600,
            fetcher=early_exit_fetcher,
        )
        got = {r["url"]: (r["content"], r["source"]) for r in out.collect()}
    finally:
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", prev
        )
    # ALL 200 cache hits served, regardless of fetcher behavior
    hits = {u: v for u, v in got.items() if v[1] == "cache"}
    assert len(hits) == n_rows // 2
    assert all(c.startswith("cached:") for c, _ in hits.values())
    # at least the first miss batch was fetched; none duplicated
    fetched = {u: v for u, v in got.items() if v[1] == "fetch"}
    assert 1 <= len(fetched) <= n_rows // 2
    assert len(got) == len(hits) + len(fetched)
