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
