"""Sinks (SURVEY.md S9/S10/S11).

  csv          report writer / reader (S9) —
               `/root/reference/scripts.py:375-416,419-474`
  opds render  Atom feed assembly from work rows (S10) —
               `/root/reference/controller.py:474-489,547-552`
  image mirror foreachPartition upload + url rewrite (S11) —
               `/root/reference/coverage_utils.py:24-49`,
               `/root/reference/migration/20180626-move-cover-s3-
               bucket.sql:1-7`
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_csv_report(df: DataFrame, path: str) -> None:
    """S9 sink: headered CSV report (single file per partition; the
    reference writes one file from one process — coalesce(1) keeps
    that contract for report-sized outputs only)."""
    df.coalesce(1).write.mode("overwrite").option("header", True).csv(path)


def read_csv_report(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """S9 source: schema-explicit CSV read (never inferSchema in an
    engine path — schema inference is a full extra pass)."""
    return spark.read.schema(schema).option("header", True).csv(path)


def render_opds_entries(
    df: DataFrame, urn: str, title: str, updated: str
) -> DataFrame:
    """S10: render work rows to Atom <entry> XML as a COLUMN —
    serving-layer feed assembly stays distributed until the final
    per-feed concat."""
    entry = F.concat(
        F.lit("<entry><id>"), F.col(urn),
        F.lit("</id><title>"), F.col(title),
        F.lit("</title><updated>"),
        F.date_format(F.col(updated), "yyyy-MM-dd'T'HH:mm:ss'Z'"),
        F.lit("</updated></entry>"),
    )
    return df.withColumn("entry_xml", entry)


def mirror_images(
    df: DataFrame,
    url_col: str,
    payload_col: str,
    uploader: Callable[[str, bytes], None] | None = None,
    client_factory: Callable[[], Callable[[str, bytes], None]] | None = None,
) -> int:
    """S11: upload image payloads via foreachPartition — one client
    per PARTITION, one upload call per row. Returns the row count
    pushed. ``client_factory`` is the injection seam: it runs once
    per partition (build the S3/HTTP connection there) and returns
    the per-row upload callable; a bare ``uploader`` is wrapped in a
    trivial factory. The url rewrite that follows a successful
    mirror run is
    `merge.update_where(df, pred, {url: regexp_replace(...)})`."""
    if client_factory is None:
        if uploader is None:
            raise ValueError("pass uploader or client_factory")
        def client_factory():  # noqa: E306 — trivial compat shim
            return uploader
    count = df.count()

    def handle(rows) -> None:
        client = client_factory()
        for row in rows:
            client(row[url_col], row[payload_col])

    df.select(url_col, payload_col).foreachPartition(handle)
    return count


def write_partitioned_layout(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    sort_by: list[str] | None = None,
) -> None:
    """Write a table with directory partitioning and (optionally)
    within-file clustering — the 100 TB layout step: a read filtered
    on the partition key prunes whole directories before any IO, and
    sorted row groups give min/max-statistics skipping on the sort
    key. One shuffle on the partition key keeps one writer per
    partition (no small-file explosion from every task writing every
    partition)."""
    out = df.repartition(*[F.col(c) for c in partition_by])
    if sort_by:
        out = out.sortWithinPartitions(*sort_by)
    out.write.mode("overwrite").partitionBy(*partition_by).parquet(path)
