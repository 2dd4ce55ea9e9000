"""OPDS/Atom feed parsing (SURVEY.md S8) — a feed document with
URN-keyed entries.

Reference: `/root/reference/controller.py:566-607` (feedparser over
a POSTed OPDS feed; entries keyed by `urn`).

Spark design: `from_xml` with an entry-array schema → explode. One
feed row in, one row per entry out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEED_SCHEMA = (
    "entry ARRAY<STRUCT<id: STRING, title: STRING, updated: STRING>>"
)


def parse_feed(df: DataFrame, xml_col: str = "feed") -> DataFrame:
    """(doc columns…, urn, title, updated) — one row per <entry>."""
    parsed = df.withColumn("_doc", F.from_xml(F.col(xml_col), FEED_SCHEMA))
    keep = [c for c in df.columns if c != xml_col]
    e = F.explode(F.col("_doc.entry")).alias("e")
    return parsed.select(*keep, e).select(
        *keep,
        F.col("e.id").alias("urn"),
        F.col("e.title").alias("title"),
        F.to_timestamp(F.col("e.updated")).alias("updated"),
    )
