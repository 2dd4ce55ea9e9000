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
from pyspark.sql import types as T

FEED_SCHEMA = (
    "entry ARRAY<STRUCT<id: STRING, title: STRING, updated: STRING>>"
)

# Lookup feeds answer unknown works with an OPDSMessage block
# (<simplified:message> with a status code and description) instead
# of an <entry> — the reference's LookupAcquisitionFeed precomposed
# message rows (`/root/reference/controller.py:636-641`; fixture
# tests/files/opds/no_such_work.opds). Prefixed tag names can't be
# spelled in DDL, so this schema is programmatic.
MESSAGE_SCHEMA = T.StructType([
    T.StructField("simplified:message", T.ArrayType(T.StructType([
        T.StructField("id", T.StringType()),
        T.StructField("simplified:status_code", T.IntegerType()),
        T.StructField("schema:description", T.StringType()),
    ]))),
])


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


def parse_messages(df: DataFrame, xml_col: str = "feed") -> DataFrame:
    """(doc columns…, urn, status_code, description) — one row per
    OPDSMessage block in each feed (unknown-work 404s and friends)."""
    parsed = df.withColumn("_doc", F.from_xml(F.col(xml_col), MESSAGE_SCHEMA))
    keep = [c for c in df.columns if c != xml_col]
    m = F.explode(F.col("_doc").getField("simplified:message")).alias("m")
    return parsed.select(*keep, m).select(
        *keep,
        F.col("m.id").alias("urn"),
        F.col("m").getField("simplified:status_code").alias("status_code"),
        F.col("m").getField("schema:description").alias("description"),
    )
