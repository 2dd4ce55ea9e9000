"""VIAF SRU cluster parsing (SURVEY.md S3, the VIAF half).

Reference: `/root/reference/viaf.py:479-539` (cluster walk — note it
parses with `recover=True` and matches on `local-name()` because the
SRU envelope's namespace prefixes vary), `:522-539`
(`extract_wikipedia_name`: a `sources/source` entry of the form
``WKP|Name`` that is NOT a Wikidata id), `:534-539`
(`sort_names_by_popularity`: mainHeadings texts, trailing comma
stripped, counted).

Spark design: the SRU envelope is deeply nested XML with VARYING
namespace prefixes (`ns2:`, `ns7:`, …), so a fixed-tag `from_xml`
schema cannot express the reference's local-name() matching. We
instead split documents into clusters and pull the (few, flat)
leaf fields with `regexp_extract_all` — pure column expressions,
prefix-insensitive by construction, scan-parallel, and tolerant of
the malformed payloads `recover=True` tolerates. Structured fields
parse is the Classify path (xmlsrc); this is the local-name() path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_CLUSTER = r"(?s)<(?:\w+:)?VIAFCluster[^>]*>.*?</(?:\w+:)?VIAFCluster>"
_VIAF_ID = r"<(?:\w+:)?viafID>([^<]+)</"
_MAIN_HEADINGS = r"(?s)<(?:\w+:)?mainHeadings>(.*?)</(?:\w+:)?mainHeadings>"
_HEADING_TEXT = r"<(?:\w+:)?text>([^<]+)</"
# Scoped to <source> elements: WKP|… also appears inside <link>
# elements (xlinks), which the reference's extract_wikipedia_name
# does NOT treat as a Wikipedia name (its XPath is sources/source).
_WKP = r"<(?:\w+:)?source\b[^>]*>WKP\|([^<]+)</"


def parse_viaf_clusters(df: DataFrame, xml_col: str = "xml") -> DataFrame:
    """One row per VIAFCluster in each SRU response document:

      viaf_id        STRING   (<viafID> text, null if absent)
      sort_names     ARRAY<STRING>  mainHeadings texts, trailing
                     comma stripped (the popularity-vote input)
      wikipedia_name STRING   first WKP| source that is not a
                     Wikidata id (^Q[0-9])

    Cluster boundaries and leaf fields are matched on local names
    (any-or-no namespace prefix), mirroring the reference's
    local-name() XPath.
    """
    keep = [c for c in df.columns if c != xml_col]
    clusters = df.select(
        *keep,
        F.explode(
            F.regexp_extract_all(xml_col, F.lit(_CLUSTER), 0)
        ).alias("_cluster"),
    )
    main = F.regexp_extract("_cluster", _MAIN_HEADINGS, 1)
    sort_names = F.transform(
        F.regexp_extract_all(main, F.lit(_HEADING_TEXT), 1),
        lambda t: F.regexp_replace(t, ",$", ""),
    )
    wkp = F.filter(
        F.regexp_extract_all(F.col("_cluster"), F.lit(_WKP), 1),
        lambda w: ~w.rlike("^Q[0-9]"),
    )
    viaf_id = F.regexp_extract("_cluster", _VIAF_ID, 1)
    return clusters.select(
        *keep,
        F.when(viaf_id != "", viaf_id).alias("viaf_id"),
        sort_names.alias("sort_names"),
        F.try_element_at(wkp, F.lit(1)).alias("wikipedia_name"),
    )


def top_sort_name(clusters: DataFrame) -> DataFrame:
    """Per cluster row: the most popular mainHeadings sort name
    (count desc, then lexicographic for determinism) — the
    `sort_names_by_popularity` vote."""
    exploded = clusters.select(
        "viaf_id", F.explode("sort_names").alias("sort_name")
    )
    counted = exploded.groupBy("viaf_id", "sort_name").agg(
        F.count(F.lit(1)).alias("votes")
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("viaf_id").orderBy(
        F.desc("votes"), F.asc("sort_name")
    )
    return (
        counted.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("viaf_id", "sort_name", "votes")
    )
