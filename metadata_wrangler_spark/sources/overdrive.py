"""Overdrive metadata-JSON parsing — the bibliographic record behind
the reference's OverdriveBibliographicCoverageProvider.

Reference: `/root/reference/overdrive.py:22-76` wires the provider
(the record schema is visible in its own fixture,
`/root/reference/tests/files/overdrive/overdrive_metadata.json`):
title/sortTitle/subtitle/series/publisher/imprint/mediaType,
`creators[].fileAs` as the contributor sort name, per-format
`identifiers[]` (ISBN/ASIN), `subjects[].value`, `languages[].code`,
`images.cover.href`, and the `popularity` measurement.

Spark design: `from_json` with a typed schema + higher-order
filter/transform pulls — one projection, no UDFs, parse throughput
scales with the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OVERDRIVE_SCHEMA = (
    "id STRING, title STRING, sortTitle STRING, subtitle STRING, "
    "series STRING, publisher STRING, imprint STRING, "
    "mediaType STRING, publishDate STRING, popularity BIGINT, "
    "starRating DOUBLE, "
    "creators ARRAY<STRUCT<name: STRING, fileAs: STRING, role: STRING>>, "
    "languages ARRAY<STRUCT<code: STRING, name: STRING>>, "
    "subjects ARRAY<STRUCT<value: STRING>>, "
    "formats ARRAY<STRUCT<id: STRING, name: STRING, "
    "identifiers: ARRAY<STRUCT<type: STRING, value: STRING>>>>, "
    "images STRUCT<cover: STRUCT<href: STRING, type: STRING>, "
    "thumbnail: STRUCT<href: STRING, type: STRING>>"
)


def parse_overdrive(
    df: DataFrame,
    json_col: str = "payload",
    id_cols: list[str] | None = None,
) -> DataFrame:
    """One typed row per Overdrive metadata record.

    Columns mirror what the reference's provider feeds into
    Metadata.apply: bibliographic fields, the primary author's sort
    name (first creator with role 'Author', `fileAs`), sorted
    language codes and subject values, sorted distinct non-empty
    ISBNs across formats, the cover href, and popularity.
    """
    id_cols = id_cols or [c for c in df.columns if c != json_col]
    parsed = df.withColumn(
        "_d", F.from_json(F.col(json_col), OVERDRIVE_SCHEMA)
    )
    d = F.col("_d")

    authors = F.filter(
        d["creators"], lambda c: c["role"] == F.lit("Author")
    )
    primary_author = F.try_element_at(
        F.transform(authors, lambda c: c["fileAs"]), F.lit(1)
    )
    isbns = F.array_sort(F.array_distinct(F.filter(
        F.flatten(F.transform(
            d["formats"],
            lambda fm: F.transform(
                F.filter(
                    fm["identifiers"],
                    lambda i: (i["type"] == F.lit("ISBN"))
                    & (i["value"] != F.lit("")),
                ),
                lambda i: i["value"],
            ),
        )),
        lambda v: v.isNotNull(),
    )))
    return parsed.select(
        *id_cols,
        d["id"].alias("overdrive_id"),
        d["title"].alias("title"),
        d["sortTitle"].alias("sort_title"),
        d["subtitle"].alias("subtitle"),
        d["series"].alias("series"),
        d["publisher"].alias("publisher"),
        d["imprint"].alias("imprint"),
        d["mediaType"].alias("medium"),
        primary_author.alias("primary_author"),
        # size(NULL) is -1 under legacy sizeOfNull — a record without
        # a creators key must count 0, not -1
        F.when(d["creators"].isNull(), F.lit(0))
        .otherwise(F.size(d["creators"])).alias("n_creators"),
        F.array_sort(
            F.transform(d["languages"], lambda x: x["code"])
        ).alias("languages"),
        F.array_sort(
            F.transform(d["subjects"], lambda s: s["value"])
        ).alias("subjects"),
        isbns.alias("isbns"),
        d["images"]["cover"]["href"].alias("cover_href"),
        d["popularity"].alias("popularity"),
    )
