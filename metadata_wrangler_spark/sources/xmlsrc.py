"""XML source parsing (SURVEY.md S3) — the OCLC Classify / VIAF
response shape: a document with a list of <work> elements carrying
attribute payloads, parsed into typed rows.

Reference: `/root/reference/oclc/classify.py:68-128` (single- vs
multi-work response detection), `:253-341` (per-<work> attribute
extraction: owi, title, author, editions, holdings),
`/root/reference/viaf.py:479-539` (cluster XML walk).

Spark design: `from_xml` with an explicit schema (attributes surface
with the `_` prefix) → explode the work array. The parse is a
column expression — it scales with the scan, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# <classify><workList><work title=".." author=".." owi=".."
#   editions=".." holdings=".."/>...</workList></classify>
CLASSIFY_SCHEMA = (
    "workList STRUCT<work: ARRAY<STRUCT<"
    "_title: STRING, _author: STRING, _owi: BIGINT, "
    "_editions: INT, _holdings: INT>>>"
)


def parse_classify(df: DataFrame, xml_col: str = "xml") -> DataFrame:
    """One row per <work> element: (doc columns…, owi, title, author,
    editions, holdings)."""
    parsed = df.withColumn(
        "_doc", F.from_xml(F.col(xml_col), CLASSIFY_SCHEMA)
    )
    work = F.explode(F.col("_doc.workList.work")).alias("work")
    keep = [c for c in df.columns if c != xml_col]
    return parsed.select(*keep, work).select(
        *keep,
        F.col("work._owi").alias("owi"),
        F.col("work._title").alias("title"),
        F.col("work._author").alias("author"),
        F.col("work._editions").alias("editions"),
        F.col("work._holdings").alias("holdings"),
    )


def build_classify_xml(
    title: Column, author: Column, owi: Column,
    editions: Column, holdings: Column, n_works: Column,
) -> Column:
    """Serialize a deterministic multi-work Classify document (the
    test fixture generator; real deployments read the XML from the
    HTTP cache table). ``n_works`` copies of the work element are
    emitted with the owi offset by the copy index."""
    work = F.transform(
        F.sequence(F.lit(0), n_works - 1),
        lambda i: F.concat(
            F.lit('<work title="'), title,
            F.lit('" author="'), author,
            F.lit('" owi="'), (owi + i).cast("string"),
            F.lit('" editions="'), editions.cast("string"),
            F.lit('" holdings="'), holdings.cast("string"),
            F.lit('"/>'),
        ),
    )
    return F.concat(
        F.lit("<classify><workList>"),
        F.array_join(work, ""),
        F.lit("</workList></classify>"),
    )
