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


def parse_rejects(
    df: DataFrame, schema: str, xml_col: str = "xml"
) -> DataFrame:
    """Dead-letter feed: rows whose non-null payload failed to parse
    under ``schema`` (``from_xml`` is PERMISSIVE — malformed XML
    nulls out and would otherwise vanish silently at the explode).
    The reference records these as transient-failure CoverageRecords
    (`/root/reference/coverage_provider.py:340-354`); route this
    frame to the retry queue (`operators.queue.register` with a
    failure status) instead of losing them."""
    with_corrupt = schema.rstrip() + ", _corrupt_record STRING"
    parsed = df.withColumn(
        "_doc",
        F.from_xml(
            F.col(xml_col), with_corrupt,
            {"mode": "PERMISSIVE",
             "columnNameOfCorruptRecord": "_corrupt_record"},
        ),
    )
    return parsed.where(
        F.col(xml_col).isNotNull()
        & F.col("_doc._corrupt_record").isNotNull()
    ).drop("_doc")


def parse_classify(df: DataFrame, xml_col: str = "xml") -> DataFrame:
    """One row per <work> element: (doc columns…, owi, title, author,
    editions, holdings). Malformed payloads drop out here — capture
    them with ``parse_rejects(df, CLASSIFY_SCHEMA)`` for the retry
    queue."""
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


# The REAL OCLC Classify response shape (namespaced; fixtures at
# /root/reference/tests/files/oclc_classify/): a <response code=N/>
# status, then either a single top-level <work> (code 0/2) plus
# <authors> and <recommendations>, or a <works> list (code 4).
# Response-code vocabulary: `/root/reference/oclc/classify.py:54-60`.
SINGLE_WORK_SUMMARY_STATUS = 0
SINGLE_WORK_DETAIL_STATUS = 2
MULTI_WORK_STATUS = 4
NOT_FOUND_STATUS = 102

OCLC_RESPONSE_SCHEMA = (
    "response STRUCT<_code: INT>, "
    "work STRUCT<_owi: STRING, _title: STRING, _author: STRING, "
    "_editions: INT, _holdings: INT>, "
    "works STRUCT<work: ARRAY<STRUCT<_owi: STRING, _title: STRING, "
    "_author: STRING, _editions: INT, _holdings: INT>>>, "
    "authors STRUCT<author: ARRAY<STRUCT<_lc: STRING, _viaf: STRING, "
    "_VALUE: STRING>>>, "
    "recommendations STRUCT<"
    "fast: STRUCT<headings: STRUCT<heading: ARRAY<STRUCT<"
    "_heldby: INT, _ident: STRING, _VALUE: STRING>>>>, "
    "ddc: STRUCT<mostPopular: STRUCT<_holdings: INT, _nsfa: STRING, "
    "_sfa: STRING>>, "
    "lcc: STRUCT<mostPopular: STRUCT<_holdings: INT, _nsfa: STRING, "
    "_sfa: STRING>>>"
)


def parse_classify_response(df: DataFrame, xml_col: str = "xml") -> DataFrame:
    """Parse a real Classify response into ONE row per document with
    the Metadata-DTO nested shape (SURVEY.md §1.3):

      code       INT                      response status
      works      ARRAY<STRUCT<owi,title,author,editions,holdings>>
                 (single- and multi-work responses normalized)
      authors    ARRAY<STRUCT<name,lc,viaf>>
      subjects   ARRAY<STRUCT<stype,identifier,name,weight>>
                 FAST headings (weight=heldby) + DDC/LCC mostPopular
                 (weight=holdings, identifier=nsfa|sfa) — the
                 reference's `_parse_subject_tag` rules
                 (`/root/reference/oclc/classify.py:335-341`).

    Entirely column expressions (from_xml + higher-order functions);
    scales with the scan, no UDF.
    """
    parsed = df.withColumn("_doc", F.from_xml(F.col(xml_col), OCLC_RESPONSE_SCHEMA))
    d = F.col("_doc")

    def work_struct(w):
        return F.struct(
            w["_owi"].cast("bigint").alias("owi"),
            w["_title"].alias("title"),
            w["_author"].alias("author"),
            w["_editions"].alias("editions"),
            w["_holdings"].alias("holdings"),
        )

    single = F.when(
        d["work"].isNotNull(), F.array(work_struct(d["work"]))
    ).otherwise(F.array().cast(
        "array<struct<owi:bigint,title:string,author:string,"
        "editions:int,holdings:int>>"
    ))
    multi = F.coalesce(
        F.transform(d["works"]["work"], work_struct),
        F.array().cast(
            "array<struct<owi:bigint,title:string,author:string,"
            "editions:int,holdings:int>>"
        ),
    )
    authors = F.coalesce(
        F.transform(
            d["authors"]["author"],
            lambda a: F.struct(
                a["_VALUE"].alias("name"),
                a["_lc"].alias("lc"),
                a["_viaf"].alias("viaf"),
            ),
        ),
        F.array().cast("array<struct<name:string,lc:string,viaf:string>>"),
    )
    fast = F.coalesce(
        F.transform(
            d["recommendations"]["fast"]["headings"]["heading"],
            lambda h: F.struct(
                F.lit("FAST").alias("stype"),
                h["_ident"].alias("identifier"),
                h["_VALUE"].alias("name"),
                h["_heldby"].alias("weight"),
            ),
        ),
        F.array().cast(
            "array<struct<stype:string,identifier:string,"
            "name:string,weight:int>>"
        ),
    )

    def most_popular(kind: str, label: str):
        mp = d["recommendations"][kind]["mostPopular"]
        return F.when(
            mp.isNotNull(),
            F.array(F.struct(
                F.lit(label).alias("stype"),
                F.coalesce(mp["_nsfa"], mp["_sfa"]).alias("identifier"),
                F.lit(None).cast("string").alias("name"),
                mp["_holdings"].alias("weight"),
            )),
        ).otherwise(F.array().cast(
            "array<struct<stype:string,identifier:string,"
            "name:string,weight:int>>"
        ))

    keep = [c for c in df.columns if c != xml_col]
    return parsed.select(
        *keep,
        d["response"]["_code"].alias("code"),
        F.concat(single, multi).alias("works"),
        authors.alias("authors"),
        F.concat(fast, most_popular("ddc", "DDC"),
                 most_popular("lcc", "LCC")).alias("subjects"),
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
