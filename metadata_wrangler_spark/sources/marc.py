"""MARC-in-JSON parsing (SURVEY.md S7) — the Shadowcat `varFields`
tag routing: title from 245, author from 100, ISBN from 020,
subjects from 650.

Reference: `/root/reference/shadow_catalog.py:127-148` (MarcTag
wrapper), `:200-321` (per-tag field routing into Metadata).

Spark design: `from_json` → explode(varFields) → conditional
aggregation per tag (`first` under a tag filter / collect for
repeatable tags). One shuffle keyed by the document id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

VARFIELDS_SCHEMA = (
    "varFields ARRAY<STRUCT<"
    "marcTag: STRING, "
    "subfields: ARRAY<STRUCT<tag: STRING, content: STRING>>>>"
)


def _subfield(field_col, tag: str):
    """content of the first subfield with the given tag."""
    return F.try_element_at(
        F.transform(
            F.filter(field_col["subfields"], lambda s: s["tag"] == F.lit(tag)),
            lambda s: s["content"],
        ),
        F.lit(1),
    )


def parse_varfields(df: DataFrame, json_col: str = "marc",
                    id_cols: list[str] | None = None) -> DataFrame:
    """Route varFields tags to typed columns: (id…, title, author,
    isbn, subjects ARRAY sorted, n_subjects)."""
    id_cols = id_cols or [c for c in df.columns if c != json_col]
    parsed = df.withColumn(
        "_doc", F.from_json(F.col(json_col), VARFIELDS_SCHEMA)
    )
    fields = F.col("_doc.varFields")

    def first_for_tag(marc_tag: str):
        return F.try_element_at(
            F.transform(
                F.filter(fields, lambda fld: fld["marcTag"] == F.lit(marc_tag)),
                lambda fld: _subfield(fld, "a"),
            ),
            F.lit(1),
        )

    subjects = F.array_sort(
        F.transform(
            F.filter(fields, lambda fld: fld["marcTag"] == F.lit("650")),
            lambda fld: _subfield(fld, "a"),
        )
    )
    return parsed.select(
        *id_cols,
        first_for_tag("245").alias("title"),
        first_for_tag("100").alias("author"),
        first_for_tag("020").alias("isbn"),
        subjects.alias("subjects"),
        F.size(subjects).alias("n_subjects"),
    )
