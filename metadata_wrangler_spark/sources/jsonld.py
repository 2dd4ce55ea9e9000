"""JSON-LD graph parsing (SURVEY.md S4) — the `ldq` family:
extract @graph, filter nodes by @type, pull language-restricted
values.

Reference: `/root/reference/oclc/linked_data.py:45-89`
(`ldq.for_type` / `restrict_to_language` / `values`), `:317-330`
(graph extraction), `:332-365` (typed-node walks).

Spark design: `from_json` to a typed ARRAY<STRUCT>, then
higher-order `filter`/`transform` — the JSON-LD value plumbing
(string | dict | list in the reference) becomes uniform
ARRAY<STRUCT<@language,@value>> handling, all JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GRAPH_SCHEMA = (
    "graph ARRAY<STRUCT<"
    "id: STRING, type: STRING, "
    "name: ARRAY<STRUCT<language: STRING, value: STRING>>>>"
)


def for_type(graph_col, type_name: str):
    """ldq.for_type: nodes of a given @type from a parsed graph."""
    return F.filter(graph_col, lambda n: n["type"] == F.lit(type_name))


def values_in_language(names_col, language: str):
    """ldq.restrict_to_language + values: the @value strings tagged
    with the given @language."""
    return F.transform(
        F.filter(names_col, lambda v: v["language"] == F.lit(language)),
        lambda v: v["value"],
    )


def parse_typed_names(
    df: DataFrame,
    json_col: str = "jsonld",
    type_name: str = "Person",
    language: str = "en",
) -> DataFrame:
    """One row per node of ``type_name``: (doc columns…, node_id,
    name) with the name restricted to ``language``."""
    parsed = df.withColumn("_doc", F.from_json(F.col(json_col), GRAPH_SCHEMA))
    keep = [c for c in df.columns if c != json_col]
    node = F.explode(for_type(F.col("_doc.graph"), type_name)).alias("node")
    return parsed.select(*keep, node).select(
        *keep,
        F.col("node.id").alias("node_id"),
        F.try_element_at(
            values_in_language(F.col("node.name"), language), F.lit(1)
        ).alias("name"),
    )
