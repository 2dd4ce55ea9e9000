"""Canonicalization cascade (SURVEY.md W5).

Reference: `/root/reference/canonicalize.py:131-193`
(`sort_name_from_services`: DB → OCLC Linked Data → VIAF-by-url →
VIAF-by-name → guessed fallback), `:301-326` (shortest-candidate
preference).

Spark design: the cascade over per-source columns is a single
`coalesce` (plus a matching CASE for provenance); shortest-candidate
is a deterministic (length, value) ordering — both pure expressions,
evaluated in one pass with no joins beyond what produced the source
columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def cascade(cols: list[tuple[str, Column]],
            fallback: Column) -> tuple[Column, Column]:
    """First non-null value across priority-ordered (source, column)
    pairs. Returns (value, source); source='guess' on fallback."""
    value = F.coalesce(*[c for _, c in cols], fallback)
    source = None
    for name, c in cols:
        cond = c.isNotNull()
        source = (F.when(cond, name) if source is None
                  else source.when(cond, name))
    return value, source.otherwise("guess")


def shortest_candidate(df: DataFrame, group_cols: list[str],
                       candidate_col: str) -> DataFrame:
    """Per group, the shortest candidate (ties break on value) — the
    reference's 'prefer the shortest plausible sort name'."""
    w = W.partitionBy(*group_cols).orderBy(
        F.length(candidate_col).asc(), F.col(candidate_col).asc()
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
