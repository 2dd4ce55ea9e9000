"""N-Triples scan (SURVEY.md S6) — stream triple lines, regex-match
the (subject, predicate, object-literal) shape, keep one predicate.

Reference: `/root/reference/fast.py:22,62-104` (line regex over
`.nt.gz`/`.nt.zip` FAST dumps, extracting (fast_id, name) pairs;
`:36-60` writes a consolidated cache on first run — here that's
"write parquet once").

Spark design: `spark.read.text` (splittable, parallel over files)
→ one `regexp_extract` per field → filter. Comment lines and other
predicates drop out by regex non-match. Pure codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# <subject-uri> <predicate-uri> "literal" .
TRIPLE_RE = r'^<([^>]+)>\s+<([^>]+)>\s+"([^"]*)"\s*\.$'


def parse_lines(
    lines: DataFrame,
    line_col: str = "value",
    predicate: str | None = None,
    subject_re: str | None = None,
) -> DataFrame:
    """(subject, predicate, obj) rows from raw triple lines.

    ``predicate`` filters to one predicate URI; ``subject_re``
    additionally extracts an id from the subject (e.g. the FAST id
    tail) into ``subject_id``.
    """
    out = lines.select(
        F.regexp_extract(F.col(line_col), TRIPLE_RE, 1).alias("subject"),
        F.regexp_extract(F.col(line_col), TRIPLE_RE, 2).alias("predicate"),
        F.regexp_extract(F.col(line_col), TRIPLE_RE, 3).alias("obj"),
    ).where(F.col("subject") != "")
    if predicate is not None:
        out = out.where(F.col("predicate") == predicate)
    if subject_re is not None:
        out = out.withColumn(
            "subject_id", F.regexp_extract(F.col("subject"), subject_re, 1)
        )
    return out
