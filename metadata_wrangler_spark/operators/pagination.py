"""Pagination operators.

The reference paginates with OFFSET/LIMIT loops
(`/root/reference/controller.py:429,675-678`,
`/root/reference/scripts.py:85-96,159-167`) — an anti-pattern at
scale because every page re-sorts and re-skips the whole prefix.
The engine provides both:

  offset_page  row_number window slice — API parity with the
               reference's `Pagination.modify_database_query`; keep
               it in the serving layer only.
  keyset_page  seek-method pagination: WHERE key > last_seen ORDER BY
               key LIMIT n. The predicate pushes down to the scan
               (partition pruning on a sorted/bucketed layout) and
               the limit is a TakeOrdered — no global sort, no
               prefix re-read, constant cost per page at any offset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def keyset_page(
    df: DataFrame,
    key: str,
    last_seen,
    size: int,
) -> DataFrame:
    """One page after ``last_seen`` in ``key`` order.

    ``key`` must be unique (use a composite surrogate otherwise).
    The filter reaches the parquet scan as a pushed predicate, so at
    100 TB each page reads only the row groups beyond the cursor.
    """
    out = df.where(F.col(key) > F.lit(last_seen)).orderBy(F.asc(key))
    return out.limit(size)


def offset_page(df: DataFrame, key: str, offset: int, size: int) -> DataFrame:
    """OFFSET/LIMIT emulation via a deterministic row_number slice.

    Single-partition window — serving-layer only; prefer
    ``keyset_page`` everywhere else.
    """
    rn = F.row_number().over(W.orderBy(F.asc(key)))
    return (
        df.withColumn("_rn", rn)
        .where(F.col("_rn").between(offset + 1, offset + size))
        .drop("_rn")
    )
