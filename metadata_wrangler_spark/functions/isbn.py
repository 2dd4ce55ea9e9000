"""ISBN checksum math as reusable column expressions (SURVEY.md F7).

Reference behavior: `/root/reference/oclc/linked_data.py:693-702`
(isbnlib to_isbn13), `/root/reference/monitor.py:92-95`. Here the
checksum is built-in expression arithmetic — JVM codegen, no Python
UDF in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _digit(col: Column, i: int) -> Column:
    return F.substring(col, i, 1).cast("int")


def isbn10_check_digit(body9: Column) -> Column:
    """Check digit (0-10; 10 renders as 'X') for a 9-digit body."""
    s = sum(((11 - i) * _digit(body9, i) for i in range(2, 10)),
            start=10 * _digit(body9, 1))
    return (11 - (s % 11)) % 11


def isbn10_to_13(isbn10: Column) -> Column:
    """ISBN-13 for an ISBN-10 column (any valid final digit/X —
    only the 9-digit body feeds the new checksum)."""
    body12 = F.concat(F.lit("978"), F.substring(isbn10, 1, 9))
    s = sum(((3 if i % 2 == 0 else 1) * _digit(body12, i)
             for i in range(2, 13)),
            start=_digit(body12, 1))
    cd13 = (10 - (s % 10)) % 10
    return F.concat(body12, cd13.cast("string"))
