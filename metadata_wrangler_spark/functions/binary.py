"""Binary column helpers (SURVEY.md F12/F14).

Reference: `/root/reference/content_cafe.py:123-125,308-313` (the
stand-in cover image is detected by comparing the first N payload
bytes against a known prefix), `/root/reference/controller.py:130-138`
(base64 bearer decode).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def has_prefix(payload: Column, prefix: bytes) -> Column:
    """True when the binary payload starts with ``prefix`` — pure
    substring compare on bytes, no decode."""
    return F.substring(payload, 1, len(prefix)) == F.lit(prefix)


def b64encode(col: Column) -> Column:
    return F.base64(col)


def b64decode(col: Column) -> Column:
    return F.unbase64(col)
