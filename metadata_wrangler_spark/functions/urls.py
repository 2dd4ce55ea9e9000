"""Table-driven URL classification (SURVEY.md F10).

Reference: `/root/reference/oclc/linked_data.py:96-104,142-147`
(URI_WITH_OCLC_NUMBER / URI_WITH_ISBN / internal lookup),
`/root/reference/canonicalize.py:37,332-335` (VIAF url detection).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (kind, extraction regex) — first match wins, like the reference's
# ordered checks.
URL_PATTERNS = [
    ("oclc_work", r"^https?://(?:www\.)?worldcat\.org/oclc/([0-9]+)$"),
    ("viaf", r"^https?://viaf\.org/viaf/([0-9]+)$"),
    ("isbn", r"^urn:isbn:([0-9Xx]+)$"),
    ("person", r"^https?://[^/]+/person/([0-9]+)$"),
]


def classify_url(col: Column) -> tuple[Column, Column]:
    """Returns (kind, extracted_id); kind='other', id NULL when no
    pattern matches."""
    kind = None
    ident = None
    for name, pattern in URL_PATTERNS:
        m = F.regexp_extract(col, pattern, 1)
        hit = m != ""
        kind = F.when(hit, name) if kind is None else kind.when(hit, name)
        ident = F.when(hit, m) if ident is None else ident.when(hit, m)
    return kind.otherwise("other"), ident.otherwise(F.lit(None))
