"""Name munging (SURVEY.md F4/F6/F8).

Reference: `/root/reference/viaf.py:104-123,639-644,698-704`
(display-name from sort-name / wikipedia name),
`/root/reference/canonicalize.py:45-86` (primary-author extraction
incl. " with " / " and " splits),
`/root/reference/oclc/classify.py:1205-1227` (NON_TITLE_SAFE strip),
`/root/reference/scripts.py:316` (NFKD normalization).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# F8: characters safe to send in an API title query.
NON_TITLE_SAFE = r"[^\w\-' ]"

# F6: Latin-1 diacritic folding table (the deterministic, codegen
# subset of NFKD; full NFKD of arbitrary Unicode would need a
# vectorized UDF — these cover the reference's VIAF/OCLC corpora).
_ACCENTED = "ÀÁÂÃÄÅàáâãäåÈÉÊËèéêëÌÍÎÏìíîïÒÓÔÕÖØòóôõöøÙÚÛÜùúûüÇçÑñÝýÿ"
_FOLDED = "AAAAAAaaaaaaEEEEeeeeIIIIiiiiOOOOOOooooooUUUUuuuuCcNnYyy"


def sort_name_to_display(col: Column) -> Column:
    """'Last, First' → 'First Last' (first comma splits; extra
    segments keep their order)."""
    parts = F.split(col, r",\s*", 2)
    return F.when(
        F.size(parts) == 2,
        F.concat_ws(" ", parts[1], parts[0]),
    ).otherwise(col)


def primary_author(col: Column) -> Column:
    """First author from a joined author field — the reference splits
    on ' with ' and ' and ' and keeps the head."""
    return F.trim(F.split(col, r"\s+with\s+|\s+and\s+", 2)[0])


def title_safe(col: Column) -> Column:
    """Strip characters unsafe for a title-query URL (F8)."""
    return F.regexp_replace(col, NON_TITLE_SAFE, "")


def strip_accents(col: Column) -> Column:
    """Fold Latin-1 diacritics to ASCII (the F6 normalization step
    before fingerprinting / fuzzy matching)."""
    return F.translate(col, _ACCENTED, _FOLDED)
