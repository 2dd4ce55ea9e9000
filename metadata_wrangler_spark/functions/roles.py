"""Role extraction and the stateful multi-author split
(SURVEY.md F2/F3).

Reference: `/root/reference/oclc/classify.py:360-394` (the
`[Role; Role]` suffix regex + 30-entry ROLE_MAPPING),
`:396-464` (`parse_multiple` — pipe-split with a default-role state
machine).

The state machine reduces to a closed form (derived from
`_default_role_transition`: no explicit role in the vocabulary maps
to Primary Author, so once ANY earlier segment carried explicit
roles the default is Unknown forever; before that it is Primary
Author for segment 1 and Author afterwards). Closed form ⇒ window
functions, no fold, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

ROLES_RE = r"\[([^\]]+)\]$"

PRIMARY_AUTHOR = "Primary Author"
AUTHOR = "Author"
UNKNOWN = "Unknown"

# Representative slice of the reference's 30-entry mapping
# (`oclc/classify.py:364-394`); same shape, same lookup semantics.
ROLE_MAPPING = {
    "Author": AUTHOR,
    "Creator": AUTHOR,
    "Author of screenplay": AUTHOR,
    "Translator": "Translator",
    "Illustrator": "Illustrator",
    "Editor": "Editor",
    "Editor of compilation": "Editor",
    "Narrator": "Narrator",
    "Composer": "Composer",
    "Film director": "Director",
    "Director": "Director",
    "Unknown": UNKNOWN,
    "Other": UNKNOWN,
}


def extract_role_suffix(col: Column) -> Column:
    """The bracketed role list at the end of a name, or ''."""
    return F.regexp_extract(col, ROLES_RE, 1)


def strip_role_suffix(col: Column) -> Column:
    return F.trim(F.regexp_replace(col, r"\s*" + ROLES_RE, ""))


def map_role(col: Column) -> Column:
    """Vocabulary lookup via a literal map (broadcast into codegen);
    unknown labels fall back to 'Unknown' like the reference."""
    entries = []
    for k, v in ROLE_MAPPING.items():
        entries.append(F.lit(k))
        entries.append(F.lit(v))
    m = F.create_map(*entries)
    return F.coalesce(m[col], F.lit(UNKNOWN))


def split_contributors(
    df: DataFrame, author_col: str, id_col: str
) -> DataFrame:
    """F3: pipe-split an author string into one row per contributor
    with the reference's default-role state machine applied.

    Output: (id, pos, name, roles_csv, explicit BOOLEAN).
    """
    seg = F.posexplode(F.split(F.col(author_col), r"\|")).alias("pos", "seg")
    base = df.select(F.col(id_col), seg).select(
        id_col, "pos",
        strip_role_suffix(F.col("seg")).alias("name"),
        extract_role_suffix(F.col("seg")).alias("role_suffix"),
    )
    explicit = F.col("role_suffix") != ""
    mapped = F.array_join(
        F.transform(
            F.split(F.col("role_suffix"), r";\s*"),
            lambda r: map_role(F.trim(r)),
        ), ";",
    )
    # Closed form of _default_role_transition: the default role is
    # Primary Author at pos 0, Author while no earlier segment had
    # explicit roles, Unknown afterwards.
    w = (
        W.partitionBy(id_col).orderBy("pos")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    any_explicit_before = F.coalesce(
        F.max(explicit.cast("int")).over(w), F.lit(0)
    ) == 1
    default_role = (
        F.when(F.col("pos") == 0, PRIMARY_AUTHOR)
        .when(any_explicit_before, UNKNOWN)
        .otherwise(AUTHOR)
    )
    return base.select(
        id_col, "pos", "name",
        F.when(explicit, mapped).otherwise(default_role).alias("roles_csv"),
        explicit.alias("explicit"),
    )
