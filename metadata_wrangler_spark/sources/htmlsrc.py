"""HTML scrape (SURVEY.md S5) — the Content Cafe pattern: pull typed
cell text out of a table-shaped page, drop known-bad titles.

Reference: `/root/reference/content_cafe.py:222-296` (review/
summary/excerpt table scrape), `:315-346` (title extraction),
`:129-131` (`KNOWN_BAD_TITLES` blacklist).

Spark design: class-tagged cells extracted with
`regexp_extract_all` — for the regular, machine-generated pages the
reference actually scrapes, an anchored regex is exact and stays in
codegen. (Arbitrary hand-written HTML would use a Pandas-UDF
parser; the reference's inputs are templated vendor pages.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KNOWN_BAD_TITLES = ["No title available.", "Unknown."]


def _cells(html_col, css_class: str):
    return F.regexp_extract_all(
        html_col,
        F.lit(f'<td class="{css_class}">([^<]*)</td>'),
        F.lit(1),
    )


def scrape_cells(
    df: DataFrame,
    html_col: str = "html",
    title_class: str = "title",
    review_class: str = "review",
) -> DataFrame:
    """(doc columns…, title, reviews ARRAY, n_reviews); titles on the
    known-bad blacklist null out (the reference skips them)."""
    keep = [c for c in df.columns if c != html_col]
    title = F.element_at(_cells(F.col(html_col), title_class), 1)
    good_title = F.when(
        ~title.isin(KNOWN_BAD_TITLES), title
    )
    reviews = _cells(F.col(html_col), review_class)
    return df.select(
        *keep,
        good_title.alias("title"),
        reviews.alias("reviews"),
        F.size(reviews).alias("n_reviews"),
    )
