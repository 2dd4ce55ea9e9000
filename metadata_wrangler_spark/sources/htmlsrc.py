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


# The REAL Content Cafe page shape (fixtures at
# /root/reference/tests/files/content_cafe/): title in
# <span class="PageHeader2">, list resources = each
# <td class="SectionHeader"> row's FOLLOWING row's first cell
# (`_scrape_list`, `/root/reference/content_cafe.py:315-327`),
# single resource = Table_Main's first row's cell (`_scrape_one`,
# `:329-335`), title blacklist (`:341-346`).
_TITLE_RE = r'<span[^>]*class="PageHeader2"[^>]*>([^<]*)</span>'
_SECTION_RE = (
    r'(?s)<td[^>]*class="SectionHeader"[^>]*>[^<]*</td>\s*</tr>'
    r"\s*<tr[^>]*>\s*<td[^>]*>(.*?)</td>"
)
_FIRST_TD_RE = (
    r'(?s)<table[^>]*id="Table_Main"[^>]*>\s*<tr[^>]*>\s*'
    r"<td[^>]*>(.*?)</td>"
)


def scrape_content_cafe(
    df: DataFrame,
    html_col: str = "html",
    missing_phrase: str | None = None,
) -> DataFrame:
    """(doc columns…, title, sections ARRAY<STRING>, first_content)
    from a Content Cafe web page.

    ``missing_phrase`` mirrors `phrase_indicating_missing_data`
    (`content_cafe.py:236-241`): pages containing it yield no
    resources. Titles on KNOWN_BAD_TITLES null out. Whitespace-only
    and duplicate sections are dropped, matching the reference's
    strip/already_seen loop (`:254-266`).
    """
    keep = [c for c in df.columns if c != html_col]
    h = F.col(html_col)
    title = F.regexp_extract(h, _TITLE_RE, 1)
    good_title = F.when(
        (title != "") & ~title.isin(KNOWN_BAD_TITLES), title
    )
    sections = F.array_distinct(
        F.filter(
            F.transform(
                F.regexp_extract_all(h, F.lit(_SECTION_RE), F.lit(1)),
                lambda s: F.trim(s),
            ),
            lambda s: (s != "") & (s != "&nbsp;"),
        )
    )
    first = F.regexp_extract(h, _FIRST_TD_RE, 1)
    if missing_phrase is not None:
        present = ~h.contains(missing_phrase)
        sections = F.when(present, sections).otherwise(
            F.array().cast("array<string>")
        )
        first = F.when(present, first)
    return df.select(
        *keep,
        good_title.alias("title"),
        sections.alias("sections"),
        F.when(F.trim(first) != "", F.trim(first)).alias("first_content"),
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
