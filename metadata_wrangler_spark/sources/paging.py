"""Remote page loop (SURVEY.md W6) — driver-side pagination of a
remote source until an empty page or the page cap.

Reference: `/root/reference/viaf.py:869-905` (VIAF SRU search:
10 records per page, at most 50 pages).

This is deliberately a DRIVER loop: the remote source dictates the
cursor protocol, so the loop stays out of the distributed plan; each
page's parse/merge is set-oriented. The accumulated result is a
unionByName of per-page DataFrames (bounded by max_pages, so plan
depth is bounded too).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


def fetch_all_pages(
    fetch_page: Callable[[int], DataFrame | None],
    max_pages: int = 50,
) -> DataFrame | None:
    """Union pages 0..n until ``fetch_page`` returns None/empty or
    the cap is hit. ``fetch_page(i)`` returns a DataFrame of page i.

    The emptiness probe per page is the price of a remote cursor
    protocol (the reference pays the same per-page round trip).
    """
    out: DataFrame | None = None
    for page_no in range(max_pages):
        page = fetch_page(page_no)
        if page is None or page.isEmpty():
            break
        out = page if out is None else out.unionByName(page)
    return out
