"""Pagination operator tests: keyset/offset equivalence and page
boundary behavior."""

from __future__ import annotations

from metadata_wrangler_spark.operators import pagination


def _table(spark, n=50):
    return spark.createDataFrame(
        [(i, f"row-{i}") for i in range(1, n + 1)], "id bigint, payload string"
    )


def test_keyset_page_contents(spark):
    df = _table(spark)
    page = pagination.keyset_page(df, "id", 10, 5)
    assert [r["id"] for r in page.collect()] == [11, 12, 13, 14, 15]


def test_keyset_equals_offset_for_dense_keys(spark):
    df = _table(spark)
    ks = {r["id"] for r in pagination.keyset_page(df, "id", 20, 7).collect()}
    off = {r["id"] for r in pagination.offset_page(df, "id", 20, 7).collect()}
    assert ks == off == set(range(21, 28))


def test_keyset_page_past_end_is_empty(spark):
    df = _table(spark)
    assert pagination.keyset_page(df, "id", 50, 10).count() == 0


def test_offset_page_first_page(spark):
    df = _table(spark)
    page = pagination.offset_page(df, "id", 0, 3)
    assert sorted(r["id"] for r in page.collect()) == [1, 2, 3]
    assert page.columns == ["id", "payload"]
