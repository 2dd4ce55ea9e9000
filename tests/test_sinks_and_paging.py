"""Tests for the sink layer (CSV round trip, OPDS render, image
mirror foreachPartition), the SOAP fan-out shape, and the remote
page loop."""

from __future__ import annotations

from pyspark.sql import functions as F

from metadata_wrangler_spark.sources import paging, sinks, soap


def test_csv_roundtrip_preserves_rows(spark, tmp_path):
    df = spark.createDataFrame(
        [("a", 1, 1.5), ("b", 2, 2.5)], "k string, n bigint, v double"
    )
    path = str(tmp_path / "report")
    sinks.write_csv_report(df, path)
    back = sinks.read_csv_report(
        spark, path, "k string, n bigint, v double"
    )
    assert sorted(tuple(r) for r in back.collect()) == \
        [("a", 1, 1.5), ("b", 2, 2.5)]


def test_opds_render_entry_shape(spark):
    df = spark.createDataFrame(
        [("urn:isbn:1", "A Book", "2024-02-01 00:00:00")],
        "urn string, title string, updated string",
    ).withColumn("updated", F.col("updated").cast("timestamp"))
    out = sinks.render_opds_entries(df, "urn", "title", "updated")
    assert out.collect()[0]["entry_xml"] == (
        "<entry><id>urn:isbn:1</id><title>A Book</title>"
        "<updated>2024-02-01T00:00:00Z</updated></entry>"
    )


def test_soap_demand_fanout_shape(spark):
    ids = spark.createDataFrame([(6,), (12,)], "identifier_id bigint")
    out = soap.demand_history(ids)
    rows = out.collect()
    assert len(rows) == 12          # 6 months per identifier
    got = {(r["identifier_id"], r["month_no"]): r["demand"] for r in rows}
    assert got[(6, 1)] == (6 * 31 + 1) % 97
    assert got[(12, 6)] == (12 * 31 + 6) % 97


def test_page_loop_stops_on_empty(spark):
    pages = {
        0: [(1,), (2,)],
        1: [(3,)],
        2: [],                      # empty page ends the loop
        3: [(99,)],                 # must never be fetched
    }
    fetched = []

    def fetch(n):
        fetched.append(n)
        return spark.createDataFrame(pages[n], "id bigint") if pages[n] \
            else spark.createDataFrame([], "id bigint")

    out = paging.fetch_all_pages(fetch, max_pages=10)
    assert sorted(r["id"] for r in out.collect()) == [1, 2, 3]
    assert fetched == [0, 1, 2]


def test_page_loop_respects_cap(spark):
    def fetch(n):
        return spark.createDataFrame([(n,)], "id bigint")

    out = paging.fetch_all_pages(fetch, max_pages=4)
    assert sorted(r["id"] for r in out.collect()) == [0, 1, 2, 3]


def test_mirror_images_calls_uploader_per_row(spark, tmp_path):
    df = spark.createDataFrame(
        [("u1", bytearray(b"img1")), ("u2", bytearray(b"img2"))],
        "url string, payload binary",
    )
    # foreachPartition runs on executors: collect calls via files
    outdir = tmp_path / "uploads"
    outdir.mkdir()

    def uploader(url, payload):
        (outdir / url).write_bytes(bytes(payload))

    n = sinks.mirror_images(df, "url", "payload", uploader)
    assert n == 2
    assert sorted(p.name for p in outdir.iterdir()) == ["u1", "u2"]
    assert (outdir / "u1").read_bytes() == b"img1"


def test_partitioned_layout_prunes_on_read(spark, tmp_path):
    from metadata_wrangler_spark.catalog import load

    docs = load(spark, "/root/testdata/sf0.001", "documents")
    path = str(tmp_path / "docs_by_lang")
    sinks.write_partitioned_layout(
        docs, path, partition_by=["lang"], sort_by=["doc_id"]
    )
    reread = spark.read.parquet(path)
    assert sorted(r["doc_id"] for r in reread.collect()) == sorted(
        r["doc_id"] for r in docs.collect()
    )
    # A lang filter must reach the scan as a PARTITION filter (whole
    # directories skipped), not a row-level data filter.
    q = reread.where(F.col("lang") == "en")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "(lang" in plan.split("PartitionFilters: [", 1)[1].split("]")[0]


def test_parse_rejects_captures_malformed_xml(spark):
    from metadata_wrangler_spark.sources import xmlsrc

    rows = spark.createDataFrame(
        [(1, "<classify><broken"), (2, "not xml at all"), (3, None),
         (4, '<classify><workList><work title="T" author="A" owi="9" '
             'editions="1" holdings="2"/></workList></classify>')],
        "id bigint, xml string",
    )
    parsed = xmlsrc.parse_classify(rows)
    rejects = xmlsrc.parse_rejects(rows, xmlsrc.CLASSIFY_SCHEMA)
    assert [r["id"] for r in parsed.collect()] == [4]
    assert sorted(r["id"] for r in rejects.collect()) == [1, 2]


def test_opds_updates_page_envelope_and_keyset(spark):
    """The feed-page render must carry the catalog size, the page's
    entries in keyset order, and a next-link cursor equal to the last
    rendered key (controller.py:464-552 semantics)."""
    import re

    from metadata_wrangler_spark import plans
    plans.load_all_plans()

    [row] = plans.QUERIES["s_opds_updates_page"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    xml = row.feed_xml
    assert xml.startswith('<feed xmlns="http://www.w3.org/2005/Atom"')
    assert (f"<opensearch:totalResults>{row.total_results}"
            "</opensearch:totalResults>") in xml
    ids = [int(m) for m in re.findall(r"urn:cust:(\d+)", xml)]
    assert ids == sorted(ids) and all(i > 20 and i % 40 == 0 for i in ids)
    assert int(row.next_cursor) == ids[-1]
    assert xml.endswith(f'<link rel="next" href="/updates?after='
                        f'{row.next_cursor}"/></feed>')
