"""Golden-fixture parser tests — the reference's test style
(`/root/reference/tests/files/` corpus): hand-written documents in,
field-level assertions out."""

from __future__ import annotations

from pyspark.sql import functions as F

from metadata_wrangler_spark.sources import (
    htmlsrc,
    http_cache,
    jsonld,
    marc,
    ntriples,
    opds,
    xmlsrc,
)

MULTI_WORK_XML = (
    '<classify><workList>'
    '<work title="Moby Dick" author="Melville, Herman" owi="11" '
    'editions="5" holdings="100"/>'
    '<work title="Moby Dick; or, The Whale" author="Melville, Herman" '
    'owi="12" editions="2" holdings="40"/>'
    '</workList></classify>'
)

NOT_FOUND_XML = "<classify><response code='102'/></classify>"


def test_classify_xml_multi_work(spark):
    df = spark.createDataFrame([(1, MULTI_WORK_XML)], "doc_id int, xml string")
    out = xmlsrc.parse_classify(df).orderBy("owi").collect()
    assert [(r["owi"], r["title"], r["editions"], r["holdings"])
            for r in out] == [
        (11, "Moby Dick", 5, 100),
        (12, "Moby Dick; or, The Whale", 2, 40),
    ]
    assert out[0]["author"] == "Melville, Herman"


def test_classify_xml_not_found_yields_no_rows(spark):
    df = spark.createDataFrame([(1, NOT_FOUND_XML)], "doc_id int, xml string")
    assert xmlsrc.parse_classify(df).count() == 0


JSONLD_DOC = """
{"graph": [
  {"id": "person/9", "type": "Person",
   "name": [{"language": "fr", "value": "Jules Verne (fr)"},
            {"language": "en", "value": "Jules Verne"}]},
  {"id": "place/3", "type": "Place",
   "name": [{"language": "en", "value": "Nantes"}]}
]}
"""


def test_jsonld_type_filter_and_language_restriction(spark):
    df = spark.createDataFrame([(1, JSONLD_DOC)], "doc_id int, jsonld string")
    out = jsonld.parse_typed_names(df, type_name="Person", language="en")
    assert [(r["node_id"], r["name"]) for r in out.collect()] == [
        ("person/9", "Jules Verne")
    ]
    places = jsonld.parse_typed_names(df, type_name="Place", language="en")
    assert [(r["node_id"], r["name"]) for r in places.collect()] == [
        ("place/3", "Nantes")
    ]


MARC_DOC = """
{"varFields": [
  {"marcTag": "245", "subfields": [{"tag": "a", "content": "The Title"}]},
  {"marcTag": "100", "subfields": [{"tag": "a", "content": "Author, A."}]},
  {"marcTag": "650", "subfields": [{"tag": "a", "content": "Whaling"}]},
  {"marcTag": "650", "subfields": [{"tag": "a", "content": "Adventure"}]},
  {"marcTag": "999", "subfields": [{"tag": "a", "content": "ignored"}]}
]}
"""


def test_marc_tag_routing(spark):
    df = spark.createDataFrame([(7, MARC_DOC)], "doc_id int, marc string")
    r = marc.parse_varfields(df, "marc", ["doc_id"]).collect()[0]
    assert r["title"] == "The Title"
    assert r["author"] == "Author, A."
    assert r["isbn"] is None          # no 020 in this record
    assert r["subjects"] == ["Adventure", "Whaling"]   # sorted
    assert r["n_subjects"] == 2


NT_LINES = [
    '<http://id.worldcat.org/fast/801923> <http://schema.org/name> "Whales" .',
    "# a comment line",
    '<http://id.worldcat.org/fast/801923> <http://schema.org/sameAs> "x" .',
    'malformed line without triples',
    '<http://id.worldcat.org/fast/5> <http://schema.org/name> "Ships" .',
]


def test_ntriples_predicate_filter_and_noise(spark):
    df = spark.createDataFrame([(s,) for s in NT_LINES], "value string")
    out = ntriples.parse_lines(
        df, predicate="http://schema.org/name", subject_re=r"fast/([0-9]+)$"
    )
    got = sorted((r["subject_id"], r["obj"]) for r in out.collect())
    assert got == [("5", "Ships"), ("801923", "Whales")]


HTML_DOC = (
    '<html><body><table>'
    '<tr><td class="title">No title available.</td></tr>'
    '<tr><td class="review">Great book</td></tr>'
    '<tr><td class="review">Meh</td></tr>'
    '</table></body></html>'
)


def test_html_bad_title_blacklist(spark):
    df = spark.createDataFrame([(1, HTML_DOC)], "doc_id int, html string")
    r = htmlsrc.scrape_cells(df).collect()[0]
    assert r["title"] is None
    assert r["reviews"] == ["Great book", "Meh"]
    assert r["n_reviews"] == 2


OPDS_DOC = (
    "<feed>"
    "<entry><id>urn:isbn:9781</id><title>Book One</title>"
    "<updated>2024-02-03T04:05:06Z</updated></entry>"
    "<entry><id>urn:isbn:9782</id><title>Book Two</title>"
    "<updated>2024-02-04T00:00:00Z</updated></entry>"
    "</feed>"
)


def test_opds_feed_entries(spark):
    df = spark.createDataFrame([(1, OPDS_DOC)], "doc_id int, feed string")
    out = opds.parse_feed(df).orderBy("urn").collect()
    assert [(r["urn"], r["title"]) for r in out] == [
        ("urn:isbn:9781", "Book One"), ("urn:isbn:9782", "Book Two"),
    ]
    assert str(out[0]["updated"]) == "2024-02-03 04:05:06"


def test_cached_get_fresh_stale_missing(spark):
    requests = spark.createDataFrame(
        [("u1",), ("u2",), ("u3",)], "url string"
    )
    cache = spark.createDataFrame(
        [("u1", "cached:u1", "2024-01-10 00:00:00"),   # fresh
         ("u2", "cached:u2", "2023-01-01 00:00:00")],  # stale
        "url string, content string, fetched_at string",
    ).withColumn("fetched_at", F.col("fetched_at").cast("timestamp"))
    out = http_cache.cached_get(
        requests, cache, now="2024-01-15 00:00:00",
        max_age_seconds=30 * 24 * 3600,
    )
    got = {r["url"]: (r["content"], r["source"]) for r in out.collect()}
    assert got == {
        "u1": ("cached:u1", "cache"),
        "u2": ("fetched:u2", "fetch"),
        "u3": ("fetched:u3", "fetch"),
    }
