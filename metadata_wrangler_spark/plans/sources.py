"""Source/parser plans (SURVEY.md §2.1 S1, S3-S8) — round-trip
obligations: serialize documents deterministically from the base
tables, parse them with the real parser, and let the oracle
recompute the expected rows directly from the base tables. A parser
bug (or serializer bug) breaks the hash match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from metadata_wrangler_spark.catalog import load
from metadata_wrangler_spark.plans import register
from metadata_wrangler_spark.sources import (
    htmlsrc,
    http_cache,
    jsonld,
    marc,
    ntriples,
    opds,
    xmlsrc,
)


# ---------------------------------------------------------------------------
# S3 — XML (OCLC Classify shape)
# ---------------------------------------------------------------------------

@register(
    "s_xml_classify",
    oracle="""
    SELECT p_partkey,
           CAST(p_partkey * 10 + i AS BIGINT) AS owi,
           p_name AS title,
           p_type AS author,
           CAST(p_size AS INT) AS editions,
           CAST(p_partkey % 100 + 1 AS INT) AS holdings
    FROM (
        SELECT p_partkey, p_name, p_type, p_size,
               unnest(generate_series(0, p_partkey % 3)) AS i
        FROM part WHERE p_partkey % 7 = 0
          AND p_name IS NOT NULL  -- no title = no source record
    ) t
    """,
)
def s_xml_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3: OCLC-Classify-style XML → one row per <work> element.

    Reference: `oclc/classify.py:68-128,253-341` (multi-work
    response, per-work attribute extraction). The XML is serialized
    from `part` rows, parsed with sources.xmlsrc (from_xml +
    explode); the oracle recomputes the rows directly.
    """
    p = load(spark, sf_dir, "part").where(
        (F.col("p_partkey") % 7 == 0)
        # no title = no source record to serialize (a NULL field
        # would NULL the whole concat-built payload anyway — the
        # dead-letter path, exercised in parse_rejects)
        & F.col("p_name").isNotNull()
    )
    docs = p.select(
        "p_partkey",
        xmlsrc.build_classify_xml(
            title=F.col("p_name"),
            author=F.col("p_type"),
            owi=(F.col("p_partkey") * 10),
            editions=F.col("p_size"),
            holdings=(F.col("p_partkey") % 100 + 1),
            n_works=(F.col("p_partkey") % 3 + 1),
        ).alias("xml"),
    )
    return xmlsrc.parse_classify(docs).select(
        "p_partkey", "owi", "title", "author",
        F.col("editions").cast("int").alias("editions"),
        F.col("holdings").cast("int").alias("holdings"),
    )


@register(
    "s_xml_classify_response",
    oracle="""
    WITH base AS (
        SELECT p_partkey, p_name, p_type, p_brand, p_size
        FROM part WHERE p_partkey % 5 = 0
          AND p_name IS NOT NULL  -- no title = no source record
    )
    SELECT p_partkey, 2 AS code, 1 AS n_works,
           'FAST' AS stype,
           CAST(p_partkey % 1000 AS VARCHAR) AS identifier,
           p_name AS sname, CAST(p_size AS INT) AS weight
    FROM base WHERE p_partkey % 2 = 0
    UNION ALL
    SELECT p_partkey, 2, 1, 'DDC', p_brand, NULL, CAST(p_size * 2 AS INT)
    FROM base WHERE p_partkey % 2 = 0
    UNION ALL
    SELECT p_partkey, 2, 1, 'LCC', p_type, NULL, CAST(p_size * 3 AS INT)
    FROM base WHERE p_partkey % 2 = 0
    UNION ALL
    SELECT p_partkey, 4, 2, NULL, NULL, NULL, NULL
    FROM base WHERE p_partkey % 2 = 1
    """,
)
def s_xml_classify_response(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3 on the REAL Classify response shape: namespaced document,
    `<response code>` dispatch (2 = single work + authors +
    recommendations, 4 = `<works>` list), FAST heldby/ident vs
    DDC/LCC holdings with nsfa-over-sfa identifier precedence.

    Reference: `/root/reference/oclc/classify.py:54-60` (codes),
    `:253-341` (subject extraction rules); fixture shape at
    `/root/reference/tests/files/oclc_classify/`. Golden-file tests
    for the same parser: tests/test_classify_golden.py.
    """
    p = load(spark, sf_dir, "part").where(
        (F.col("p_partkey") % 5 == 0)
        & F.col("p_name").isNotNull()  # no title = no source record
    )
    key = F.col("p_partkey").cast("string")
    single = F.concat(
        F.lit('<classify xmlns="http://classify.oclc.org">'
              '<response code="2"/>'),
        F.lit('<work author="'), F.col("p_type"),
        F.lit('" editions="7" holdings="'),
        F.col("p_size").cast("string"),
        F.lit('" owi="'), key, F.lit('" title="'), F.col("p_name"),
        F.lit('"/><authors><author lc="n1" viaf="v'), key,
        F.lit('">'), F.col("p_type"), F.lit("</author></authors>"),
        F.lit("<recommendations><fast><headings>"
              '<heading heldby="'),
        F.col("p_size").cast("string"),
        F.lit('" ident="'), (F.col("p_partkey") % 1000).cast("string"),
        F.lit('" src="fast">'), F.col("p_name"),
        F.lit("</heading></headings></fast>"
              '<ddc><mostPopular holdings="'),
        (F.col("p_size") * 2).cast("string"),
        F.lit('" nsfa="'), F.col("p_brand"),
        F.lit('" sfa="IGNORED"/></ddc>'
              '<lcc><mostPopular holdings="'),
        (F.col("p_size") * 3).cast("string"),
        F.lit('" sfa="'), F.col("p_type"),
        F.lit('"/></lcc></recommendations></classify>'),
    )
    multi = F.concat(
        F.lit('<classify xmlns="http://classify.oclc.org">'
              '<response code="4"/><works>'),
        F.lit('<work author="'), F.col("p_type"),
        F.lit('" editions="1" holdings="1" owi="'), key,
        F.lit('" title="'), F.col("p_name"), F.lit('"/>'),
        F.lit('<work author="'), F.col("p_type"),
        F.lit('" editions="2" holdings="2" owi="'), (key + 1),
        F.lit('" title="'), F.col("p_name"),
        F.lit('"/></works></classify>'),
    )
    docs = p.select(
        "p_partkey",
        F.when(F.col("p_partkey") % 2 == 0, single)
        .otherwise(multi).alias("xml"),
    )
    parsed = xmlsrc.parse_classify_response(docs)
    return parsed.select(
        "p_partkey", "code",
        F.size("works").alias("n_works"),
        F.explode_outer("subjects").alias("s"),
    ).select(
        "p_partkey", "code", "n_works",
        F.col("s.stype").alias("stype"),
        F.col("s.identifier").alias("identifier"),
        F.col("s.name").alias("sname"),
        F.col("s.weight").cast("int").alias("weight"),
    )


@register(
    "s_viaf_cluster",
    oracle="""
    WITH base AS (
        SELECT c_custkey, c_name FROM customer WHERE c_custkey % 6 = 0
          AND c_name IS NOT NULL  -- no heading = no cluster record
    )
    SELECT c_custkey, CAST(c_custkey AS VARCHAR) AS viaf_id,
           3 AS n_names,
           CASE WHEN c_custkey % 2 = 0
                THEN 'W_' || CAST(c_custkey AS VARCHAR)
                ELSE NULL END AS wikipedia_name,
           c_name AS top_name
    FROM base
    UNION ALL
    SELECT c_custkey, NULL, 1, NULL, NULL FROM base
    """,
)
def s_viaf_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3 (VIAF half): SRU multi-cluster response → per-cluster rows
    with viafID, mainHeadings sort-name vote, and WKP-source
    wikipedia name (Wikidata ids excluded).

    Reference: `viaf.py:479-539` (cluster walk, local-name
    matching), `:522-539` (wikipedia/sort-name rules). Golden-file
    tests on the reference's own fixtures:
    tests/test_viaf_golden.py. Each document carries one full
    cluster (3 heading texts; the comma-stripped duplicate must win
    the vote) and one anonymous cluster (no viafID — viaf_id NULL,
    no vote row).
    """
    from metadata_wrangler_spark.sources import viafsrc

    c = load(spark, sf_dir, "customer").where(
        (F.col("c_custkey") % 6 == 0)
        & F.col("c_name").isNotNull()  # no heading = no cluster record
    )
    key = F.col("c_custkey").cast("string")
    wkp = F.when(
        F.col("c_custkey") % 2 == 0, F.concat(F.lit("WKP|W_"), key)
    ).otherwise(F.lit("WKP|Q999"))
    docs = c.select(
        "c_custkey",
        F.concat(
            F.lit("<sru><ns2:VIAFCluster><ns2:viafID>"), key,
            F.lit("</ns2:viafID><ns2:mainHeadings><ns2:data><ns2:text>"),
            F.col("c_name"), F.lit(","),
            F.lit("</ns2:text></ns2:data><ns2:data><ns2:text>"),
            F.col("c_name"),
            F.lit("</ns2:text></ns2:data><ns2:data><ns2:text>Z-"),
            F.col("c_name"),
            F.lit("</ns2:text></ns2:data></ns2:mainHeadings>"
                  "<ns2:sources><ns2:source>"),
            wkp,
            F.lit("</ns2:source></ns2:sources></ns2:VIAFCluster>"
                  "<ns2:VIAFCluster><ns2:mainHeadings><ns2:data>"
                  "<ns2:text>Anonymous</ns2:text></ns2:data>"
                  "</ns2:mainHeadings></ns2:VIAFCluster></sru>"),
        ).alias("xml"),
    )
    clusters = viafsrc.parse_viaf_clusters(docs)
    top = viafsrc.top_sort_name(
        clusters.where(F.col("viaf_id").isNotNull())
    ).select("viaf_id", F.col("sort_name").alias("top_name"))
    return clusters.join(top, "viaf_id", "left").select(
        "c_custkey", "viaf_id",
        F.size("sort_names").alias("n_names"),
        "wikipedia_name", "top_name",
    )


@register(
    "s_jsonld_contributor",
    oracle="""
    SELECT c_custkey,
           'person/' || CAST(c_custkey AS VARCHAR) AS node_id,
           c_name || ' extended' AS display_name,
           'X' || c_name AS family_name,
           CAST(1900 + c_custkey % 100 AS VARCHAR) AS birth_year
    FROM customer WHERE c_custkey % 9 = 0
      AND c_name IS NOT NULL  -- no name = no person record
    """,
)
def s_jsonld_contributor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 on the REAL person-entity shape: polymorphic name field
    (non-en dict dropped, en dict + plain string voted, longest tie
    wins), typed-node filter past a Book node, birth-year extract —
    via the VariantType extractor.

    Reference: `oclc/linked_data.py:368-435` (extract_contributor),
    `:437-471` (best-name vote). Golden-file tests on the
    reference's own fixtures: tests/test_jsonld_golden.py.
    """
    from metadata_wrangler_spark.sources import jsonld

    c = load(spark, sf_dir, "customer").where(
        (F.col("c_custkey") % 9 == 0)
        & F.col("c_name").isNotNull()  # no name = no person record
    )
    key = F.col("c_custkey").cast("string")
    doc = F.concat(
        F.lit('{"@graph":[{"@id":"book/'), key,
        F.lit('","@type":"schema:Book"},{"@id":"person/'), key,
        F.lit('","@type":"schema:Person","name":['
              '{"@language":"no-no","@value":"skip me"},'
              '{"@language":"en","@value":"'),
        F.col("c_name"),
        F.lit(' extended"},"'), F.col("c_name"),
        F.lit(',"],"familyName":"X'), F.col("c_name"),
        F.lit('","birthDate":"'),
        (F.lit(1900) + F.col("c_custkey") % 100).cast("string"),
        F.lit('-05-22"}]}'),
    )
    docs = c.select("c_custkey", doc.alias("jsonld"))
    return jsonld.extract_contributors(docs).select(
        "c_custkey", "node_id", "display_name", "family_name", "birth_year"
    )


# ---------------------------------------------------------------------------
# S4 — JSON-LD graph
# ---------------------------------------------------------------------------

@register(
    "s_jsonld_graph",
    oracle="""
    SELECT c_custkey,
           'person/' || CAST(c_custkey AS VARCHAR) AS node_id,
           c_name AS name
    FROM customer WHERE c_custkey % 4 = 0
      AND c_name IS NOT NULL  -- no name = no node payload
    """,
)
def s_jsonld_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4/F11: JSON-LD @graph parse — typed-node filter +
    language-restricted value pull (the `ldq` family).

    Reference: `oclc/linked_data.py:45-89,317-330`. Each document
    carries a Person node (en + fr names) and a Place node; the
    parser must keep only Person nodes and the English value.
    """
    c = load(spark, sf_dir, "customer").where(
        (F.col("c_custkey") % 4 == 0)
        & F.col("c_name").isNotNull()  # no name = no node payload
    )
    n = load(spark, sf_dir, "nation")
    docs = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).select(
        "c_custkey",
        F.concat(
            F.lit('{"graph":[{"id":"person/'),
            F.col("c_custkey").cast("string"),
            F.lit('","type":"Person","name":['
                  '{"language":"en","value":"'),
            F.col("c_name"),
            F.lit('"},{"language":"fr","value":"fr-'),
            F.col("c_name"),
            F.lit('"}]},{"id":"place/'),
            F.col("n_nationkey").cast("string"),
            F.lit('","type":"Place","name":['
                  '{"language":"en","value":"'),
            F.col("n_name"),
            F.lit('"}]}]}'),
        ).alias("jsonld"),
    )
    return jsonld.parse_typed_names(
        docs, "jsonld", type_name="Person", language="en"
    )


# ---------------------------------------------------------------------------
# S7 — MARC-in-JSON
# ---------------------------------------------------------------------------

@register(
    "s_marc_json",
    oracle="""
    SELECT p_partkey,
           p_name AS title,
           p_type AS author,
           'isbn-' || CAST(p_partkey AS VARCHAR) AS isbn,
           CASE WHEN p_brand <= 'SZ-' || CAST(p_size AS VARCHAR)
                THEN p_brand || ',' || 'SZ-' || CAST(p_size AS VARCHAR)
                ELSE 'SZ-' || CAST(p_size AS VARCHAR) || ',' || p_brand END AS subjects_csv,
           2 AS n_subjects
    FROM part WHERE p_partkey % 5 = 0
    """,
)
def s_marc_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7: MARC varFields tag routing — 245→title, 100→author,
    020→isbn, repeated 650→sorted subjects.

    Reference: `shadow_catalog.py:127-148,200-321`.
    """
    p = load(spark, sf_dir, "part").where(F.col("p_partkey") % 5 == 0)

    def fld(tag: str, content):
        return F.concat(
            F.lit('{"marcTag":"%s","subfields":[{"tag":"a","content":"' % tag),
            content, F.lit('"}]}'),
        )

    docs = p.select(
        "p_partkey",
        F.concat(
            F.lit('{"varFields":['),
            F.concat_ws(
                ",",
                fld("245", F.col("p_name")),
                fld("100", F.col("p_type")),
                fld("020", F.concat(F.lit("isbn-"),
                                    F.col("p_partkey").cast("string"))),
                fld("650", F.col("p_brand")),
                fld("650", F.concat(F.lit("SZ-"), F.col("p_size").cast("string"))),
            ),
            F.lit("]}"),
        ).alias("marc"),
    )
    out = marc.parse_varfields(docs, "marc", ["p_partkey"])
    return out.select(
        "p_partkey", "title", "author", "isbn",
        F.array_join("subjects", ",").alias("subjects_csv"),
        F.col("n_subjects").cast("int").alias("n_subjects"),
    )


# ---------------------------------------------------------------------------
# S6 — N-Triples scan
# ---------------------------------------------------------------------------

@register(
    "s_ntriples_scan",
    oracle="""
    SELECT CAST(n_nationkey AS VARCHAR) AS subject_id,
           n_name AS obj
    FROM nation
    """,
)
def s_ntriples_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6: N-Triples line scan — regex triple match, predicate
    filter, subject-id extraction. Noise lines (comments, other
    predicates) must drop out.

    Reference: `fast.py:22,62-104` (FAST dump scan).
    """
    n = load(spark, sf_dir, "nation")
    good = n.select(
        F.concat(
            F.lit("<http://id.worldcat.org/fast/"),
            F.col("n_nationkey").cast("string"),
            F.lit('> <http://schema.org/name> "'),
            F.col("n_name"), F.lit('" .'),
        ).alias("value")
    )
    noise = n.select(
        F.concat(
            F.lit("# comment about nation "),
            F.col("n_nationkey").cast("string"),
        ).alias("value")
    ).unionByName(
        n.select(
            F.concat(
                F.lit("<http://id.worldcat.org/fast/"),
                F.col("n_nationkey").cast("string"),
                F.lit('> <http://schema.org/sameAs> "x" .'),
            ).alias("value")
        )
    )
    lines = good.unionByName(noise)
    return ntriples.parse_lines(
        lines,
        predicate="http://schema.org/name",
        subject_re=r"fast/([0-9]+)$",
    ).select("subject_id", "obj")


# ---------------------------------------------------------------------------
# S5 — HTML scrape
# ---------------------------------------------------------------------------

@register(
    "s_html_scrape",
    oracle="""
    SELECT p_partkey,
           CASE WHEN p_partkey % 8 = 0 THEN NULL ELSE p_name END AS title,
           CAST(p_partkey % 2 + 1 AS INT) AS n_reviews
    FROM part WHERE p_partkey % 4 = 0
      -- a NULL name nulls the serialized page = nothing to scrape;
      -- %8=0 rows substitute the blacklist literal, so they survive
      AND (p_partkey % 8 = 0 OR p_name IS NOT NULL)
    """,
)
def s_html_scrape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5: HTML table scrape with the known-bad-title blacklist —
    titled cells extract, blacklisted titles null out, review cells
    count.

    Reference: `content_cafe.py:222-296,315-346`, blacklist
    `:129-131`.
    """
    p = load(spark, sf_dir, "part").where(
        (F.col("p_partkey") % 4 == 0)
        # NULL name nulls the page (nothing to scrape) except where
        # the blacklist literal is substituted
        & ((F.col("p_partkey") % 8 == 0) | F.col("p_name").isNotNull())
    )
    title_text = F.when(
        F.col("p_partkey") % 8 == 0, F.lit(htmlsrc.KNOWN_BAD_TITLES[0])
    ).otherwise(F.col("p_name"))
    review_cells = F.array_join(
        F.transform(
            F.sequence(F.lit(1), F.col("p_partkey") % 2 + 1),
            lambda i: F.concat(
                F.lit('<tr><td class="review">review-'),
                F.col("p_partkey").cast("string"),
                F.lit("-"), i.cast("string"), F.lit("</td></tr>"),
            ),
        ), "",
    )
    docs = p.select(
        "p_partkey",
        F.concat(
            F.lit('<html><body><table><tr><td class="title">'),
            title_text,
            F.lit("</td></tr>"),
            review_cells,
            F.lit("</table></body></html>"),
        ).alias("html"),
    )
    return htmlsrc.scrape_cells(docs).select(
        "p_partkey", "title", F.col("n_reviews").cast("int").alias("n_reviews")
    )


# ---------------------------------------------------------------------------
# S8 — OPDS/Atom feed
# ---------------------------------------------------------------------------

@register(
    "s_opds_feed",
    oracle="""
    WITH picked AS (
        SELECT c_nationkey, c_custkey, c_name,
               ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                  ORDER BY c_custkey) AS rn
        FROM customer WHERE c_custkey % 25 = 0
          AND c_name IS NOT NULL  -- no title = no entry to serialize
    )
    SELECT c_nationkey AS nationkey,
           'urn:cust:' || CAST(c_custkey AS VARCHAR) AS urn,
           c_name AS title,
           TIMESTAMP '2024-01-01 00:00:00'
               + (c_custkey % 28) * INTERVAL 1 DAY AS updated
    FROM picked WHERE rn <= 3
    """,
)
def s_opds_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8: OPDS/Atom feed → URN-keyed entries. Feeds are assembled
    per nation (entries sorted, capped at 3 — the reference's feed
    pagination), then parsed back with from_xml + explode.

    Reference: `controller.py:566-607`.
    """
    from pyspark.sql import Window as W
    c = load(spark, sf_dir, "customer").where(
        (F.col("c_custkey") % 25 == 0)
        & F.col("c_name").isNotNull()  # no title = no entry
    )
    rn = F.row_number().over(
        W.partitionBy("c_nationkey").orderBy("c_custkey")
    )
    picked = c.withColumn("rn", rn).where(F.col("rn") <= 3)
    entry_xml = F.concat(
        F.lit("<entry><id>urn:cust:"),
        F.col("c_custkey").cast("string"),
        F.lit("</id><title>"), F.col("c_name"),
        F.lit("</title><updated>"),
        F.date_format(
            F.lit("2024-01-01").cast("timestamp")
            + F.make_dt_interval(F.col("c_custkey") % 28),
            "yyyy-MM-dd'T'HH:mm:ss'Z'",
        ),
        F.lit("</updated></entry>"),
    )
    feeds = (
        picked.select("c_nationkey", "c_custkey", entry_xml.alias("exml"))
        .groupBy("c_nationkey")
        .agg(
            F.concat(
                F.lit("<feed>"),
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("c_custkey", "exml"))
                        ),
                        lambda s: s["exml"],
                    ), "",
                ),
                F.lit("</feed>"),
            ).alias("feed")
        )
    )
    return opds.parse_feed(feeds).select(
        F.col("c_nationkey").alias("nationkey"), "urn", "title", "updated"
    )


# ---------------------------------------------------------------------------
# S1 — cached HTTP fetch
# ---------------------------------------------------------------------------

@register(
    "s_cached_fetch",
    oracle="""
    WITH req AS (
        SELECT 'https://api.example.org/viaf/' || CAST(c_custkey AS VARCHAR)
               AS url, c_custkey
        FROM customer WHERE c_custkey % 2 = 0
    )
    SELECT url,
           CASE WHEN c_custkey % 3 = 0 AND c_custkey % 9 <> 0
                THEN 'cached:' || url
                ELSE 'fetched:' || url END AS content,
           CASE WHEN c_custkey % 3 = 0 AND c_custkey % 9 <> 0
                THEN 'cache' ELSE 'fetch' END AS source
    FROM req
    """,
)
def s_cached_fetch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1: the Representation.get pattern — TTL'd cache table,
    anti-join for misses/stale, Arrow-batched fetch, union back.

    Reference: `viaf.py:829-841,736-737` (6-month TTL). Cache rows
    exist for custkey%3==0; rows with custkey%9==0 are STALE
    (fetched before the TTL window), so they re-fetch.
    """
    c = load(spark, sf_dir, "customer").where(F.col("c_custkey") % 2 == 0)
    url = F.concat(
        F.lit("https://api.example.org/viaf/"),
        F.col("c_custkey").cast("string"),
    )
    requests = c.select(url.alias("url"))
    cache_rows = (
        load(spark, sf_dir, "customer")
        .where(F.col("c_custkey") % 3 == 0)
        .select(
            url.alias("url"),
            F.concat(F.lit("cached:https://api.example.org/viaf/"),
                     F.col("c_custkey").cast("string")).alias("content"),
            F.when(F.col("c_custkey") % 9 == 0,
                   F.lit("2023-01-01").cast("timestamp"))
            .otherwise(F.lit("2024-01-10").cast("timestamp"))
            .alias("fetched_at"),
        )
    )
    return http_cache.cached_get(
        requests, cache_rows,
        now="2024-01-15 00:00:00",
        max_age_seconds=30 * 24 * 3600,
    )


# ---------------------------------------------------------------------------
# S2 — SOAP batch RPC
# ---------------------------------------------------------------------------

@register(
    "s_soap_demand",
    oracle="""
    WITH hist AS (
        SELECT p_partkey AS identifier_id,
               unnest(generate_series(1, 6)) AS month_no
        FROM part WHERE p_partkey % 6 = 0
    )
    SELECT identifier_id,
           CAST(SUM((identifier_id * 31 + month_no) % 97) AS BIGINT)
               AS total_demand,
           CAST(MAX(CASE WHEN month_no >= 4
                    THEN (identifier_id * 31 + month_no) % 97 END) AS BIGINT)
               AS recent_peak
    FROM hist
    GROUP BY identifier_id
    """,
)
def s_soap_demand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2: SOAP demand-history fan-out (Arrow-batched mapInPandas,
    one client per partition) + the reference's month-bucket rollup.

    Reference: `content_cafe.py:351-394` (Single() SOAP call),
    `:384-394,396-423` (monthly sum / recent-peak estimate). The
    in-container transport is deterministic; the plumbing (batch
    shape, schema, partition-level client) is the production path.
    """
    from metadata_wrangler_spark.sources import soap
    p = load(spark, sf_dir, "part").where(F.col("p_partkey") % 6 == 0)
    ids = p.select(F.col("p_partkey").alias("identifier_id"))
    hist = soap.demand_history(ids)
    recent = F.when(F.col("month_no") >= 4, F.col("demand"))
    return hist.groupBy("identifier_id").agg(
        F.sum("demand").alias("total_demand"),
        F.max(recent).alias("recent_peak"),
    )


# ---------------------------------------------------------------------------
# S9 — CSV source/sink round trip
# ---------------------------------------------------------------------------

@register(
    "s_csv_roundtrip",
    oracle="""
    SELECT c_mktsegment AS segment,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(floor(c_acctbal * 10000 + 0.5) AS BIGINT)) AS BIGINT)
               / 10000.0 AS total_balance
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def s_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9: report CSV sink + schema-explicit CSV source — write the
    segment report, read it back (a bad writer or reader breaks the
    hash match).

    Reference: `scripts.py:375-416,419-474` (report writers),
    `monitor.py:153-155`.
    """
    import os
    import tempfile
    from metadata_wrangler_spark.sources import sinks
    c = load(spark, sf_dir, "customer")
    report = c.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count(F.lit(1)).alias("n_customers"),
        (F.sum(F.floor(F.col("c_acctbal") * 10000 + F.lit(0.5))
               .cast("bigint")) / F.lit(10000.0)).alias("total_balance"),
    )
    path = os.path.join(
        tempfile.gettempdir(),
        f"mw_csv_report_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    sinks.write_csv_report(report, path)
    return sinks.read_csv_report(
        spark, path,
        "segment STRING, n_customers BIGINT, total_balance DOUBLE",
    )


# ---------------------------------------------------------------------------
# S10 — OPDS feed sink (render side)
# ---------------------------------------------------------------------------

@register(
    "s_opds_sink",
    oracle="""
    SELECT 'urn:cust:' || CAST(c_custkey AS VARCHAR) AS urn,
           '<entry><id>urn:cust:' || CAST(c_custkey AS VARCHAR)
           || '</id><title>' || c_name
           || '</title><updated>2024-02-01T00:00:00Z</updated></entry>'
               AS entry_xml
    FROM customer WHERE c_custkey % 40 = 0
    """,
)
def s_opds_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10: the serving-layer feed render — work rows → Atom <entry>
    XML column (the final per-feed concat is the only driver-side
    step, exactly like the reference's AcquisitionFeed).

    Reference: `controller.py:474-489,547-552` (feed assembly from
    precomposed entries).
    """
    from metadata_wrangler_spark.sources import sinks
    c = load(spark, sf_dir, "customer").where(F.col("c_custkey") % 40 == 0)
    rows = c.select(
        F.concat(F.lit("urn:cust:"), F.col("c_custkey").cast("string"))
        .alias("urn"),
        F.col("c_name").alias("title"),
        F.lit("2024-02-01 00:00:00").cast("timestamp").alias("updated"),
    )
    return sinks.render_opds_entries(rows, "urn", "title", "updated").select(
        "urn", "entry_xml"
    )


# ---------------------------------------------------------------------------
# S11 — image mirror url rewrite (post-state)
# ---------------------------------------------------------------------------

@register(
    "s_image_mirror_rewrite",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_custkey % 3 = 0
                THEN replace(replace(
                     'https://covers.nypl.org/Content%20Cafe/c'
                         || CAST(c_custkey AS VARCHAR) || '.jpg',
                     'covers.nypl.org', 'book-covers.example.org'),
                     'Content%20Cafe', 'scaled/300')
                ELSE 'https://covers.nypl.org/Content%20Cafe/c'
                         || CAST(c_custkey AS VARCHAR) || '.jpg' END
               AS mirror_url,
           c_custkey % 3 = 0 AS mirrored
    FROM customer WHERE c_custkey % 2 = 0
    """,
)
def s_image_mirror_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S11: the cover-mirror migration's url rewrite as a post-state
    (nested replace under a predicate). The upload side
    (foreachPartition, one client per partition) is
    sources.sinks.mirror_images, exercised in tests with a
    collecting fake uploader.

    Reference: `migration/20180626-move-cover-s3-bucket.sql:1-7`,
    `coverage_utils.py:24-49`.
    """
    from metadata_wrangler_spark.operators import merge
    c = load(spark, sf_dir, "customer").where(F.col("c_custkey") % 2 == 0)
    url = F.concat(
        F.lit("https://covers.nypl.org/Content%20Cafe/c"),
        F.col("c_custkey").cast("string"), F.lit(".jpg"),
    )
    base = c.select("c_custkey", url.alias("mirror_url"))
    pred = F.col("c_custkey") % 3 == 0
    post = merge.update_where(
        base, pred,
        {"mirror_url": F.replace(
            F.replace(F.col("mirror_url"),
                      F.lit("covers.nypl.org"),
                      F.lit("book-covers.example.org")),
            F.lit("Content%20Cafe"), F.lit("scaled/300"))},
    )
    return post.select("c_custkey", "mirror_url", pred.alias("mirrored"))


# ---------------------------------------------------------------------------
# Overdrive metadata JSON
# ---------------------------------------------------------------------------

@register(
    "s_overdrive_json",
    oracle="""
    SELECT p_partkey,
           'od-' || CAST(p_partkey AS VARCHAR) AS overdrive_id,
           p_name AS title,
           p_type AS primary_author,
           2 AS n_creators,
           'en' AS lang_csv,
           CASE WHEN p_brand <= 'SZ-' || CAST(p_size AS VARCHAR)
                THEN p_brand || ',' || 'SZ-' || CAST(p_size AS VARCHAR)
                ELSE 'SZ-' || CAST(p_size AS VARCHAR) || ',' || p_brand
           END AS subjects_csv,
           '978' || CAST(p_partkey AS VARCHAR) AS isbn_csv,
           'http://img.example/od-' || CAST(p_partkey AS VARCHAR)
               AS cover_href,
           CAST(p_size AS BIGINT) AS popularity
    FROM part WHERE p_partkey % 5 = 2
      AND p_name IS NOT NULL  -- no title = no metadata record
    """,
)
def s_overdrive_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overdrive metadata-JSON parse: typed `from_json` + higher-order
    pulls — primary author by role, per-format ISBN collection (empty
    ASIN noise filtered), sorted language codes and subjects, cover
    href, popularity.

    Reference: `/root/reference/overdrive.py:22-76` (provider wiring);
    record shape per the reference's own fixture
    (`tests/files/overdrive/overdrive_metadata.json`), golden-tested
    in tests/test_overdrive_golden.py.
    """
    from metadata_wrangler_spark.sources import overdrive

    p = load(spark, sf_dir, "part").where(
        (F.col("p_partkey") % 5 == 2)
        & F.col("p_name").isNotNull()  # no title = no metadata record
    )
    key = F.col("p_partkey").cast("string")
    payload = F.concat(
        F.lit('{"id":"od-'), key,
        F.lit('","title":"'), F.col("p_name"),
        F.lit('","mediaType":"eBook","popularity":'),
        F.col("p_size").cast("string"),
        F.lit(',"creators":[{"name":"n","fileAs":"'), F.col("p_type"),
        F.lit('","role":"Author"},'
              '{"name":"e","fileAs":"E, D","role":"Editor"}],'
              '"languages":[{"code":"en","name":"English"}],'
              '"subjects":[{"value":"'), F.col("p_brand"),
        F.lit('"},{"value":"SZ-'), F.col("p_size").cast("string"),
        F.lit('"}],"formats":['
              '{"id":"ebook-pdf","name":"PDF","identifiers":'
              '[{"type":"ISBN","value":"978'), key,
        F.lit('"}]},{"id":"ebook-kindle","name":"Kindle","identifiers":'
              '[{"type":"ASIN","value":"B000"},{"type":"ASIN","value":""}]}],'
              '"images":{"cover":{"href":"http://img.example/od-'), key,
        F.lit('","type":"image/jpeg"}}}'),
    )
    docs = p.select("p_partkey", payload.alias("payload"))
    out = overdrive.parse_overdrive(docs, "payload", ["p_partkey"])
    return out.select(
        "p_partkey", "overdrive_id", "title", "primary_author",
        F.col("n_creators").cast("int").alias("n_creators"),
        F.array_join("languages", ",").alias("lang_csv"),
        F.array_join("subjects", ",").alias("subjects_csv"),
        F.array_join("isbns", ",").alias("isbn_csv"),
        "cover_href", "popularity",
    )


# --- Z-order clustering layout (multi-dim data skipping) -------------------

def _zorder_oracle_sql() -> str:
    from metadata_wrangler_spark.operators import layout

    xb = layout.normalize_dim_sql("l_partkey", "b.xlo", "b.xhi")
    yb = layout.normalize_dim_sql("l_suppkey", "b.ylo", "b.yhi")
    z = layout.zorder_sql("xb", "yb")
    shift = 2 * layout.ZBITS - 8
    return f"""
    WITH b AS (
        SELECT MIN(l_partkey) AS xlo, MAX(l_partkey) AS xhi,
               MIN(l_suppkey) AS ylo, MAX(l_suppkey) AS yhi
        FROM lineitem
    ), keyed AS (
        SELECT {xb} AS xb, {yb} AS yb
        FROM lineitem CROSS JOIN b
    ), z AS (
        SELECT xb, yb, {z} >> {shift} AS bucket FROM keyed
    )
    SELECT bucket,
           COUNT(*) AS n_rows,
           MIN(xb) AS x_min, MAX(xb) AS x_max,
           MIN(yb) AS y_min, MAX(yb) AS y_max
    FROM z
    GROUP BY bucket
    """


@register("s_zorder_layout", oracle=_zorder_oracle_sql())
def s_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering layout preview: bucket lineitem
    by the top 8 bits of the Morton key over (l_partkey, l_suppkey)
    and report each bucket's row count and bounding box in BOTH
    dimensions — the min/max stats a file footer would carry after
    an ``OPTIMIZE ZORDER BY`` style rewrite.

    The emitted boxes are the pruning proof: under a linear sort a
    file's box spans the FULL range of the secondary column, so a
    2-D box predicate prunes on one axis only; under z-order every
    bucket is tight in both axes, so the same predicate skips most
    buckets (measured mechanically in tests/test_zorder_layout.py).

    Reference: single-column index ordering (`model.py` coverage
    timestamp indexes) generalized to two filter axes.

    Scale design: the Morton key is pure shift/mask arithmetic in
    whole-stage codegen (operators/layout.py); dimension bounds ride
    in as a broadcast 1-row aggregate (scalar-subquery shape, no
    driver round-trip); the real write path is
    ``df.repartitionByRange(n, zvalue).sortWithinPartitions(zvalue)
    .write.parquet(...)`` — range partitioning keys the shuffle on
    the SAME Morton order, so file boundaries follow the curve.
    """
    from metadata_wrangler_spark.operators import layout

    li = load(spark, sf_dir, "lineitem")
    bounds = li.agg(
        F.min("l_partkey").alias("xlo"),
        F.max("l_partkey").alias("xhi"),
        F.min("l_suppkey").alias("ylo"),
        F.max("l_suppkey").alias("yhi"),
    )
    keyed = li.crossJoin(F.broadcast(bounds)).select(
        layout.normalize_dim(
            F.col("l_partkey"), F.col("xlo"), F.col("xhi")
        ).alias("xb"),
        layout.normalize_dim(
            F.col("l_suppkey"), F.col("ylo"), F.col("yhi")
        ).alias("yb"),
    )
    shift = 2 * layout.ZBITS - 8
    z = keyed.select(
        "xb",
        "yb",
        F.shiftright(
            layout.zorder_col(F.col("xb"), F.col("yb")), shift
        ).alias("bucket"),
    )
    return z.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("xb").alias("x_min"),
        F.max("xb").alias("x_max"),
        F.min("yb").alias("y_min"),
        F.max("yb").alias("y_max"),
    )


# ---------------------------------------------------------------------------
# S10b — full updates-feed PAGE render (feed envelope + totalResults
# + keyset pagination link around the precomposed entries)
# ---------------------------------------------------------------------------

_FEED_PAGE_SIZE = 10
_FEED_CURSOR = 20           # keyset: page starts after this custkey


@register(
    "s_opds_updates_page",
    oracle=f"""
    WITH coll AS (
        SELECT c_custkey,
               '<entry><id>urn:cust:' || CAST(c_custkey AS VARCHAR)
               || '</id><title>' || c_name
               || '</title><updated>2024-02-01T00:00:00Z</updated></entry>'
                   AS entry_xml
        FROM customer WHERE c_custkey % 40 = 0
    ), page AS (
        SELECT c_custkey, entry_xml FROM coll
        WHERE c_custkey > {_FEED_CURSOR}
        ORDER BY c_custkey ASC LIMIT {_FEED_PAGE_SIZE}
    ), tot AS (
        SELECT COUNT(*) AS total_results FROM coll
    )
    SELECT t.total_results,
           MAX(p.c_custkey) AS next_cursor,
           '<feed xmlns="http://www.w3.org/2005/Atom" '
           || 'xmlns:opensearch="http://a9.com/-/spec/opensearch/1.1/">'
           || '<title>Collection Updates</title>'
           || '<opensearch:totalResults>'
           || CAST(t.total_results AS VARCHAR)
           || '</opensearch:totalResults>'
           || string_agg(p.entry_xml, '' ORDER BY p.c_custkey)
           || '<link rel="next" href="/updates?after='
           || CAST(MAX(p.c_custkey) AS VARCHAR) || '"/></feed>'
               AS feed_xml
    FROM page p CROSS JOIN tot t
    GROUP BY t.total_results
    """,
)
def s_opds_updates_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10 at FEED fidelity: one updates-feed page as the reference
    serves it — Atom envelope, <opensearch:totalResults> catalog
    size, the page's precomposed entries in keyset order, and the
    rel=next pagination link carrying the keyset cursor.

    Reference: `controller.py:464-489` (feed assembly from
    precomposed entries), `controller.py:491-552`
    (add_catalog_size_to_feed → opensearch:totalResults,
    add_pagination_links_to_feed → rel=next).

    Scale shape: the catalog size is one COUNT aggregate broadcast
    back (never a second scan per entry); the page is keyset-
    predicate + TakeOrdered({_FEED_PAGE_SIZE}) so pushdown serves it
    regardless of collection size; only the ≤{_FEED_PAGE_SIZE}
    surviving entries reach the final ordered concat — the one
    intentionally single-row serving step, same as the reference's
    in-memory feed buffer.
    """
    from metadata_wrangler_spark.sources import sinks
    coll = load(spark, sf_dir, "customer").where(
        F.col("c_custkey") % 40 == 0
    )
    rows = coll.select(
        "c_custkey",
        F.concat(F.lit("urn:cust:"), F.col("c_custkey").cast("string"))
        .alias("urn"),
        F.col("c_name").alias("title"),
        F.lit("2024-02-01 00:00:00").cast("timestamp").alias("updated"),
    )
    entries = sinks.render_opds_entries(rows, "urn", "title", "updated")
    page = (
        entries.where(F.col("c_custkey") > _FEED_CURSOR)
        .orderBy(F.asc("c_custkey"))
        .limit(_FEED_PAGE_SIZE)
    )
    tot = coll.agg(F.count(F.lit(1)).alias("total_results"))
    agg = page.crossJoin(F.broadcast(tot)).groupBy("total_results").agg(
        F.max("c_custkey").alias("next_cursor"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("c_custkey", "entry_xml"))
                ),
                lambda s: s["entry_xml"],
            ),
            "",
        ).alias("entries_xml"),
    )
    return agg.select(
        "total_results",
        "next_cursor",
        F.concat(
            F.lit('<feed xmlns="http://www.w3.org/2005/Atom" '
                  'xmlns:opensearch="http://a9.com/-/spec/opensearch/1.1/">'
                  "<title>Collection Updates</title>"
                  "<opensearch:totalResults>"),
            F.col("total_results").cast("string"),
            F.lit("</opensearch:totalResults>"),
            F.col("entries_xml"),
            F.lit('<link rel="next" href="/updates?after='),
            F.col("next_cursor").cast("string"),
            F.lit('"/></feed>'),
        ).alias("feed_xml"),
    )


# ---------------------------------------------------------------------------
# compaction planning: bin-pack small files into target-size groups
# ---------------------------------------------------------------------------

_COMPACT_TARGET = 65536  # target bytes per output file (test-scale)


@register(
    "s_compaction_plan",
    oracle=f"""
    WITH r AS (
        SELECT doc_id, n_chars,
               SUM(n_chars) OVER (ORDER BY n_chars DESC, doc_id
                                  ROWS UNBOUNDED PRECEDING) AS cum
        FROM documents
    ), b AS (
        SELECT doc_id, n_chars,
               (cum - n_chars) // {_COMPACT_TARGET} AS bin_id
        FROM r
    )
    SELECT CAST(bin_id AS BIGINT) AS bin_id,
           CAST(COUNT(*) AS BIGINT) AS n_files,
           CAST(SUM(n_chars) AS BIGINT) AS bin_bytes,
           MIN(doc_id) AS first_file,
           MAX(doc_id) AS last_file
    FROM b GROUP BY bin_id
    """,
)
def s_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planner — the OPTIMIZE/bin-packing step
    every lake table needs once streaming ingest has sprayed
    thousands of under-sized files: order the manifest largest-first
    (classic first-fit-decreasing flavour), take the running byte
    total, and cut a new output bin every TARGET bytes. The
    documents table stands in for the file manifest (doc_id = file,
    n_chars = bytes); the plan is the deterministic assignment a
    rewrite job would execute.

    Scale shape: the running total over the manifest — rows scale
    with FILE COUNT, which is exactly the thing being fixed, so it
    can be millions — rides the range-bucketed distributed prefix
    sum (operators/prefix.py), never an Exchange SinglePartition;
    then one hash aggregate per bin. The whole plan is two balanced
    shuffles of id+size rows.
    """
    from metadata_wrangler_spark.operators.prefix import global_order_stats

    docs = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    r = global_order_stats(
        docs,
        [F.desc("n_chars"), F.asc("doc_id")],
        cum_cols=["n_chars"],
        rank_col=None,
    )
    # integer DIV, not float division: a manifest's cumulative bytes
    # pass 2^53 long before 100 TB and double division would round.
    b = r.select(
        "doc_id", "n_chars",
        F.expr(
            f"(cum_n_chars - n_chars) DIV {_COMPACT_TARGET}"
        ).cast("bigint").alias("bin_id"),
    )
    return b.groupBy("bin_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_files"),
        F.sum("n_chars").cast("bigint").alias("bin_bytes"),
        F.min("doc_id").alias("first_file"),
        F.max("doc_id").alias("last_file"),
    )
