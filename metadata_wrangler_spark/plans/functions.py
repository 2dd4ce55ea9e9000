"""Scalar-function plans (SURVEY.md §2.8 F2/F3/F4/F8/F10/F12/F14,
§2.5 W5) — each exercises one family from
metadata_wrangler_spark.functions over the star schema, with the
oracle recomputing the expected result directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from metadata_wrangler_spark.catalog import load
from metadata_wrangler_spark.functions import binary as fbin
from metadata_wrangler_spark.functions import canonical, names, roles, urls
from metadata_wrangler_spark.plans import register


@register(
    "f_role_vocab_map",
    oracle="""
    SELECT o_orderkey,
           'Contributor ' || CAST(o_orderkey AS VARCHAR) AS name,
           CASE o_orderpriority
                WHEN '1-URGENT' THEN 'Translator'
                WHEN '2-HIGH' THEN 'Editor'
                WHEN '3-MEDIUM' THEN 'Author'
                WHEN '5-LOW' THEN 'Director'
                ELSE 'Unknown' END AS mapped_role
    FROM orders WHERE o_orderkey % 20 = 0
    """,
)
def f_role_vocab_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2: bracketed role suffix extraction + vocabulary mapping.

    Reference: `oclc/classify.py:360-394` (ROLES regex +
    ROLE_MAPPING). Labels outside the vocabulary map to 'Unknown'
    ('4-NOT SPECIFIED' becomes an unmapped label here).
    """
    o = load(spark, sf_dir, "orders").where(F.col("o_orderkey") % 20 == 0)
    label = (
        F.when(F.col("o_orderpriority") == "1-URGENT", "Translator")
        .when(F.col("o_orderpriority") == "2-HIGH", "Editor")
        .when(F.col("o_orderpriority") == "3-MEDIUM", "Author")
        .when(F.col("o_orderpriority") == "5-LOW", "Film director")
        .otherwise("Mystery label")
    )
    tagged = o.select(
        "o_orderkey",
        F.concat(
            F.lit("Contributor "), F.col("o_orderkey").cast("string"),
            F.lit(" ["), label, F.lit("]"),
        ).alias("raw"),
    )
    return tagged.select(
        "o_orderkey",
        roles.strip_role_suffix(F.col("raw")).alias("name"),
        roles.map_role(roles.extract_role_suffix(F.col("raw")))
        .alias("mapped_role"),
    )


@register(
    "f_stateful_role_split",
    oracle="""
    WITH picked AS (
        SELECT c_nationkey, c_custkey, c_name,
               CASE WHEN c_custkey % 7 = 1 THEN c_name || ' [Translator]'
                    WHEN c_custkey % 7 = 2 THEN c_name || ' [Author; Editor]'
                    ELSE c_name END AS seg,
               ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                  ORDER BY c_custkey) AS rn
        FROM customer WHERE c_custkey % 11 = 0
          AND c_name IS NOT NULL  -- no name = no author segment
    ), joined AS (
        SELECT c_nationkey AS nationkey,
               string_agg(seg, '|' ORDER BY c_custkey) AS author_string
        FROM picked WHERE rn <= 5
        GROUP BY c_nationkey
    ), segs AS (
        SELECT nationkey,
               unnest(string_split(author_string, '|')) AS seg,
               CAST(unnest(generate_series(
                   1, len(string_split(author_string, '|')))) - 1 AS INT)
                   AS pos
        FROM joined
    ), parsed AS (
        SELECT nationkey, pos,
               trim(regexp_replace(seg, '\\s*\\[([^\\]]+)\\]$', '')) AS name,
               regexp_extract(seg, '\\[([^\\]]+)\\]$', 1) AS suffix
        FROM segs
    )
    SELECT nationkey, pos, name,
           CASE WHEN suffix = 'Translator' THEN 'Translator'
                WHEN suffix = 'Author; Editor' THEN 'Author;Editor'
                WHEN pos = 0 THEN 'Primary Author'
                WHEN COALESCE(MAX(CASE WHEN suffix <> '' THEN 1 ELSE 0 END)
                     OVER (PARTITION BY nationkey ORDER BY pos
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                     0) = 1 THEN 'Unknown'
                ELSE 'Author' END AS roles_csv,
           suffix <> '' AS explicit
    FROM parsed
    """,
)
def f_stateful_role_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3: pipe-split multi-author parsing with the default-role
    state machine.

    Reference: `oclc/classify.py:396-464` (`parse_multiple` +
    `_default_role_transition`); the closed form is derived in
    functions.roles. Author strings are assembled per nation from
    customer names, some segments carrying explicit role suffixes.
    """
    c = load(spark, sf_dir, "customer").where(
        (F.col("c_custkey") % 11 == 0)
        & F.col("c_name").isNotNull()  # no name = no author segment
    )
    seg = (
        F.when(F.col("c_custkey") % 7 == 1,
               F.concat(F.col("c_name"), F.lit(" [Translator]")))
        .when(F.col("c_custkey") % 7 == 2,
              F.concat(F.col("c_name"), F.lit(" [Author; Editor]")))
        .otherwise(F.col("c_name"))
    )
    rn = F.row_number().over(
        W.partitionBy("nationkey").orderBy("c_custkey")
    )
    picked = c.select(
        F.col("c_nationkey").alias("nationkey"),
        "c_custkey", seg.alias("seg"),
    ).withColumn("rn", rn).where(F.col("rn") <= 5)
    joined = picked.groupBy("nationkey").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("c_custkey", "seg"))),
                lambda s: s["seg"],
            ), "|",
        ).alias("author_string")
    )
    return roles.split_contributors(joined, "author_string", "nationkey")


@register(
    "f_name_munge",
    oracle="""
    SELECT c_custkey,
           c_name || ' ' || c_mktsegment AS display_name,
           c_name AS primary_with,
           c_name AS primary_and
    FROM customer WHERE c_custkey % 6 = 0
      -- no name = nothing to munge (NULL rule shared with the plan)
      AND c_name IS NOT NULL AND c_mktsegment IS NOT NULL
    """,
)
def f_name_munge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4: sort-name → display-name flip and primary-author
    extraction from ' with ' / ' and ' joined author fields.

    Reference: `viaf.py:104-123` (display from sort name),
    `canonicalize.py:45-86` (primary author extraction).
    """
    c = load(spark, sf_dir, "customer").where(
        (F.col("c_custkey") % 6 == 0)
        # no name = nothing to munge
        & F.col("c_name").isNotNull()
        & F.col("c_mktsegment").isNotNull()
    )
    sort_name = F.concat_ws(", ", F.col("c_mktsegment"), F.col("c_name"))
    with_field = F.concat(F.col("c_name"), F.lit(" with Someone Else"))
    and_field = F.concat(F.col("c_name"), F.lit(" and A Collaborator"))
    return c.select(
        "c_custkey",
        names.sort_name_to_display(sort_name).alias("display_name"),
        names.primary_author(with_field).alias("primary_with"),
        names.primary_author(and_field).alias("primary_and"),
    )


@register(
    "f_title_safe_strip",
    oracle="""
    SELECT p_partkey,
           regexp_replace('(' || p_name || ')! Vol. 1, #2?',
                          '[^0-9A-Za-z_\\-'' ]', '', 'g') AS safe_title
    FROM part WHERE p_partkey % 9 = 0
    """,
)
def f_title_safe_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8: strip non-title-safe characters before building a lookup
    query.

    Reference: `oclc/classify.py:1205-1227` (NON_TITLE_SAFE).
    """
    p = load(spark, sf_dir, "part").where(F.col("p_partkey") % 9 == 0)
    dirty = F.concat(
        F.lit("("), F.col("p_name"), F.lit(")! Vol. 1, #2?")
    )
    return p.select(
        "p_partkey",
        F.regexp_replace(dirty, r"[^0-9A-Za-z_\-' ]", "").alias("safe_title"),
    )


@register(
    "f_url_classify",
    oracle="""
    WITH u AS (
        SELECT c_custkey,
               CASE c_custkey % 5
                    WHEN 0 THEN 'https://www.worldcat.org/oclc/'
                                || CAST(c_custkey AS VARCHAR)
                    WHEN 1 THEN 'https://viaf.org/viaf/'
                                || CAST(c_custkey AS VARCHAR)
                    WHEN 2 THEN 'urn:isbn:978' || CAST(c_custkey AS VARCHAR)
                    WHEN 3 THEN 'https://example.org/person/'
                                || CAST(c_custkey AS VARCHAR)
                    ELSE 'https://example.com/other/page' END AS url
        FROM customer WHERE c_custkey % 4 = 0
    )
    SELECT c_custkey, url,
           CASE c_custkey % 5
                WHEN 0 THEN 'oclc_work' WHEN 1 THEN 'viaf'
                WHEN 2 THEN 'isbn' WHEN 3 THEN 'person'
                ELSE 'other' END AS kind,
           CASE c_custkey % 5
                WHEN 0 THEN CAST(c_custkey AS VARCHAR)
                WHEN 1 THEN CAST(c_custkey AS VARCHAR)
                WHEN 2 THEN '978' || CAST(c_custkey AS VARCHAR)
                WHEN 3 THEN CAST(c_custkey AS VARCHAR)
                ELSE NULL END AS url_id
    FROM u
    """,
)
def f_url_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F10: ordered table-driven URL classification + id extraction.

    Reference: `oclc/linked_data.py:96-104,142-147`,
    `canonicalize.py:332-335`.
    """
    c = load(spark, sf_dir, "customer").where(F.col("c_custkey") % 4 == 0)
    k = F.col("c_custkey")
    ks = k.cast("string")
    url = (
        F.when(k % 5 == 0, F.concat(F.lit("https://www.worldcat.org/oclc/"), ks))
        .when(k % 5 == 1, F.concat(F.lit("https://viaf.org/viaf/"), ks))
        .when(k % 5 == 2, F.concat(F.lit("urn:isbn:978"), ks))
        .when(k % 5 == 3, F.concat(F.lit("https://example.org/person/"), ks))
        .otherwise(F.lit("https://example.com/other/page"))
    )
    tagged = c.select("c_custkey", url.alias("url"))
    kind, url_id = urls.classify_url(F.col("url"))
    return tagged.select(
        "c_custkey", "url", kind.alias("kind"), url_id.alias("url_id")
    )


@register(
    "f_binary_prefix",
    oracle="""
    SELECT c_custkey,
           c_custkey % 3 = 0 AS is_image,
           CAST(octet_length(encode(
               CASE WHEN c_custkey % 3 = 0 THEN 'GIF89a' || c_name
                    ELSE 'PLAIN:' || c_name END)) AS BIGINT) AS n_bytes,
           TRUE AS b64_roundtrip_ok
    FROM customer WHERE c_custkey % 2 = 1
      AND c_name IS NOT NULL  -- no name = no payload to encode
    """,
)
def f_binary_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F14/F12: binary prefix test (stand-in cover detection) +
    base64 round trip over a BINARY payload column.

    Reference: `content_cafe.py:123-125,308-313` (prefix compare),
    `controller.py:130-138` (base64).
    """
    c = load(spark, sf_dir, "customer").where(
        (F.col("c_custkey") % 2 == 1)
        & F.col("c_name").isNotNull()  # no name = no payload
    )
    text = (
        F.when(F.col("c_custkey") % 3 == 0,
               F.concat(F.lit("GIF89a"), F.col("c_name")))
        .otherwise(F.concat(F.lit("PLAIN:"), F.col("c_name")))
    )
    payload = F.encode(text, "UTF-8")
    roundtrip = F.decode(
        fbin.b64decode(fbin.b64encode(payload)), "UTF-8"
    ) == text
    return c.select(
        "c_custkey",
        fbin.has_prefix(payload, b"GIF89a").alias("is_image"),
        F.octet_length(payload).cast("bigint").alias("n_bytes"),
        roundtrip.alias("b64_roundtrip_ok"),
    )


@register(
    "f_strip_accents",
    oracle="""
    SELECT c_custkey,
           strip_accents('Café Ñandú à ' || c_name) AS folded
    FROM customer WHERE c_custkey % 10 = 3
    """,
)
def f_strip_accents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6: diacritic folding before fingerprint/fuzzy compare (the
    NFKD step of the reference's normalization).

    Reference: `scripts.py:316` (NFKD), `viaf.py:126-130`.
    """
    c = load(spark, sf_dir, "customer").where(F.col("c_custkey") % 10 == 3)
    accented = F.concat(F.lit("Café Ñandú à "), F.col("c_name"))
    return c.select(
        "c_custkey", names.strip_accents(accented).alias("folded")
    )


@register(
    "w_coalesce_cascade",
    oracle="""
    SELECT c_custkey,
           COALESCE(
               CASE WHEN c_custkey % 3 <> 0 THEN c_name END,
               CASE WHEN c_custkey % 4 <> 0 THEN 'oclc:' || c_name END,
               CASE WHEN c_custkey % 5 <> 0 THEN 'viaf:' || c_name END,
               'guess:' || c_name) AS canonical_name,
           CASE WHEN c_custkey % 3 <> 0 THEN 'db'
                WHEN c_custkey % 4 <> 0 THEN 'oclc'
                WHEN c_custkey % 5 <> 0 THEN 'viaf'
                ELSE 'guess' END AS source
    FROM customer
    WHERE c_name IS NOT NULL  -- nothing to canonicalize (the
    -- cascade's source attribution assumes non-null candidates)
    """,
)
def w_coalesce_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5: first-match-in-priority-order canonicalization — DB →
    OCLC → VIAF → guessed fallback, with provenance.

    Reference: `canonicalize.py:131-193` (sort_name_from_services
    cascade).
    """
    c = load(spark, sf_dir, "customer").where(
        F.col("c_name").isNotNull()  # nothing to canonicalize
    )
    k = F.col("c_custkey")
    db = F.when(k % 3 != 0, F.col("c_name"))
    oclc = F.when(k % 4 != 0, F.concat(F.lit("oclc:"), F.col("c_name")))
    viaf = F.when(k % 5 != 0, F.concat(F.lit("viaf:"), F.col("c_name")))
    guess = F.concat(F.lit("guess:"), F.col("c_name"))
    value, source = canonical.cascade(
        [("db", db), ("oclc", oclc), ("viaf", viaf)], guess
    )
    return c.select(
        "c_custkey", value.alias("canonical_name"), source.alias("source")
    )


@register(
    "w_shortest_candidate",
    oracle="""
    SELECT p_brand, p_name AS shortest_name FROM (
        SELECT p_brand, p_name,
               ROW_NUMBER() OVER (PARTITION BY p_brand
                                  ORDER BY length(p_name), p_name) AS rn
        FROM part WHERE p_name IS NOT NULL  -- NULL is not a candidate
    ) t WHERE rn = 1
    """,
)
def w_shortest_candidate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5 companion: shortest-candidate preference per group
    (deterministic (length, value) tiebreak).

    Reference: `canonicalize.py:301-326`.
    """
    p = load(spark, sf_dir, "part").select("p_brand", "p_name").where(
        F.col("p_name").isNotNull()  # NULL is not a candidate
    )
    out = canonical.shortest_candidate(p, ["p_brand"], "p_name")
    return out.select("p_brand", F.col("p_name").alias("shortest_name"))
