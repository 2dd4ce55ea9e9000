"""DML / upsert / state-machine plans (SURVEY.md §2.7 D1-D7).

These are the read-side semantics of the reference's write operators,
phrased as pure queries so the oracle can hash-check them: each plan
computes the *post-state* (or the to-write delta) that the engine's
merge/queue library (operators.merge, operators.queue) would persist
via MERGE on a transactional table format.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from metadata_wrangler_spark.catalog import load
from metadata_wrangler_spark.plans import register


@register(
    "d_register_anti_join",
    oracle="""
    SELECT p.p_partkey AS identifier_id,
           'oclc-classify' AS data_source,
           'registered' AS status
    FROM part p
    WHERE NOT EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_partkey = p.p_partkey AND l.l_returnflag = 'R'
          AND l.l_shipdate >= TIMESTAMP '1998-01-01'
    )
    """,
)
def d_register_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D3: INSERT…SELECT with anti-join — "register every identifier
    that has no coverage yet" (parts never returned stand in for
    ISBNs without an OCLC record).

    Reference: `migration/20181220-register-isbns-for-oclc-coverage
    .sql:8-16`.
    """
    p = load(spark, sf_dir, "part")
    covered = load(spark, sf_dir, "lineitem").where(
        (F.col("l_returnflag") == "R")
        & (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
    ).select("l_partkey")
    return (
        p.join(covered, p.p_partkey == covered.l_partkey, "left_anti")
        .select(
            F.col("p_partkey").alias("identifier_id"),
            F.lit("oclc-classify").alias("data_source"),
            F.lit("registered").alias("status"),
        )
    )


@register(
    "d_policy_merge_preview",
    oracle="""
    WITH current AS (
        SELECT p_partkey AS key, p_name AS title, p_brand AS publisher
        FROM part
    ), staged AS (
        -- a second source's view: better titles for some rows, NULL
        -- titles for others (must never clobber), plus brand-new keys
        SELECT p_partkey AS key,
               CASE WHEN p_partkey % 4 = 0 THEN upper(p_name)
                    WHEN p_partkey % 4 = 1 THEN NULL
                    ELSE p_name END AS title,
               'staged-source' AS publisher
        FROM part WHERE p_partkey % 2 = 0
        UNION ALL
        SELECT p_partkey + 1000000 AS key,
               'new title ' || CAST(p_partkey AS VARCHAR) AS title,
               'staged-source' AS publisher
        FROM part WHERE p_partkey % 100 = 7
    )
    SELECT COALESCE(c.key, s.key) AS key,
           CASE WHEN s.key IS NOT NULL AND s.title IS NOT NULL THEN s.title
                ELSE c.title END AS title,
           CASE WHEN c.key IS NULL THEN s.publisher ELSE c.publisher END AS publisher,
           CASE WHEN c.key IS NULL THEN 'insert'
                WHEN s.key IS NULL THEN 'keep'
                WHEN s.title IS NOT NULL AND s.title <> c.title THEN 'update'
                ELSE 'keep' END AS action
    FROM current c
    FULL OUTER JOIN staged s ON s.key = c.key
    """,
)
def d_policy_merge_preview(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4/D5: `Metadata.apply` semantics as a MERGE preview — upsert
    a second source's view onto the current editions with the
    policy "a NULL never overwrites a value".

    Reference: `Metadata.apply` call sites (`controller.py:628-629`,
    `oclc/classify.py:1181-1188`) and the null-guard migration
    `migration/20190205-remove-content-cafe-coverage-….sql:9-11`.
    The write-side twin (Delta MERGE / partition-overwrite fallback)
    is operators.merge.
    """
    p = load(spark, sf_dir, "part")
    current = p.select(
        F.col("p_partkey").alias("key"),
        F.col("p_name").alias("title"),
        F.col("p_brand").alias("publisher"),
    )
    staged_updates = p.where(F.col("p_partkey") % 2 == 0).select(
        F.col("p_partkey").alias("key"),
        F.when(F.col("p_partkey") % 4 == 0, F.upper("p_name"))
        .when(F.col("p_partkey") % 4 == 1, F.lit(None))
        .otherwise(F.col("p_name")).alias("title"),
        F.lit("staged-source").alias("publisher"),
    )
    staged_inserts = p.where(F.col("p_partkey") % 100 == 7).select(
        (F.col("p_partkey") + 1000000).alias("key"),
        F.concat(F.lit("new title "), F.col("p_partkey").cast("string"))
        .alias("title"),
        F.lit("staged-source").alias("publisher"),
    )
    staged = staged_updates.unionByName(staged_inserts)
    c = current.alias("c")
    s = staged.alias("s")
    ck, sk = F.col("c.key"), F.col("s.key")
    merged_title = F.when(
        sk.isNotNull() & F.col("s.title").isNotNull(), F.col("s.title")
    ).otherwise(F.col("c.title"))
    action = (
        F.when(ck.isNull(), "insert")
        .when(sk.isNull(), "keep")
        .when(
            F.col("s.title").isNotNull()
            & (F.col("s.title") != F.col("c.title")),
            "update",
        )
        .otherwise("keep")
    )
    return c.join(s, sk == ck, "full_outer").select(
        F.coalesce(ck, sk).alias("key"),
        merged_title.alias("title"),
        F.when(ck.isNull(), F.col("s.publisher"))
        .otherwise(F.col("c.publisher")).alias("publisher"),
        action.alias("action"),
    )


@register(
    "d_status_transitions",
    oracle="""
    WITH queue AS (
        SELECT o_custkey AS identifier_id,
               CASE o_orderstatus WHEN 'O' THEN 'registered'
                                  WHEN 'F' THEN 'success'
                                  ELSE 'transient failure' END AS status,
               o_orderdate AS ts, o_orderkey,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate DESC,
                                           o_orderkey DESC) AS rn
        FROM orders
    )
    SELECT status,
           COUNT(*) AS n_identifiers,
           COUNT(CASE WHEN ts < TIMESTAMP '1998-01-01' THEN 1 END) AS retry_eligible
    FROM queue
    WHERE rn = 1
    GROUP BY status
    """,
)
def d_status_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D7: the CoverageRecord state machine's read side — latest
    record per identifier wins; transient failures older than the
    backoff cutoff become retry-eligible.

    Reference: `coverage_provider.py:346-354` (register),
    `content_cafe.py:85-105` (success/failure transitions),
    `controller.py:1013-1017` (force re-register). The write-side
    MERGE lives in operators.queue.
    """
    o = load(spark, sf_dir, "orders")
    status = (
        F.when(F.col("o_orderstatus") == "O", "registered")
        .when(F.col("o_orderstatus") == "F", "success")
        .otherwise("transient failure")
    )
    w = W.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    latest = (
        o.select(
            F.col("o_custkey").alias("identifier_id"),
            status.alias("status"),
            F.col("o_orderdate").alias("ts"),
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") == 1)
    )
    return latest.groupBy("status").agg(
        F.count(F.lit(1)).alias("n_identifiers"),
        F.count(
            F.when(F.col("ts") < F.lit("1998-01-01").cast("timestamp"), 1)
        ).alias("retry_eligible"),
    )
