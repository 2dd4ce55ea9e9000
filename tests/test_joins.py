"""Exact-row tests for the join operators whose COVERAGE rows lacked
dedicated tests: M2M semi-join membership (J5/J8), left-outer null
split (J6), set-ops-as-joins (J9), and first-match probe (J10) —
hand-built inputs, reference semantics."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_semi_join_membership_no_duplication(spark):
    """J5/J8: membership probe through an M2M bridge never duplicates
    the probed side, however many bridge rows match."""
    idents = spark.createDataFrame(
        [(1,), (2,), (3,)], "identifier_id bigint")
    catalog = spark.createDataFrame(
        [(10, 1), (11, 1), (10, 2)], "collection_id bigint, identifier_id bigint")
    got = sorted(r["identifier_id"] for r in
                 idents.join(catalog, "identifier_id", "left_semi").collect())
    assert got == [1, 2]          # 1 matches twice but appears once


def test_left_outer_null_split(spark):
    """J6: left join + null test partitions the left side exactly."""
    coll = spark.createDataFrame([(1,), (2,), (3,)], "identifier_id bigint")
    pools = spark.createDataFrame(
        [(1, 100)], "identifier_id bigint, work_id bigint")
    j = coll.join(pools, "identifier_id", "left")
    with_work = {r["identifier_id"] for r in
                 j.where(F.col("work_id").isNotNull()).collect()}
    without = {r["identifier_id"] for r in
               j.where(F.col("work_id").isNull()).collect()}
    assert with_work == {1}
    assert without == {2, 3}
    assert with_work | without == {1, 2, 3}


def test_anti_join_set_difference(spark):
    """J9: needs-adding = left_anti against the catalog."""
    wanted = spark.createDataFrame([(1,), (2,), (4,)], "id bigint")
    have = spark.createDataFrame([(2,), (3,)], "id bigint")
    got = sorted(r["id"] for r in
                 wanted.join(have, "id", "left_anti").collect())
    assert got == [1, 4]


def test_first_match_probe_deterministic(spark):
    """J10: the first-match window picks the single highest-priority
    row per key, deterministically under ties."""
    from pyspark.sql import Window as W
    rows = spark.createDataFrame(
        [(1, "b", 5), (1, "a", 5), (2, "c", 9)],
        "key bigint, val string, score int")
    w = W.partitionBy("key").orderBy(F.desc("score"), F.asc("val"))
    got = {(r["key"], r["val"]) for r in
           rows.withColumn("rn", F.row_number().over(w))
           .where(F.col("rn") == 1).collect()}
    assert got == {(1, "a"), (2, "c")}   # tie broken by val, not input order
