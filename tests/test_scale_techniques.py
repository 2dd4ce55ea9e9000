"""Scale-technique tests: salted aggregation/join equivalence and
bucketed-table co-located joins (shuffle elimination made visible
in the physical plan)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from metadata_wrangler_spark.operators import skew
from tests.test_plan_shapes import explain_str


def _skewed(spark):
    # one hot key (90% of rows) + a tail
    rows = [("hot", i, float(i % 7)) for i in range(900)]
    rows += [(f"k{i % 10}", i, float(i)) for i in range(100)]
    return spark.createDataFrame(rows, "k string, n bigint, v double")


def test_salted_agg_matches_plain_agg(spark):
    df = _skewed(spark)
    plain = {
        r["k"]: (r["cnt"], r["total"], r["mx"])
        for r in df.groupBy("k").agg(
            F.count("n").alias("cnt"),
            F.sum("v").alias("total"),
            F.max("n").alias("mx"),
        ).collect()
    }
    salted = {
        r["k"]: (r["cnt"], r["total"], r["mx"])
        for r in skew.salted_agg(
            df, ["k"],
            {"cnt": ("n", "count"), "total": ("v", "sum"),
             "mx": ("n", "max")},
            n_salts=8,
        ).collect()
    }
    assert salted == plain


def test_salted_agg_rejects_non_algebraic(spark):
    with pytest.raises(ValueError):
        skew.salted_agg(_skewed(spark), ["k"], {"m": ("v", "median")})


def test_salted_join_matches_plain_join(spark):
    big = _skewed(spark)
    small = spark.createDataFrame(
        [("hot", "H"), ("k1", "A"), ("k2", "B")], "k string, tag string"
    )
    plain = sorted(tuple(r) for r in
                   big.join(small, "k").select("k", "n", "tag").collect())
    salted = sorted(tuple(r) for r in
                    skew.salted_join(big, small, "k")
                    .select("k", "n", "tag").collect())
    assert salted == plain
    assert len(plain) == 900 + 20


def test_bucketed_join_has_no_shuffle(spark):
    """Co-located join: two tables bucketed on the same key into the
    same bucket count join WITHOUT an exchange on either side — the
    pre-shuffled layout every big-big equi-join should use at 100 TB.
    (Tables land in the default spark-warehouse dir; dropped after.)
    """
    left = spark.range(0, 10000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("a")
    )
    right = spark.range(0, 10000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("b")
    )
    left.write.bucketBy(8, "k").sortBy("k").mode("overwrite") \
        .saveAsTable("t_bucket_left")
    right.write.bucketBy(8, "k").sortBy("k").mode("overwrite") \
        .saveAsTable("t_bucket_right")
    try:
        joined = spark.table("t_bucket_left").join(
            spark.table("t_bucket_right"), "k"
        )
        plan = explain_str(joined)
        assert "Exchange hashpartitioning" not in plan
        assert joined.count() == 10000
    finally:
        spark.sql("DROP TABLE IF EXISTS t_bucket_left")
        spark.sql("DROP TABLE IF EXISTS t_bucket_right")
