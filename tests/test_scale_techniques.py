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


# --- distributed global order statistics (operators/prefix.py) -------------


def test_global_order_stats_matches_flat_window(spark):
    """The range-bucketed prefix scheme must reproduce the flat
    global window EXACTLY — rank and running sum — on skewed data
    (one value covering a third of all rows, so range boundaries
    land inside a tie run) and regardless of bucket count."""
    from pyspark.sql import Window as W

    from metadata_wrangler_spark.operators.prefix import global_order_stats

    df = spark.range(0, 900).select(
        F.col("id"),
        # heavy skew: ids 0..299 share key 7; the rest spread out
        F.when(F.col("id") < 300, F.lit(7))
        .otherwise((F.col("id") * 37) % 101).alias("k"),
        ((F.col("id") * 13) % 50 + 1).alias("v"),
    )
    order = [F.asc("k"), F.asc("id")]
    got = {
        r["id"]: (r["rn"], r["cum_v"])
        for r in global_order_stats(
            df, order, cum_cols=["v"], npart=7
        ).collect()
    }
    flat = W.orderBy(*order)
    want = {
        r["id"]: (r["rn"], r["cum_v"])
        for r in df.select(
            "id",
            F.row_number().over(flat).cast("bigint").alias("rn"),
            F.sum("v").over(
                flat.rowsBetween(W.unboundedPreceding, W.currentRow)
            ).alias("cum_v"),
        ).collect()
    }
    assert got == want


def test_global_order_stats_descending_and_rankless(spark):
    """Descending primary order; cum-only mode (rank_col=None)."""
    from pyspark.sql import Window as W

    from metadata_wrangler_spark.operators.prefix import global_order_stats

    df = spark.range(0, 400).select(
        F.col("id"), ((F.col("id") * 7) % 23).alias("k")
    )
    order = [F.desc("k"), F.asc("id")]
    got = {
        r["id"]: r["cum_k"]
        for r in global_order_stats(
            df, order, cum_cols=["k"], rank_col=None, npart=5
        ).collect()
    }
    flat = W.orderBy(*order).rowsBetween(W.unboundedPreceding, W.currentRow)
    want = {
        r["id"]: r["cum_k"]
        for r in df.select("id", F.sum("k").over(flat).alias("cum_k"))
        .collect()
    }
    assert got == want


def test_global_order_stats_plan_has_no_single_partition_window(spark):
    """The operator's own plan must pass the audit it exists to
    satisfy: every window partitioned, offsets via broadcast join."""
    import os
    import sys

    sys.path.insert(
        0,
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tools",
        ),
    )
    from plan_audit import single_partition_windows

    from metadata_wrangler_spark.operators.prefix import global_order_stats

    df = spark.range(0, 100).select(
        F.col("id"), (F.col("id") % 9).alias("k")
    )
    out = global_order_stats(
        df, [F.asc("k"), F.asc("id")], cum_cols=["k"]
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert not single_partition_windows(plan)


def test_global_order_stats_grouped_matches_flat_window(spark):
    """group_cols mode must equal Window.partitionBy(group) exactly
    — rank and running sum — including groups that span range-bucket
    boundaries (3 groups over 6 buckets guarantees it)."""
    from pyspark.sql import Window as W

    from metadata_wrangler_spark.operators.prefix import global_order_stats

    df = spark.range(0, 1200).select(
        F.col("id"),
        (F.col("id") % 3).cast("string").alias("g"),
        ((F.col("id") * 31) % 97).alias("v"),
    )
    got = {
        r["id"]: (r["rn"], r["cum_v"])
        for r in global_order_stats(
            df, [F.asc("v"), F.asc("id")], group_cols=["g"],
            cum_cols=["v"], npart=6,
        ).collect()
    }
    flat = W.partitionBy("g").orderBy("v", "id")
    want = {
        r["id"]: (r["rn"], r["cum_v"])
        for r in df.select(
            "id",
            F.row_number().over(flat).cast("bigint").alias("rn"),
            F.sum("v").over(
                flat.rowsBetween(W.unboundedPreceding, W.currentRow)
            ).alias("cum_v"),
        ).collect()
    }
    assert got == want


def test_global_order_stats_grouped_null_keys_match_flat_window(spark):
    """NULL group keys are a normal partition under
    Window.partitionBy; the bucketed spelling must keep them too.
    Regression test for the round-5 defect: plain `=` in the offsets
    triangular join and a using-join on the group names both drop
    NULL-keyed rows from the output entirely (txt_split_assign /
    txt_sequence_packing group on nullable documents columns)."""
    from pyspark.sql import Window as W

    from metadata_wrangler_spark.operators.prefix import global_order_stats

    df = spark.range(0, 900).select(
        F.col("id"),
        # ~a third of rows NULL-keyed, interleaved with two groups
        F.when(F.col("id") % 3 == 0, F.lit(None).cast("string"))
        .otherwise((F.col("id") % 3).cast("string")).alias("g"),
        ((F.col("id") * 31) % 97).alias("v"),
    )
    out = global_order_stats(
        df, [F.asc("v"), F.asc("id")], group_cols=["g"],
        cum_cols=["v"], npart=6,
    )
    got = {r["id"]: (r["rn"], r["cum_v"]) for r in out.collect()}
    assert len(got) == 900, "NULL-keyed rows vanished from the output"
    flat = W.partitionBy("g").orderBy("v", "id")
    want = {
        r["id"]: (r["rn"], r["cum_v"])
        for r in df.select(
            "id",
            F.row_number().over(flat).cast("bigint").alias("rn"),
            F.sum("v").over(
                flat.rowsBetween(W.unboundedPreceding, W.currentRow)
            ).alias("cum_v"),
        ).collect()
    }
    assert got == want


def test_global_order_stats_distributed_tier_matches_driver_tier(spark):
    """The triangular-join offsets tier (taken when the totals table
    exceeds the driver bound) must produce the same output as the
    driver-side cumsum tier that small runs take — including NULL
    group keys and running sums. Forces the fallback by shrinking
    the bound."""
    from metadata_wrangler_spark.operators import prefix

    df = spark.range(0, 600).select(
        F.col("id"),
        F.when(F.col("id") % 4 == 0, F.lit(None).cast("string"))
        .otherwise((F.col("id") % 4).cast("string")).alias("g"),
        ((F.col("id") * 13) % 41).alias("v"),
    )
    kw = dict(group_cols=["g"], cum_cols=["v"], npart=5,
              total_col="n_total")
    small = {
        r["id"]: (r["rn"], r["cum_v"], r["n_total"])
        for r in prefix.global_order_stats(
            df, [F.asc("v"), F.asc("id")], **kw
        ).collect()
    }
    orig = prefix._DRIVER_TOTALS_MAX
    prefix._DRIVER_TOTALS_MAX = 1  # totals has 5×4=20 rows > 1
    try:
        big = {
            r["id"]: (r["rn"], r["cum_v"], r["n_total"])
            for r in prefix.global_order_stats(
                df, [F.asc("v"), F.asc("id")], **kw
            ).collect()
        }
    finally:
        prefix._DRIVER_TOTALS_MAX = orig
    assert len(small) == 600
    assert small == big


def test_global_order_stats_total_col_matches_group_counts(spark):
    """total_col attaches the per-group row count (the extra
    aggregate callers used to pay a separate job for)."""
    from metadata_wrangler_spark.operators.prefix import global_order_stats

    df = spark.range(0, 300).select(
        F.col("id"), (F.col("id") % 3).cast("string").alias("g")
    )
    out = global_order_stats(
        df, [F.asc("id")], group_cols=["g"], total_col="n_total",
        npart=4,
    )
    got = {(r["g"], r["n_total"]) for r in out.collect()}
    assert got == {("0", 100), ("1", 100), ("2", 100)}
    # ungrouped: total = full row count on every row
    out2 = global_order_stats(
        df, [F.asc("id")], total_col="n_total", npart=4
    )
    assert {r["n_total"] for r in out2.collect()} == {300}


def test_global_order_stats_repeated_runs_are_stable(spark):
    """The bucketed frame feeds two plan subtrees (windows + the
    broadcast offsets build). Before the operator pinned it with
    localCheckpoint, each subtree could re-sample its OWN range
    boundaries — bucket ids disagreed between the sides and the
    offset join attached wrong (or no) offsets: a_weighted_median's
    per-group row counts FLAPPED across executions. Five runs must
    produce identical full outputs."""
    from metadata_wrangler_spark.operators.prefix import global_order_stats

    df = spark.range(0, 20000).select(
        F.col("id"),
        (F.col("id") % 3).cast("string").alias("g"),
        ((F.col("id") * 17) % 5000).alias("v"),
    )
    outs = set()
    for _ in range(5):
        rows = global_order_stats(
            df, [F.asc("v"), F.asc("id")], group_cols=["g"],
            cum_cols=["v"], npart=7,
        ).groupBy("g").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("rn").alias("srn"),
            F.sum("cum_v").alias("scum"),
        ).collect()
        outs.add(tuple(sorted(tuple(r) for r in rows)))
    assert len(outs) == 1, f"unstable across runs: {len(outs)} variants"
