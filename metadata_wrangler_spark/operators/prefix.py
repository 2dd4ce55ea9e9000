"""Distributed global order statistics — rank / running sum over a
total order WITHOUT an `Exchange SinglePartition`.

The textbook trap: ``row_number().over(Window.orderBy(...))`` or a
global cumulative ``sum().over(...)`` forces every row through ONE
partition — the plan Spark itself warns about ("No Partition Defined
for Window operation") and the first thing that dies at 100 TB. Two
plans in this engine already dodge it with hand-rolled monotone
bucketing (`ev_concurrency_sweep` buckets by hour,
`a_abc_pareto` by revenue bit-length); this operator is the general,
SKEW-PROOF spelling both of those approximate:

  1. ``repartitionByRange(P, *order)`` — Spark samples the sort key
     and assigns contiguous key ranges to partitions 0..P-1, so
     partition id is MONOTONE in the requested order and partition
     sizes are balanced by construction (no data-dependent bucket
     skew: a value that dominates the distribution still spreads
     over at most two boundary partitions' worth of rows — the
     range partitioner splits on the FULL order tuple, ties
     included).
  2. Within-partition ``row_number`` / running ``sum`` via a window
     PARTITIONED by ``spark_partition_id()`` — P parallel tasks,
     each sorting ~n/P rows.
  3. Per-partition totals (one tiny P-row aggregate) turned into
     starting offsets by a broadcast triangular join over the
     bucket ids (P² pairs; P is a config constant, never a function
     of data size).
  4. global rank = offset_count + local rank;
     global cum  = offset_sum  + local cum.

The one extra cost vs the single-partition plan is the range
partitioner's sampling pass — the same pass a global ``orderBy``
already pays — and one balanced shuffle. Both scale linearly.

This is the exact-total-order tier; when an approximate answer is
acceptable, prefer the sketch tier (`a_percentile_cont`'s
per-group aggregate, KMV/HLL in plans/events.py) which needs no
order at all.

Reference: the percentile utility this generalizes is
`/root/reference/bin/util/calculate_percentile:11-36` (a psql
``percentile_disc`` one-liner — single-node by construction).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

_B = "__gos_bucket"


def global_order_stats(
    df: DataFrame,
    order: Sequence[Column],
    *,
    group_cols: Sequence[str] = (),
    cum_cols: Sequence[str] = (),
    rank_col: str | None = "rn",
    npart: int | None = None,
) -> DataFrame:
    """Add a ``rank_col`` (1-based ``row_number`` over
    ``ORDER BY *order``) and, for each name in ``cum_cols``, a
    running-total column ``cum_<name>`` (rows unbounded-preceding to
    current), computed with the range-bucketed prefix scheme above —
    no stage ever holds more than ~n/P rows.

    ``group_cols`` (optional) makes every statistic PER GROUP —
    the skew-proof replacement for ``Window.partitionBy(flag)``
    over a LOW-CARDINALITY key, where "parallel across groups"
    still means one task sorts ``n/|groups|`` rows (a third of the
    fact table for a 3-value flag — the same serialization trap as
    the global window, wearing a partition key). Groups lead the
    range sort, so each group occupies a contiguous bucket range;
    the offset join adds a group-equality conjunct and the totals
    table stays ≤ P + |groups| rows.

    ``order`` are Column sort expressions with direction applied
    (``F.asc(...)`` / ``F.desc(...)``); together with the group
    they must be a TOTAL order (add a unique tiebreak) and non-null
    — otherwise ranks inside a tie group follow partition order and
    differ between engines. Output values are independent of
    ``npart`` and of where the sampled range boundaries fall:
    boundaries respect the full (group, order) tuple, so every tie
    group is contiguous across at most one partition edge and local
    ranks + offsets compose to the same numbers.
    """
    if npart is None:
        npart = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        )
    gcols = list(group_cols)
    sort_exprs = [F.asc(g) for g in gcols] + list(order)
    # localCheckpoint is LOAD-BEARING: the bucketed frame feeds two
    # consumers (the windowed side and the offsets aggregate, which
    # rides a broadcast build and therefore plans as a separate
    # subtree). Without pinning, each consumer can re-execute the
    # range exchange with its OWN sampled boundaries — bucket ids
    # then disagree between the sides and offsets are added to the
    # wrong rows (observed: per-group row counts flapping run to
    # run in a_weighted_median before this line existed). One
    # materialization of the projected input, same storage class as
    # a shuffle write.
    b = (
        df.repartitionByRange(npart, *sort_exprs)
        .withColumn(_B, F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    w = W.partitionBy(_B, *gcols).orderBy(*order)
    wcum = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    loc = b
    if rank_col is not None:
        loc = loc.withColumn(rank_col, F.row_number().over(w).cast("bigint"))
    for c in cum_cols:
        loc = loc.withColumn(f"cum_{c}", F.sum(c).over(wcum))

    aggs = [F.count(F.lit(1)).alias("__gos_n")] + [
        F.sum(c).alias(f"__gos_s_{c}") for c in cum_cols
    ]
    totals = b.groupBy(_B, *gcols).agg(*aggs)
    t1 = totals.select(
        F.col(_B).alias("__gos_a"),
        *[F.col(g).alias(f"__gos_g_{g}") for g in gcols],
    ).distinct()
    t2 = totals.withColumnRenamed(_B, "__gos_b")
    cond = F.col("__gos_b") < F.col("__gos_a")
    for g in gcols:
        # eqNullSafe: Window.partitionBy (the spelling this replaces)
        # treats NULL as a normal partition; plain `=` would silently
        # drop NULL-keyed groups from the offsets (and, below, from
        # the output entirely).
        cond = cond & F.col(g).eqNullSafe(F.col(f"__gos_g_{g}"))
    offsets = (
        t1.join(F.broadcast(t2), cond, "left")
        .groupBy("__gos_a", *[f"__gos_g_{g}" for g in gcols])
        .agg(
            F.coalesce(F.sum("__gos_n"), F.lit(0)).alias("__gos_off_n"),
            *[
                F.coalesce(F.sum(f"__gos_s_{c}"), F.lit(0)).alias(
                    f"__gos_off_{c}"
                )
                for c in cum_cols
            ],
        )
        .withColumnRenamed("__gos_a", _B)
    )
    # Keep offsets' group columns under their __gos_g_ aliases and
    # join null-safely — a using-join on the group names would drop
    # every NULL-keyed row (same trap as the triangular join above).
    jcond = loc[_B] == offsets[_B]
    for g in gcols:
        jcond = jcond & loc[g].eqNullSafe(offsets[f"__gos_g_{g}"])
    out = loc.join(F.broadcast(offsets), jcond).drop(offsets[_B])
    for g in gcols:
        out = out.drop(offsets[f"__gos_g_{g}"])
    if rank_col is not None:
        out = out.withColumn(
            rank_col, F.col("__gos_off_n") + F.col(rank_col)
        )
    for c in cum_cols:
        out = out.withColumn(
            f"cum_{c}", F.col(f"__gos_off_{c}") + F.col(f"cum_{c}")
        )
    drop = [_B, "__gos_off_n"] + [f"__gos_off_{c}" for c in cum_cols]
    return out.drop(*drop)
