"""Skew mitigation operators.

AQE's skew-join splitting (enabled in session.py) handles most
runtime skew; these are the explicit levers for the cases AQE can't
see:

  salted_agg       two-phase aggregation for a heavily skewed group
                   key: shuffle on (key, salt) first so no single
                   reducer owns a hot key, then combine the partials.
                   Works for any algebraic aggregate (sum/count/min/
                   max); the partial pass does the heavy lifting at
                   fan-in = n_salts.
  salted_join      replicate the SMALL side n_salts times and salt
                   the big side's key, so a hot key's rows spread
                   over n_salts reducers. For when the small side is
                   too big to broadcast but the big side is skewed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
    salt_source: Column | None = None,
) -> DataFrame:
    """Two-phase aggregation over a skewed key.

    ``aggs`` maps output column → (input column, fn) with fn in
    {sum, count, min, max}. The salt is deterministic (hash of the
    whole row's input column by default) — no RNG, so plans are
    reproducible and resumable.
    """
    first_in = next(iter(aggs.values()))[0]
    salt = (
        (F.abs(F.hash(salt_source if salt_source is not None
                      else F.col(first_in))) % n_salts)
        .alias("_salt")
    )
    partial_aggs = []
    final_aggs = []
    for out, (col, fn) in aggs.items():
        p = f"_p_{out}"
        if fn == "count":
            partial_aggs.append(F.count(col).alias(p))
            final_aggs.append(F.sum(p).alias(out))
        elif fn == "sum":
            partial_aggs.append(F.sum(col).alias(p))
            final_aggs.append(F.sum(p).alias(out))
        elif fn == "min":
            partial_aggs.append(F.min(col).alias(p))
            final_aggs.append(F.min(p).alias(out))
        elif fn == "max":
            partial_aggs.append(F.max(col).alias(p))
            final_aggs.append(F.max(p).alias(out))
        else:
            raise ValueError(f"non-algebraic aggregate {fn!r}")
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*key_cols, "_salt")
        .agg(*partial_aggs)
    )
    return partial.groupBy(*key_cols).agg(*final_aggs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
) -> DataFrame:
    """Inner equi-join with the big side's hot keys spread across
    ``n_salts`` reducers; the small side is replicated ×n_salts
    (explode of a literal range — no extra scan).

    The big side's salt hashes the WHOLE row (deterministic, no RNG)
    so rows of a hot key scatter uniformly; any salt assignment
    yields the same join result."""
    big_salted = big.withColumn(
        "_salt", F.abs(F.hash(*[F.col(c) for c in big.columns])) % n_salts
    )
    small_rep = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = big_salted.join(small_rep, [key, "_salt"])
    return out.drop("_salt")
