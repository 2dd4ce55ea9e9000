"""Z-order (Morton) clustering keys for multi-dimensional data
skipping.

A table range-partitioned/sorted by a single column prunes scans on
that column only; interleaving the bits of TWO normalized columns
into one Morton key makes files/row-groups tight in BOTH dimensions,
so a 2-D box predicate (e.g. ``partkey BETWEEN .. AND suppkey
BETWEEN ..``) skips most of the layout — the technique behind
Delta/Iceberg ``OPTIMIZE ZORDER BY``.

Everything here is closed-form column arithmetic (shifts, masks,
adds) so the identical key is computable in any engine — the DuckDB
oracle spelling is generated from the same constants
(`zorder_sql`), and the key is stable across partitionings.

Reference: the reference orders its feeds by single-column indexes
(`model.py` coverage timestamp indexes); z-order is the
scale-generalization when scans filter on two axes at once.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# bits per dimension (2 dims -> 32-bit Morton key)
ZBITS = 16
ZCAP = 1 << ZBITS


def normalize_dim(col: Column, lo: Column, hi: Column) -> Column:
    """Map col from [lo, hi] onto the integer grid [0, 2^ZBITS).

    Spelled floor(double * scale / span) — the SAME IEEE ops as the
    SQL twin, so both engines land every value on the same cell even
    at rounding boundaries."""
    span = (hi - lo + 1).cast("double")
    return F.floor(
        (col - lo).cast("double") * float(ZCAP) / span
    ).cast("bigint")


def normalize_dim_sql(col: str, lo: str, hi: str) -> str:
    return (
        f"CAST(floor(CAST({col} - {lo} AS DOUBLE) * {float(ZCAP)} "
        f"/ CAST({hi} - {lo} + 1 AS DOUBLE)) AS BIGINT)"
    )


def zorder_col(xb: Column, yb: Column) -> Column:
    """Interleave two ZBITS-wide bucket ids into one Morton key:
    bit i of x lands at 2i, bit i of y at 2i+1."""
    z = F.lit(0).cast("bigint")
    for i in range(ZBITS):
        z = (
            z
            + F.shiftleft(F.shiftright(xb, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(
                F.shiftright(yb, i).bitwiseAND(F.lit(1)), 2 * i + 1
            )
        )
    return z


def zorder_sql(xb: str, yb: str) -> str:
    """DuckDB spelling of zorder_col, generated from the same
    constants."""
    terms = []
    for i in range(ZBITS):
        terms.append(f"((({xb} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({yb} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"
