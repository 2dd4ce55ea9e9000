"""Fuzz the numpy cores of the closure local tiers against per-edge
reference implementations — no Spark session needed, so hundreds of
random graphs run in seconds.

The local tiers (operators/closure.py round-8 rewrite) must be
ROW-IDENTICAL to the distributed loops; tests/test_closure.py pins
the cross-tier equivalence on a handful of graphs, this file pins
the numpy cores themselves on randomized ones: chains (worst case
for label propagation), self-loops, duplicate and NULL edges,
off-graph seeds, zero-level walks, empty edge sets.
"""

from __future__ import annotations

import random

import numpy as np
import pandas as pd

from metadata_wrangler_spark.operators.closure import (
    bfs_levels_pdf,
    min_label_components_pdf,
)


def _ref_bfs(edges, seeds, levels):
    adj: dict[int, list[int]] = {}
    for u, v in edges:
        adj.setdefault(u, []).append(v)
    level_of = {s: 0 for s in set(seeds)}
    frontier = list(level_of)
    for lvl in range(1, levels + 1):
        nxt = []
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in level_of:
                    level_of[v] = lvl
                    nxt.append(v)
        if not nxt:
            break
        frontier = nxt
    return level_of


def _ref_components(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
    comp: dict[int, list[int]] = {}
    for n in nodes:
        comp.setdefault(find(n), []).append(n)
    out = {}
    for members in comp.values():
        m = min(members)
        for n in members:
            out[n] = m
    return out


def test_bfs_core_fuzz():
    rng = random.Random(3)
    for trial in range(300):
        m = rng.randint(0, 80)
        edges = list(
            {(rng.randint(0, 50), rng.randint(0, 50)) for _ in range(m)}
        )
        seeds = [rng.randint(0, 60) for _ in range(rng.randint(1, 4))]
        levels = rng.randint(0, 8)
        pdf = pd.DataFrame(
            {
                "_src": np.array([u for u, _ in edges], np.int64),
                "_dst": np.array([v for _, v in edges], np.int64),
            }
        )
        got = dict(
            zip(
                bfs_levels_pdf(pdf, seeds, levels)["node"].tolist(),
                bfs_levels_pdf(pdf, seeds, levels)["level"].tolist(),
            )
        )
        assert got == _ref_bfs(edges, seeds, levels), trial


def test_bfs_core_nulls_dups_empty():
    pdf = pd.DataFrame(
        {
            "_src": [1.0, 1.0, None, 2.0],
            "_dst": [2.0, 2.0, 3.0, None],
        }
    )
    got = bfs_levels_pdf(pdf, [1, 99], 6)
    assert dict(zip(got["node"], got["level"])) == {1: 0, 2: 1, 99: 0}
    empty = pd.DataFrame({"_src": pd.Series([], dtype="int64"),
                          "_dst": pd.Series([], dtype="int64")})
    got = bfs_levels_pdf(empty, [7], 6)
    assert dict(zip(got["node"], got["level"])) == {7: 0}


def test_components_core_fuzz():
    rng = random.Random(7)
    for trial in range(200):
        n = rng.randint(1, 40)
        m = rng.randint(0, 60)
        edges = [
            (rng.randint(0, 10**6), rng.randint(0, 10**6))
            for _ in range(m)
        ]
        base = rng.randint(0, 100)
        edges += [(base + i, base + i + 1) for i in range(n)]  # chain
        sym = edges + [(v, u) for u, v in edges]
        pdf = pd.DataFrame(
            {
                "a": np.array([u for u, _ in sym], np.int64),
                "b": np.array([v for _, v in sym], np.int64),
            }
        )
        out = min_label_components_pdf(pdf)
        got = dict(zip(out["node"].tolist(), out["component"].tolist()))
        nodes = {u for e in sym for u in e}
        assert got == _ref_components(sym, nodes), trial


def test_components_long_chain_converges_fast():
    # 10^4-node chain: O(log diameter) outer rounds, sub-second.
    chain = [(i, i + 1) for i in range(10_000)]
    sym = chain + [(v, u) for u, v in chain]
    pdf = pd.DataFrame(
        {
            "a": np.array([u for u, _ in sym], np.int64),
            "b": np.array([v for _, v in sym], np.int64),
        }
    )
    out = min_label_components_pdf(pdf)
    assert (out["component"] == 0).all()


def test_components_core_fuzz_directed_input():
    """The tier probe ships RAW DIRECTED edges since round 8 (the
    core symmetrizes internally — union-find is direction-blind):
    the directed spelling must produce the identical component map
    as the pre-symmetrized one, including directed chains whose min
    label sits at the SINK (reachable only against edge direction)."""
    rng = random.Random(11)
    for trial in range(200):
        n = rng.randint(1, 40)
        m = rng.randint(0, 60)
        edges = [
            (rng.randint(0, 10**6), rng.randint(0, 10**6))
            for _ in range(m)
        ]
        base = rng.randint(0, 100)
        # directed chain pointing DOWN toward base: min label is the
        # sink, so a direction-sensitive relaxation would stall.
        edges += [(base + i + 1, base + i) for i in range(n)]
        pdf = pd.DataFrame(
            {
                "a": np.array([u for u, _ in edges], np.int64),
                "b": np.array([v for _, v in edges], np.int64),
            }
        )
        out = min_label_components_pdf(pdf)
        got = dict(zip(out["node"].tolist(), out["component"].tolist()))
        nodes = {u for e in edges for u in e}
        assert got == _ref_components(edges, nodes), trial


def _ref_min_plus(edges, sources, hops):
    """Per-edge reference: min packed code over walks of <= hops
    edges from any source; sources get a zero-walk code-0 row."""
    best = {s: 0 for s in set(sources)}
    cur = dict(best)
    for _ in range(hops):
        nxt = dict(cur)
        for u, v, c in edges:
            if u in cur and cur[u] + c < nxt.get(v, float("inf")):
                nxt[v] = cur[u] + c
        if nxt == cur:
            break
        cur = nxt
    for k, v in cur.items():
        if v < best.get(k, float("inf")):
            best[k] = v
    return best


def test_min_plus_core_fuzz():
    from metadata_wrangler_spark.operators.closure import (
        bounded_min_plus_pdf,
    )

    rng = random.Random(11)
    for trial in range(300):
        m = rng.randint(0, 80)
        edges = list(
            {
                (rng.randint(0, 40), rng.randint(0, 40),
                 1000 * rng.randint(1, 97) + 1)
                for _ in range(m)
            }
        )
        sources = [rng.randint(0, 50) for _ in range(rng.randint(1, 3))]
        hops = rng.choice([2, 4, 6, 8])
        pdf = pd.DataFrame(
            {
                "u": np.array([e[0] for e in edges], np.int64),
                "v": np.array([e[1] for e in edges], np.int64),
                "code": np.array([e[2] for e in edges], np.int64),
            }
        )
        out = bounded_min_plus_pdf(pdf, sources, hops)
        got = dict(zip(out["node"].tolist(), out["code"].tolist()))
        assert got == _ref_min_plus(edges, sources, hops), trial


def test_min_plus_core_nulls_dups_empty():
    from metadata_wrangler_spark.operators.closure import (
        bounded_min_plus_pdf,
    )

    pdf = pd.DataFrame(
        {
            "u": [1.0, 1.0, None, 2.0],
            "v": [2.0, 2.0, 3.0, None],
            "code": [1001.0, 1001.0, 2001.0, 3001.0],
        }
    )
    out = bounded_min_plus_pdf(pdf, [1], 6)
    assert dict(zip(out["node"], out["code"])) == {1: 0, 2: 1001}
    empty = pd.DataFrame(
        {
            "u": pd.Series([], dtype="int64"),
            "v": pd.Series([], dtype="int64"),
            "code": pd.Series([], dtype="int64"),
        }
    )
    out = bounded_min_plus_pdf(empty, [7], 6)
    assert dict(zip(out["node"], out["code"])) == {7: 0}
    out = bounded_min_plus_pdf(empty, [], 6)
    assert len(out) == 0
