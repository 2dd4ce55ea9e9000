"""Property tests for the round-4 final additions: prefix-filtering
similarity join, BM25 retrieval, bounded shortest path, and the
distribution-position windows.

Each is already hash-checked against its DuckDB oracle by
tests/test_all_oracles.py; these tests pin the SEMANTIC invariants
with independent pure-Python reimplementations, so a spec bug shared
by both engine spellings would still be caught.
"""

from __future__ import annotations

import itertools
import re

from metadata_wrangler_spark import plans

plans.load_all_plans()

SF = "/root/testdata/sf0.001"


def _shingle_sets(spark):
    """Pure-Python 3-gram shingle sets per doc, straight off parquet."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    out = {}
    for r in docs:
        words = re.sub(r"\s+", " ", (r.text or "").lower()).strip().split(" ")
        out[int(r.doc_id)] = {
            "_".join(words[i : i + 3]) for i in range(len(words) - 2)
        }
    return out


def test_prefix_filter_join_equals_all_pairs(spark):
    """Exactness: prefix filtering is a lossless candidate filter —
    the result must equal naive all-pairs thresholding at t=3/5.
    (This is the property the `max_doc_freq` heuristic of the pruned
    Jaccard tier does NOT have; PPJoin's pitch is keeping it.)"""
    sets = _shingle_sets(spark)
    brute = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        union = len(sets[a]) + len(sets[b]) - inter
        if union and 5 * inter >= 3 * union:
            brute[(a, b)] = (inter, union)
    got = {
        (int(r.doc_a), int(r.doc_b)): (int(r.inter_n), int(r.union_n))
        for r in plans.QUERIES["dd_prefix_filter_join"](spark, SF).collect()
    }
    assert got == brute


def test_bm25_matches_pure_python(spark):
    """Top-10 and scores must match a from-scratch BM25 (k1=1.2,
    b=0.75, rational idf, 1e-6 per-term quantization)."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    toks = {
        int(r.doc_id): re.sub(r"\s+", " ", (r.text or "").lower())
        .strip()
        .split(" ")
        for r in docs
    }
    terms = ("dup", "vector", "window")
    n_docs = len(toks)
    avgdl = sum(len(w) for w in toks.values()) / n_docs
    df = {
        t: sum(1 for w in toks.values() if t in w) for t in terms
    }
    import math

    scores = {}
    for doc, words in toks.items():
        total, matched = 0, 0
        for t in terms:
            tf = words.count(t)
            if not tf:
                continue
            matched += 1
            idf = (n_docs - df[t] + 0.5) / (df[t] + 0.5)
            comp = (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (len(words) / avgdl)))
            total += math.floor(idf * comp * 1000000 + 0.5)
        if matched:
            scores[doc] = (matched, total / 1000000.0)
    expect = sorted(
        scores.items(), key=lambda kv: (-kv[1][1], kv[0])
    )[:10]
    got = sorted(
        (
            (int(r.doc_id), (int(r.n_terms), float(r.score)), int(r.rank))
            for r in plans.QUERIES["txt_bm25_search"](spark, SF).collect()
        ),
        key=lambda x: x[2],
    )
    assert [(d, s) for d, s, _ in got] == expect
    assert [r for _, _, r in got] == list(range(1, len(got) + 1))


def test_shortest_path_matches_hop_bounded_dp(spark):
    """dist/hops must equal the 6-round dynamic program over
    (hop, node) — min total weight over paths of <= 6 edges, hops of
    the min-dist path as tiebreak."""
    from metadata_wrangler_spark.plans.graph import build_edges

    edges = [
        (int(r.src), int(r.dst)) for r in build_edges(spark, SF).collect()
    ]
    wedges = [(s, d, 1 + (s * 3 + d) % 97) for s, d in edges]
    # layered DP: D[k][v] = min dist over paths of <= k edges. A
    # single (dist, hops) state per node would be wrong — a
    # longer-dist/fewer-hop path can still seed better extensions —
    # so keep the full hop dimension like the engine's round-indexed
    # relaxation does.
    layers = [{1: 0}]
    for _ in range(6):
        prev = layers[-1]
        cur = dict(prev)
        for s, d, w in wedges:
            if s in prev:
                cand = prev[s] + w
                if d not in cur or cand < cur[d]:
                    cur[d] = cand
        layers.append(cur)
    final = layers[6]
    best = {
        v: (
            final[v],
            min(k for k in range(7) if layers[k].get(v) == final[v]),
        )
        for v in final
    }
    got = {
        int(r.node): (int(r.dist), int(r.hops))
        for r in plans.QUERIES["g_shortest_path"](spark, SF).collect()
    }
    assert got == best


def test_percent_rank_cume_dist_definitions(spark):
    """(rank-1)/(n-1) and rows<=x/n, computed by hand per segment."""
    res = plans.QUERIES["w_percent_rank_cume"](spark, SF).collect()
    by_seg: dict[str, list] = {}
    for r in res:
        by_seg.setdefault(r.c_mktsegment, []).append(r)
    assert by_seg, "filter must keep rows at sf0.001"
    for seg, rws in by_seg.items():
        ordered = sorted(rws, key=lambda r: (r.c_acctbal, r.c_custkey))
        n = len(ordered)
        for i, r in enumerate(ordered):
            # c_custkey in the ORDER BY makes every row its own peer
            # group, so rank == position and cume_dist == (i+1)/n
            expect_pr = 0.0 if n == 1 else i / (n - 1)
            assert float(r.pct_rank) == expect_pr
            assert float(r.cume_dist) == (i + 1) / n


def test_kcore_converges_and_matches_unbounded_peel(spark):
    """The 4-round bounded peel must (a) equal an unbounded peel to
    fixpoint at this SF (convergence) and (b) report degrees within
    the final core."""
    from metadata_wrangler_spark.catalog import load

    n = load(spark, SF, "customer").count()
    edges = set()
    for i in range(n):
        for j in range(1 + i % 4):
            d = (i * (7 + 2 * j) + 3 + 5 * j) % n
            if d != i:
                edges.add((min(i, d), max(i, d)))
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    nodes = set(adj)
    while True:
        keep = {v for v in nodes if sum(1 for u in adj[v] if u in nodes) >= 3}
        if keep == nodes:
            break
        nodes = keep
    expect = {
        v: sum(1 for u in adj[v] if u in nodes) for v in nodes
    }
    got = {
        int(r.node): int(r.core_deg)
        for r in plans.QUERIES["g_kcore"](spark, SF).collect()
    }
    assert got == expect


def test_regex_path_match_counts_conversions(spark):
    """Recompute paths + conversion counts in pure Python from the
    raw events (time-then-id order, non-overlapping greedy cv*p)."""
    from metadata_wrangler_spark.catalog import load

    ev = load(spark, SF, "events").select(
        "user_id", "ts", "event_id", "event_type"
    ).collect()
    paths: dict[int, list] = {}
    for r in ev:
        paths.setdefault(int(r.user_id), []).append(
            (r.ts, int(r.event_id), r.event_type[0])
        )
    expect = {}
    for uid, evs in paths.items():
        path = "".join(c for _, _, c in sorted(evs))
        n_conv = len(re.findall(r"cv*p", path))
        if n_conv >= 2:
            expect[uid] = (path, len(evs), n_conv)
    got = {
        int(r.user_id): (r.path, int(r.n_events), int(r.n_conversions))
        for r in plans.QUERIES["ev_regex_path_match"](spark, SF).collect()
    }
    assert got == expect


def test_histogram_buckets_partition_the_rows(spark):
    """Bucket counts must sum to the table count, edges must tile
    [min, max], and every row must fall inside its bucket's range
    (right-open except the last)."""
    from metadata_wrangler_spark.catalog import load

    li = load(spark, SF, "lineitem")
    total = li.count()
    res = sorted(
        plans.QUERIES["a_histogram"](spark, SF).collect(),
        key=lambda r: r.bucket,
    )
    assert sum(r.n for r in res) == total
    prices = [float(r.l_extendedprice) for r in li.collect()]
    mn, mx = min(prices), max(prices)
    assert res[0].lo == mn and abs(res[-1].hi - mx) < 1e-9
    for prev, cur in zip(res, res[1:]):
        assert prev.hi == cur.lo
    width = (mx - mn) / 10.0
    import collections

    expect = collections.Counter(
        min(9, int((p - mn) // width)) for p in prices
    )
    assert {r.bucket: r.n for r in res} == dict(expect)
