"""Property tests for the round-4 late additions: triangle counting,
bloom-prune join, sorted-neighborhood blocking, gap-fill, grouped
regression, and the inverted-index build.

Each operator is already hash-checked against its DuckDB oracle by
tests/test_all_oracles.py; these tests pin the SEMANTIC invariants a
matching pair of wrong implementations could still violate together
(both engines share the generated-constant spellings, so a shared
spec bug would pass the oracle sweep).
"""

from __future__ import annotations

import itertools

import pytest

from metadata_wrangler_spark import plans

plans.load_all_plans()

SF = "/root/testdata/sf0.001"


def test_triangle_count_matches_brute_force(spark):
    from metadata_wrangler_spark.plans.graph import build_edges

    edges = [
        (int(r.src), int(r.dst))
        for r in build_edges(spark, SF).collect()
    ]
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    adj: dict[int, set[int]] = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    brute: dict[int, int] = {}
    for a, b in und:
        for c in adj[a] & adj[b]:
            # count each triangle once per corner via ordered check
            if c > b:
                for n in (a, b, c):
                    brute[n] = brute.get(n, 0) + 1
    got = {
        int(r.node): int(r.n_tri)
        for r in plans.QUERIES["g_triangle_count"](spark, SF).collect()
    }
    assert got == brute


def test_bloom_prune_has_no_false_negatives(spark):
    """Every order whose customer IS in the needle set must pass the
    bloom (bloom filters never drop true members), and the reported
    pass count can only exceed the true count (false positives)."""
    from metadata_wrangler_spark.catalog import load
    import pyspark.sql.functions as F

    res = {
        r.o_orderpriority: (int(r.n_bloom_pass), int(r.n_true))
        for r in plans.QUERIES["j_bloom_prune"](spark, SF).collect()
    }
    cust = load(spark, SF, "customer")
    orders = load(spark, SF, "orders")
    needles = {
        int(r.c_custkey)
        for r in cust.where(F.col("c_nationkey") == 3).collect()
    }
    true_counts: dict[str, int] = {}
    for r in orders.select("o_custkey", "o_orderpriority").collect():
        if int(r.o_custkey) in needles:
            true_counts[r.o_orderpriority] = (
                true_counts.get(r.o_orderpriority, 0) + 1
            )
    for prio, n_true in true_counts.items():
        n_pass, n_true_reported = res[prio]
        assert n_true_reported == n_true
        assert n_pass >= n_true


def test_sorted_neighborhood_pairs_are_verified_near_dups(spark):
    """Every emitted pair must truly have word-set Jaccard >= 0.4
    (no unverified candidates leak through), ids must be distinct,
    and the exact-duplicate pairs that share a full 16-char key
    prefix AND a block must be found."""
    from metadata_wrangler_spark.catalog import load
    import pyspark.sql.functions as F

    docs = {
        int(r.doc_id): r.text
        for r in load(spark, SF, "documents").collect()
    }

    def norm_words(t):
        return set(" ".join(t.lower().split()).split(" "))

    emitted = plans.QUERIES["dd_sorted_neighborhood"](spark, SF).collect()
    assert emitted, "expected at least one near-dup pair at sf0.001"
    for r in emitted:
        wa, wb = norm_words(docs[int(r.id_a)]), norm_words(docs[int(r.id_b)])
        jac = len(wa & wb) / len(wa | wb)
        assert r.id_a != r.id_b
        assert jac == pytest.approx(r.jaccard)
        assert jac >= 0.4


def test_gap_fill_spine_is_dense_and_carries_forward(spark):
    rows = plans.QUERIES["ev_gap_fill"](spark, SF).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(int(r.user_id), []).append(r)
    assert by_user
    for user, rs in by_user.items():
        rs.sort(key=lambda r: r.hr)
        hrs = [int(r.hr) for r in rs]
        # dense spine: every hour between min and max present exactly once
        assert hrs == list(range(hrs[0], hrs[-1] + 1))
        # endpoints observed (spine is bounded by real events)
        assert rs[0].observed == 1 and rs[-1].observed == 1
        last = None
        for r in rs:
            if r.observed:
                last = r.filled_vmax
            else:
                assert r.filled_vmax == last
        assert all(r.filled_vmax is not None for r in rs)


def test_regr_trend_matches_numpy_least_squares(spark):
    np = pytest.importorskip("numpy")
    from metadata_wrangler_spark.catalog import load

    li = load(spark, SF, "lineitem")
    pt = load(spark, SF, "part")
    joined = li.join(pt, li.l_partkey == pt.p_partkey).select(
        "p_brand", "l_quantity", "l_extendedprice"
    )
    by_brand: dict[str, list] = {}
    for r in joined.collect():
        by_brand.setdefault(r.p_brand, []).append(
            (r.l_quantity, r.l_extendedprice)
        )
    got = {
        r.p_brand: (float(r.slope), float(r.intercept), int(r.n))
        for r in plans.QUERIES["a_regr_trend"](spark, SF).collect()
    }
    assert set(got) == set(by_brand)
    for brand, pts in by_brand.items():
        x = np.array([p[0] for p in pts])
        y = np.array([p[1] for p in pts])
        slope, intercept = np.polyfit(x, y, 1)
        # engine quantizes inputs at 1e-2 — allow that much slack
        assert got[brand][0] == pytest.approx(slope, abs=2e-3)
        assert got[brand][1] == pytest.approx(intercept, abs=2.0)
        assert got[brand][2] == len(pts)


def test_inverted_index_postings_sorted_and_df_consistent(spark):
    from metadata_wrangler_spark.catalog import load

    docs = [(int(r.doc_id), r.text) for r in load(spark, SF, "documents").collect()]
    df_brute: dict[str, set] = {}
    for doc_id, text in docs:
        for w in set(" ".join(text.lower().split()).split(" ")):
            if len(w) >= 3:
                df_brute.setdefault(w, set()).add(doc_id)
    rows = plans.QUERIES["txt_inverted_index"](spark, SF).collect()
    expected = {w: ids for w, ids in df_brute.items() if len(ids) >= 5}
    got = {r.word: r for r in rows}
    assert set(got) == set(expected)
    for w, r in got.items():
        assert int(r.df) == len(expected[w])
        postings = [int(x) for x in r.postings_head.split(",")]
        assert postings == sorted(expected[w])[:20]
