"""Property tests for the round-4 closing additions: neighbor-set
Jaccard link prediction, bipartite lift projection, half-life-decayed
engagement scores, and the per-document contamination fraction.

Each is already hash-checked against its DuckDB oracle by
tests/test_all_oracles.py; these tests pin the semantics against
independent pure-Python recomputations (both engines share generated
constants, so a shared spec bug would pass the oracle sweep).
"""

from __future__ import annotations

import datetime
import math
import re
from collections import Counter, defaultdict

import pyarrow.parquet as pq

from metadata_wrangler_spark import plans

plans.load_all_plans()

SF = "/root/testdata/sf0.001"


def _col(table, *cols):
    t = pq.read_table(f"{SF}/{table}.parquet", columns=list(cols))
    return list(zip(*(t.column(c).to_pylist() for c in cols)))


def test_neighbor_jaccard_matches_pure_python(spark):
    n = len(_col("customer", "c_custkey"))
    nbrs: dict[int, set[int]] = defaultdict(set)
    for (k,) in _col("customer", "c_custkey"):
        for dst in ((k * 7 + 3) % n, (k * 13 + 5) % n):
            if dst != k:
                nbrs[k].add(dst)
                nbrs[dst].add(k)
    expect = {}
    nodes = sorted(nbrs)
    # invert: for each neighbor, pair up the nodes that share it
    by_nbr: dict[int, list[int]] = defaultdict(list)
    for v, ns in nbrs.items():
        for u in ns:
            by_nbr[u].append(v)
    common: Counter = Counter()
    for vs in by_nbr.values():
        vs = sorted(vs)
        for i in range(len(vs)):
            for j in range(i + 1, len(vs)):
                common[(vs[i], vs[j])] += 1
    for (a, b), c in common.items():
        da, db = len(nbrs[a]), len(nbrs[b])
        ppm = (1_000_000 * c) // (da + db - c)
        if ppm >= 300_000:
            expect[(a, b)] = (c, da, db, ppm)
    got = {
        (r.node_a, r.node_b): (r.common, r.deg_a, r.deg_b, r.jaccard_ppm)
        for r in plans.QUERIES["g_neighbor_jaccard"](spark, SF).collect()
    }
    assert got == expect
    assert len(nodes) > 0 and len(expect) > 0  # non-vacuous


def test_bipartite_lift_matches_pure_python(spark):
    order_supps: dict[int, set[int]] = defaultdict(set)
    for ok, sk in _col("lineitem", "l_orderkey", "l_suppkey"):
        order_supps[ok].add(sk)
    n_orders = len(order_supps)
    supp_count: Counter = Counter()
    weight: Counter = Counter()
    for supps in order_supps.values():
        ss = sorted(supps)
        supp_count.update(ss)
        for i in range(len(ss)):
            for j in range(i + 1, len(ss)):
                weight[(ss[i], ss[j])] += 1
    expect = {}
    for (a, b), w in weight.items():
        lift_ppm = (1_000_000 * w * n_orders) // (
            supp_count[a] * supp_count[b]
        )
        if lift_ppm >= 1_100_000:
            expect[(a, b)] = (w, lift_ppm)
    got = {
        (r.supp_a, r.supp_b): (r.weight, r.lift_ppm)
        for r in plans.QUERIES["g_bipartite_project"](spark, SF).collect()
    }
    assert got == expect


def test_decay_halflife_matches_pure_python(spark):
    now = datetime.datetime(2024, 2, 1)
    score: Counter = Counter()
    purchase: Counter = Counter()
    n_ev: Counter = Counter()
    for uid, ts, et, v in _col("events", "user_id", "ts",
                               "event_type", "value"):
        age = int(now.timestamp() - math.floor(ts.timestamp()))
        shift = age // 604_800
        dv = int(math.floor(v * 10_000 + 0.5)) >> shift
        score[uid] += dv
        if et == "purchase":
            purchase[uid] += dv
        n_ev[uid] += 1
    got = {
        r.user_id: (r.decayed_score, r.decayed_purchase, r.n_events)
        for r in plans.QUERIES["ev_decay_halflife"](spark, SF).collect()
    }
    expect = {
        u: (score[u] / 10_000.0, purchase[u] / 10_000.0, n_ev[u])
        for u in n_ev
    }
    assert got == expect
    # decay is monotone: decayed score never exceeds the flat sum
    flat: Counter = Counter()
    for uid, v in _col("events", "user_id", "value"):
        flat[uid] += int(math.floor(v * 10_000 + 0.5))
    assert all(score[u] <= flat[u] for u in score)


def _words(text: str) -> list[str]:
    return re.sub(r"\s+", " ", text.lower()).strip().split(" ")


def test_contamination_frac_matches_pure_python(spark):
    N = 5
    eval_sh: set[str] = set()
    train: dict[int, list[str]] = {}
    for doc_id, text in _col("documents", "doc_id", "text"):
        w = _words(text)
        sh = ["_".join(w[i:i + N]) for i in range(len(w) - N + 1)]
        if doc_id % 13 == 7:
            eval_sh.update(sh)
        else:
            train[doc_id] = sh
    expect = {}
    for doc_id, sh in train.items():
        hits = sum(1 for s in sh if s in eval_sh)
        if hits:
            expect[doc_id] = (
                len(sh), hits, (1_000_000 * hits) // len(sh)
            )
    got = {
        r.doc_id: (r.n_windows, r.n_hits, r.contamination_ppm)
        for r in plans.QUERIES["txt_contamination_frac"](spark, SF).collect()
    }
    assert got == expect


def test_contamination_frac_tiers_row_identical(spark):
    """The contamination tier choice must only pick an implementation,
    never a result: the fused Arrow window-probe kernel (default) and
    the kept explode + broadcast-join spelling return identical rows —
    same normalization, same window multiplicity, same eval-set
    equality classes, same ppm integer arithmetic. sf0.01 exercises
    multi-batch kernel input."""
    from metadata_wrangler_spark.plans.documents import _contamination_frac

    for sf in (SF, "/root/testdata/sf0.01"):
        kern = _contamination_frac(spark, sf, arrow_kernel=True)
        join = _contamination_frac(spark, sf, arrow_kernel=False)
        assert sorted(map(tuple, kern.collect())) == sorted(
            map(tuple, join.collect())
        )
