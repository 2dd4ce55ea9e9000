"""Property tests for the round-4 closing batch #2: random-projection
retrieval, sliding-window distinct users, ABC/Pareto classification,
and stratified split assignment.

Each is hash-checked against its DuckDB oracle by
tests/test_all_oracles.py; these tests pin semantics the oracle pair
could violate together: RP recall vs exact cosine (numpy), the
sliding distinct against a brute-force trailing-window recompute, the
Pareto cumulative shares against a sorted pure-Python pass (which
also exercises the distributed-prefix-sum path against the flat
spec), and the split's exact per-stratum proportions + determinism.
"""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

import numpy as np
import pyarrow.parquet as pq

from metadata_wrangler_spark import plans
from metadata_wrangler_spark.plans.vectors import _RP_C, _RP_PLANES

plans.load_all_plans()

SF = "/root/testdata/sf0.001"


def _cols(table, *cols):
    t = pq.read_table(f"{SF}/{table}.parquet", columns=list(cols))
    return list(zip(*(t.column(c).to_pylist() for c in cols)))


def test_rp_topk_recall_and_exactness(spark):
    t = pq.read_table(f"{SF}/embeddings.parquet")
    ids = np.array(t.column("vec_id").to_pylist())
    V = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    qmask = ids % 101 == 0
    S = Vn[qmask] @ Vn.T
    got = plans.QUERIES["sim_rp_topk"](spark, SF).collect()
    by_q = defaultdict(list)
    for r in got:
        by_q[r.query_id].append(r)
    assert set(by_q) == set(ids[qmask].tolist())
    hits = 0
    for qi, qid in enumerate(ids[qmask]):
        rows = sorted(by_q[qid], key=lambda r: r.rank)
        assert [r.rank for r in rows] == [1, 2, 3, 4, 5]
        # returned cosines are the EXACT similarities (rerank is exact)
        for r in rows:
            true = S[qi][ids == r.corpus_id][0]
            assert abs(r.cosine - round(true * 1e6) / 1e6) < 1e-9
        s = S[qi].copy()
        s[ids == qid] = -9
        exact = set(ids[np.lexsort((ids, -np.round(s * 1e6)))][:5])
        hits += len(exact & {r.corpus_id for r in rows})
    # measured 0.80 at this SF with the shipped 32-dim/100-candidate
    # constants; floor leaves slack for corpus regeneration
    assert hits / (qmask.sum() * 5) >= 0.6
    assert len(_RP_PLANES) == 32 and _RP_C == 100


def test_sliding_distinct_matches_brute_force(spark):
    day_users = defaultdict(set)
    for ts, uid in _cols("events", "ts", "user_id"):
        day_users[int(math.floor(ts.timestamp()) // 86400)].add(uid)
    days = sorted(day_users)
    expect = {
        d: len(set().union(*(day_users.get(d - k, set())
                             for k in range(7))))
        for d in days
    }
    got = {
        r.window_end_day: r.active_users
        for r in plans.QUERIES["ev_sliding_distinct"](spark, SF).collect()
    }
    assert got == expect
    # windows are supersets of single days
    assert all(got[d] >= len(day_users[d]) for d in days)


def test_abc_pareto_matches_pure_python(spark):
    rev = defaultdict(int)
    for sk, ep, disc in _cols("lineitem", "l_suppkey",
                              "l_extendedprice", "l_discount"):
        rev[sk] += int(math.floor(ep * (1 - disc) * 10_000 + 0.5))
    total = sum(rev.values())
    order = sorted(rev, key=lambda k: (-rev[k], k))
    expect, cum = {}, 0
    for rank, sk in enumerate(order, start=1):
        cum += rev[sk]
        ppm = (1_000_000 * cum) // total
        cls = "A" if ppm <= 800_000 else ("B" if ppm <= 950_000 else "C")
        expect[sk] = (rev[sk] / 10_000.0, rank, ppm, cls)
    got = {
        r.suppkey: (r.revenue, r.rev_rank, r.cum_share_ppm, r.abc_class)
        for r in plans.QUERIES["a_abc_pareto"](spark, SF).collect()
    }
    assert got == expect
    # classes are monotone along the rank order and all present
    classes = [got[sk][3] for sk in order]
    assert classes == sorted(classes)  # A* B* C*


def test_split_assign_proportions_and_determinism(spark):
    got = {
        r.doc_id: (r.lang, r.split)
        for r in plans.QUERIES["txt_split_assign"](spark, SF).collect()
    }
    # pure-python recompute
    strata = defaultdict(list)
    for doc_id, (lang, _) in got.items():
        strata[lang].append(doc_id)
    docs = _cols("documents", "doc_id", "lang")
    assert len(got) == len(docs)
    expect = {}
    by_lang = defaultdict(list)
    for doc_id, lang in docs:
        by_lang[lang].append(doc_id)
    for lang, ids in by_lang.items():
        n = len(ids)
        ordered = sorted(
            ids, key=lambda d: (hashlib.md5(str(d).encode()).hexdigest(), d)
        )
        for rn, d in enumerate(ordered, start=1):
            if 100 * rn <= 5 * n:
                expect[d] = (lang, "val")
            elif 100 * rn <= 15 * n:
                expect[d] = (lang, "test")
            else:
                expect[d] = (lang, "train")
    assert got == expect
    # exact proportions per stratum: floor(5%/10%) with the <= rule
    for lang, ids in by_lang.items():
        n = len(ids)
        n_val = sum(1 for d in ids if got[d][1] == "val")
        n_test = sum(1 for d in ids if got[d][1] == "test")
        assert n_val == (5 * n) // 100
        assert n_test == (15 * n) // 100 - (5 * n) // 100
    # rerun is identical (no RNG state anywhere)
    again = {
        r.doc_id: (r.lang, r.split)
        for r in plans.QUERIES["txt_split_assign"](spark, SF).collect()
    }
    assert again == got


def test_diversified_topk_dominance_semantics(spark):
    """Pairwise-dominance diversification: recompute in numpy —
    exact top-20, drop any candidate whose cosine to a HIGHER-ranked
    candidate exceeds theta, survivors re-rank top-5 — and require
    identical rows; also assert the filter actually fired on this
    corpus (some query returns a different set than plain top-5)."""
    t = pq.read_table(f"{SF}/embeddings.parquet")
    ids = np.array(t.column("vec_id").to_pylist())
    V = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    qmask = ids % 101 == 0
    S = Vn[qmask] @ Vn.T
    got = defaultdict(list)
    for r in plans.QUERIES["sim_diversified_topk"](spark, SF).collect():
        got[r.query_id].append((r.div_rank, r.corpus_id))
    n_dominated = 0
    for qi, qid in enumerate(ids[qmask]):
        s = S[qi].copy()
        s[ids == qid] = -9
        order = np.lexsort((ids, -np.round(s * 1e6)))[:20]
        cand = list(ids[order])
        keep = []
        for rank_b, cb in enumerate(cand):
            dominated = False
            vb = Vn[ids == cb][0]
            for rank_a in range(rank_b):
                va = Vn[ids == cand[rank_a]][0]
                if round(float(va @ vb) * 1e6) / 1e6 > 0.4:
                    dominated = True
                    break
            if not dominated:
                keep.append(cb)
            else:
                n_dominated += 1
        expect = keep[:5]
        mine = [c for _, c in sorted(got[qid])]
        assert mine == expect, qid
    # the dominance filter fires somewhere in the pools on this
    # corpus (top-5 membership may or may not change at this SF —
    # at sf0.01 it does; here the dominated items sit lower)
    assert n_dominated >= 1


def test_label_centroids_match_numpy(spark):
    """Per-label centroid eval: recompute cohesion/separation in
    numpy with the same 1e-7 quantization and fold-order dot."""
    t = pq.read_table(f"{SF}/embeddings.parquet")
    labels = np.array(t.column("label").to_pylist())
    V = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    cents = {}
    for lb in sorted(set(labels.tolist())):
        q = np.floor(V[labels == lb] * 10_000_000 + 0.5).astype(np.int64)
        cents[lb] = q.sum(axis=0).astype(np.float64)
    expect = {}
    for lb, c in cents.items():
        mem = V[labels == lb]
        cn = math.sqrt(float((c * c).sum()))
        coss = [
            float((v @ c) / (math.sqrt(float((v * v).sum())) * cn))
            for v in mem
        ]
        intra = sum(int(math.floor(x * 1e6 + 0.5)) for x in coss) \
            // len(coss)
        best = None
        for lb2, c2 in cents.items():
            if lb2 == lb:
                continue
            cc = float((c @ c2) / (cn * math.sqrt(float((c2 * c2).sum()))))
            r6 = (1 if cc >= 0 else -1) * math.floor(abs(cc) * 1e6 + 0.5) \
                / 1e6
            key = (-r6, lb2)
            if best is None or key < best[0]:
                best = (key, lb2, int(math.floor(r6 * 1e6 + 0.5)))
        expect[lb] = (len(mem), intra, best[1], best[2])
    got = {
        r.label: (r.n_vectors, r.intra_cos_ppm, r.nearest_label,
                  r.inter_cos_ppm)
        for r in plans.QUERIES["sim_label_centroids"](spark, SF).collect()
    }
    assert got == expect
    # members correlate positively with their own centroid (they are
    # its summands); no claim on inter-centroid order — the synthetic
    # labels carry little cluster structure, which is exactly what
    # this report exists to reveal
    assert all(v[1] > 0 for v in got.values())
    assert set(got) == set(cents)
