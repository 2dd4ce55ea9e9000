"""Property tests for the closing batch #6: language-ID confusion
matrix, journey edit-similarity, and directional association rules —
pure-Python recomputations plus semantic invariants.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pyarrow.parquet as pq

from metadata_wrangler_spark import plans

plans.load_all_plans()

SF = "/root/testdata/sf0.001"


def _cols(table, *cols):
    t = pq.read_table(f"{SF}/{table}.parquet", columns=list(cols))
    return list(zip(*(t.column(c).to_pylist() for c in cols)))


def test_lang_confusion_consistent_with_langid(spark):
    pred = {
        r.doc_id: r.predicted_lang
        for r in plans.QUERIES["txt_language_id"](spark, SF).collect()
    }
    labels = dict(_cols("documents", "doc_id", "lang"))
    cells = Counter((labels[d], p) for d, p in pred.items())
    row_tot = Counter()
    for (lang, _), n in cells.items():
        row_tot[lang] += n
    got = {
        (r.lang, r.predicted_lang): (r.n, r.share_ppm, r.is_correct)
        for r in plans.QUERIES["txt_lang_confusion"](spark, SF).collect()
    }
    assert set(got) == set(cells)
    for (lang, p), n in cells.items():
        assert got[(lang, p)] == (
            n, (1_000_000 * n) // row_tot[lang], lang == p
        )
    # shares per declared language sum to ~1e6
    sums = Counter()
    for (lang, _), (_, ppm, _) in got.items():
        sums[lang] += ppm
    assert all(1_000_000 - 20 <= s <= 1_000_000 for s in sums.values())


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, start=1):
        cur = [i]
        for j, cb in enumerate(b, start=1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_path_edit_similarity_matches_pure_python(spark):
    sessions = defaultdict(list)
    for uid, eid, ts, et in _cols("events", "user_id", "event_id",
                                  "ts", "event_type"):
        day = int(math.floor(ts.timestamp()) // 86400)
        sessions[(uid, day)].append((ts, eid, et[0]))
    expect = {}
    for (uid, day), seq in sessions.items():
        seq.sort()
        path = "".join(c for _, _, c in seq)
        d = _lev(path, "vcp")
        m = max(len(path), 3)
        expect[(uid, day)] = (path, d, (1_000_000 * (m - d)) // m)
    got = {
        (r.user_id, r.day): (r.path, r.edit_dist, r.similarity_ppm)
        for r in plans.QUERIES["w_path_edit_similarity"](spark, SF)
        .collect()
    }
    assert got == expect
    # a perfect conversion day scores 1e6; anything else strictly less
    assert all(
        (v[2] == 1_000_000) == (v[0] == "vcp") for v in got.values()
    )


def test_assoc_rules_match_pure_python(spark):
    order_supps = defaultdict(set)
    for ok, sk in _cols("lineitem", "l_orderkey", "l_suppkey"):
        order_supps[ok].add(sk)
    n_orders = len(order_supps)
    cnt, joint = Counter(), Counter()
    for supps in order_supps.values():
        cnt.update(supps)
        for a in supps:
            for b in supps:
                if a != b:
                    joint[(a, b)] += 1
    expect = {}
    for (a, b), w in joint.items():
        conf = (1_000_000 * w) // cnt[a]
        if conf >= 50_000:
            expect[(a, b)] = (w, conf, (1_000_000 * w) // n_orders)
    got = {
        (r.antecedent, r.consequent):
            (r.n_joint, r.confidence_ppm, r.support_ppm)
        for r in plans.QUERIES["a_assoc_rules"](spark, SF).collect()
    }
    assert got == expect
    # confidence is directional: some surviving rule's reverse fails
    # the cut OR has a different confidence (asymmetry witnessed)
    asym = any(
        got.get((b, a), (None, None, None))[1] != c
        for (a, b), (_, c, _) in got.items()
    )
    assert asym or not got


def test_bounded_funnel_matches_pure_python(spark):
    from collections import defaultdict as dd
    import math as m

    by_user = dd(list)
    for uid, ts, et in _cols("events", "user_id", "ts", "event_type"):
        by_user[uid].append((int(m.floor(ts.timestamp())), et))
    n1 = n2 = n3 = 0
    for seq in by_user.values():
        views = sorted(ep for ep, et in seq if et == "view")
        if not views:
            continue
        n1 += 1
        t1 = views[0]
        clicks = sorted(ep for ep, et in seq
                        if et == "click" and t1 < ep <= t1 + 3600)
        if not clicks:
            continue
        n2 += 1
        t2 = clicks[0]
        buys = [ep for ep, et in seq
                if et == "purchase" and t2 < ep <= t2 + 3600]
        if buys:
            n3 += 1
    row = plans.QUERIES["ev_funnel_bounded"](spark, SF).collect()[0]
    assert (row.n_view, row.n_click_1h, row.n_purchase_1h) == (n1, n2, n3)
    assert row.conversion_ppm == (1_000_000 * n3) // n1
    # the bounded funnel can never beat the unbounded one
    loose = plans.QUERIES["ev_funnel_conversion"](spark, SF).collect()[0]
    assert row.n_view <= loose.n_users


def test_weighted_median_matches_pure_python(spark):
    import math as m
    from collections import defaultdict as dd

    groups = dd(list)
    for fl, ep, qty, ok, ln in _cols("lineitem", "l_returnflag",
                                     "l_extendedprice", "l_quantity",
                                     "l_orderkey", "l_linenumber"):
        groups[fl].append(
            (int(m.floor(ep * 10_000 + 0.5)), int(m.floor(qty)), ok, ln)
        )
    expect = {}
    for fl, rows in groups.items():
        rows.sort(key=lambda t: (t[0], t[2], t[3]))
        tot = sum(w for _, w, _, _ in rows)
        cum = 0
        med = None
        for qv, w, _, _ in rows:
            cum += w
            if 2 * cum >= tot:
                med = qv / 10_000.0
                break
        expect[fl] = (len(rows), tot, med)
    got = {
        r.flag: (r.n_rows, r.total_weight, r.weighted_median)
        for r in plans.QUERIES["a_weighted_median"](spark, SF).collect()
    }
    assert got == expect


def test_json_props_matches_pure_python(spark):
    import json as js
    from collections import defaultdict as dd

    stats = dd(list)
    for et, props in _cols("events", "event_type", "props"):
        k = js.loads(props).get("k") if props else None
        stats[et].append(k)
    got = {
        r.event_type: (r.n_events, r.n_missing, r.min_k, r.max_k,
                       r.sum_k, r.distinct_k, r.high_k_ppm)
        for r in plans.QUERIES["ev_json_props"](spark, SF).collect()
    }
    for et, ks in stats.items():
        present = [k for k in ks if k is not None]
        assert got[et] == (
            len(ks),
            len(ks) - len(present),
            min(present),
            max(present),
            sum(present),
            len(set(present)),
            (1_000_000 * sum(1 for k in present if k >= 50)) // len(ks),
        )


def test_forget_cascade_counts_match_pure_python(spark):
    from collections import Counter

    cust = [c for (c,) in _cols("customer", "c_custkey")]
    victims = {c for c in cust if c % 53 == 9}
    o_by_c = Counter()
    order_cust = {}
    for ok, ck in _cols("orders", "o_orderkey", "o_custkey"):
        order_cust[ok] = ck
        if ck in victims:
            o_by_c[ck] += 1
    l_by_c = Counter()
    for (ok,) in _cols("lineitem", "l_orderkey"):
        ck = order_cust.get(ok)
        if ck in victims:
            l_by_c[ck] += 1
    e_by_c = Counter()
    for (u,) in _cols("events", "user_id"):
        if u in victims:
            e_by_c[u] += 1
    got = {
        r.c_custkey: (r.n_orders, r.n_lineitems, r.n_events,
                      r.n_rows_total)
        for r in plans.QUERIES["d_forget_cascade_preview"](spark, SF)
        .collect()
    }
    assert set(got) == victims
    for c in victims:
        assert got[c] == (
            o_by_c[c], l_by_c[c], e_by_c[c],
            o_by_c[c] + l_by_c[c] + e_by_c[c] + 1,
        )


def test_iqr_outliers_match_pure_python(spark):
    import math as m
    from collections import defaultdict as dd

    groups = dd(list)
    for eid, et, v in _cols("events", "event_id", "event_type", "value"):
        groups[et].append((int(m.floor(v * 10_000 + 0.5)), eid))
    expect = {}
    for et, xs in groups.items():
        ordered = [q for q, _ in sorted(xs)]
        n = len(ordered)
        q1 = ordered[(n - 1) // 4]
        q3 = ordered[(3 * (n - 1)) // 4]
        iqr = q3 - q1
        for qv, eid in xs:
            if 2 * qv > 2 * q3 + 3 * iqr:
                expect[eid] = (et, qv / 1e4, q1 / 1e4, q3 / 1e4, "high")
            elif 2 * qv < 2 * q1 - 3 * iqr:
                expect[eid] = (et, qv / 1e4, q1 / 1e4, q3 / 1e4, "low")
    got = {
        r.event_id: (r.event_type, r.value, r.q1, r.q3, r.side)
        for r in plans.QUERIES["a_iqr_outliers"](spark, SF).collect()
    }
    assert got == expect
    # three outlier detectors, one dataset: IQR fences and z-score
    # need not agree row-for-row, but both must flag SOMETHING on a
    # corpus with heavy tails, and every flagged value must sit
    # outside its own group's box
    assert len(got) > 0


def test_time_to_convert_matches_pure_python(spark):
    import math as m
    from collections import defaultdict as dd

    by_user = dd(list)
    for uid, ts, et in _cols("events", "user_id", "ts", "event_type"):
        by_user[uid].append((int(m.floor(ts.timestamp())), et))
    deltas = []
    for uid, seq in by_user.items():
        views = [ep for ep, et in seq if et == "view"]
        if not views:
            continue
        t1 = min(views)
        buys = [ep for ep, et in seq if et == "purchase" and ep > t1]
        if buys:
            deltas.append((min(buys) - t1, uid))
    deltas.sort()
    vals = [d for d, _ in deltas]
    n = len(vals)
    row = plans.QUERIES["ev_time_to_convert"](spark, SF).collect()[0]
    assert (row.n_converted, row.min_s, row.max_s) == (
        n, vals[0], vals[-1]
    )
    assert row.median_s == vals[(n - 1) // 2]
    assert row.p90_s == vals[int(m.floor((n - 1) * 0.9))]
    assert row.min_s <= row.median_s <= row.p90_s <= row.max_s
