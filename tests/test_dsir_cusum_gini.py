"""Property tests for round-4 closing batch #4: DSIR importance
weights, CUSUM changepoint, and the Gini coefficient.

Each is hash-checked against its DuckDB oracle by
tests/test_all_oracles.py; these pin the semantics against
pure-Python recomputations (Counter LMs, a brute-force CUSUM sweep,
the classic rank-formula Gini) plus the invariants the shared oracle
constants cannot vouch for (weight direction, Gini bounds).
"""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

import pyarrow.parquet as pq

from metadata_wrangler_spark import plans

plans.load_all_plans()

SF = "/root/testdata/sf0.001"


def _cols(table, *cols):
    t = pq.read_table(f"{SF}/{table}.parquet", columns=list(cols))
    return list(zip(*(t.column(c).to_pylist() for c in cols)))


def _bitlen(c: int) -> int:
    return len(bin(c)[2:]) if c > 0 else 1  # bin(0) renders as "0"


def test_dsir_weight_matches_counter_lms(spark):
    tgt_bg, tgt_pf = Counter(), Counter()
    raw_bg, raw_pf = Counter(), Counter()
    raw_docs = {}
    for doc_id, lang, text in _cols("documents", "doc_id", "lang", "text"):
        w = re.sub(r"\s+", " ", text.lower()).strip().split(" ")
        bgs = [(w[i], f"{w[i]}_{w[i+1]}") for i in range(len(w) - 1)]
        if lang == "en":
            tgt_pf.update(p for p, _ in bgs)
            tgt_bg.update(b for _, b in bgs)
        else:
            raw_pf.update(p for p, _ in bgs)
            raw_bg.update(b for _, b in bgs)
            raw_docs[doc_id] = bgs
    expect = {}
    for doc_id, bgs in raw_docs.items():
        ws = [
            (_bitlen(raw_pf[p]) - _bitlen(raw_bg[b]))
            - (_bitlen(tgt_pf[p]) - _bitlen(tgt_bg[b]))
            for p, b in bgs
        ]
        s = sum(ws)
        # both engines' integer division truncates toward zero
        # (Spark DIV, DuckDB //); Python // floors, so spell it out
        ppm = abs(1_000_000 * s) // len(ws)
        expect[doc_id] = (len(ws), s, ppm if s >= 0 else -ppm)
    got = {
        r.doc_id: (r.n_bigrams, r.sum_weight, r.mean_weight_ppm)
        for r in plans.QUERIES["txt_dsir_weight"](spark, SF).collect()
    }
    assert got == expect
    # direction sanity: bigrams common in target but rare in raw score
    # positive, so SOME doc must differ from zero (non-vacuous corpus)
    assert any(v[1] != 0 for v in got.values())


def test_cusum_matches_brute_force(spark):
    daily = defaultdict(lambda: defaultdict(lambda: [0, 0]))
    for ts, et, v in _cols("events", "ts", "event_type", "value"):
        day = int(math.floor(ts.timestamp()) // 86400)
        cell = daily[et][day]
        cell[0] += int(math.floor(v * 10_000 + 0.5))
        cell[1] += 1
    expect = {}
    for et, days in daily.items():
        t = sum(s for s, _ in days.values())
        n = sum(c for _, c in days.values())
        cs = cc = 0
        best = None
        for day in sorted(days):
            cs += days[day][0]
            cc += days[day][1]
            s = n * cs - t * cc
            key = (-abs(s), day)
            if best is None or key < best[0]:
                best = (key, day, s)
        _, day, s = best
        expect[et] = (
            day,
            (1_000_000 * abs(s)) // (t * n),
            1 if s > 0 else (-1 if s < 0 else 0),
        )
    got = {
        r.event_type: (r.change_day, r.cusum_ppm, r.direction)
        for r in plans.QUERIES["ev_cusum_changepoint"](spark, SF).collect()
    }
    assert got == expect


def test_gini_matches_rank_formula(spark):
    vals = defaultdict(list)
    for ok, pr, tp in _cols("orders", "o_orderkey", "o_orderpriority",
                            "o_totalprice"):
        vals[pr].append((int(math.floor(tp * 10_000 + 0.5)), ok))
    expect = {}
    for pr, xs in vals.items():
        xs.sort()
        n = len(xs)
        sx = sum(q for q, _ in xs)
        srx = sum(i * q for i, (q, _) in enumerate(xs, start=1))
        gini = (1_000_000 * (2 * srx - (n + 1) * sx)) // (n * sx)
        expect[pr] = (n, sx / 10_000.0, gini)
    got = {
        r.priority: (r.n_orders, r.total_value, r.gini_ppm)
        for r in plans.QUERIES["a_gini_coefficient"](spark, SF).collect()
    }
    assert got == expect
    # Gini lives in [0, 1e6) and equal-ish uniform draws stay low-ish
    assert all(0 <= v[2] < 1_000_000 for v in got.values())


def test_scd2_pit_exactly_one_match_and_correct_version(spark):
    """PIT join invariants: every fact resolves exactly once; facts
    inside the first validity window of an updated key bind to the
    CLOSED historical row, late facts to the reopened current row."""
    import pyarrow.parquet as pq2

    ev = pq2.read_table(f"{SF}/events.parquet",
                        columns=["event_id", "user_id"])
    n_events = ev.num_rows
    rows = plans.QUERIES["j_scd2_pit"](spark, SF).collect()
    assert len(rows) == n_events  # exactly-one-match per fact
    for r in rows:
        updated_key = r.user_id % 10 == 3
        late = r.event_id % 2 == 1
        if updated_key and late:
            assert r.segment_at_pit.startswith("UPDATED-")
            assert r.is_current
        elif updated_key:
            assert not r.segment_at_pit.startswith("UPDATED-")
            assert not r.is_current
        else:
            assert r.is_current
