"""Property tests for round-4 closing batch #5: unigram self-entropy,
top journey paths, and the chi-square weekday-independence screen —
pure-Python recomputations plus invariants the shared oracle
constants cannot vouch for.
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
    return len(bin(c)[2:]) if c > 0 else 1


def test_unigram_entropy_matches_counter(spark):
    toks = defaultdict(Counter)
    for src, text in _cols("documents", "source", "text"):
        toks[src].update(
            re.sub(r"\s+", " ", text.lower()).strip().split(" ")
        )
    expect = {}
    for src, cnt in toks.items():
        nt = sum(cnt.values())
        sb = sum(c * (_bitlen(nt) - _bitlen(c)) for c in cnt.values())
        expect[src] = (nt, len(cnt), sb, (1_000_000 * sb) // nt)
    got = {
        r.source: (r.n_tokens, r.vocab, r.sum_bits, r.mean_bits_ppm)
        for r in plans.QUERIES["txt_unigram_entropy"](spark, SF).collect()
    }
    assert got == expect
    # surrogate tracks true entropy within 1 bit/token
    for src, cnt in toks.items():
        nt = sum(cnt.values())
        h = -sum(
            (c / nt) * math.log2(c / nt) for c in cnt.values()
        )
        assert abs(got[src][3] / 1_000_000 - h) <= 1.0


def test_session_paths_match_pure_python(spark):
    sessions = defaultdict(list)
    for uid, eid, ts, et in _cols("events", "user_id", "event_id",
                                  "ts", "event_type"):
        day = int(math.floor(ts.timestamp()) // 86400)
        sessions[(uid, day)].append((ts, eid, et))
    paths = Counter()
    for seq in sessions.values():
        seq.sort()
        paths[">".join(et for _, _, et in seq)] += 1
    expect = sorted(paths.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [
        (r.path, r.n_sessions)
        for r in plans.QUERIES["w_session_path_topk"](spark, SF).collect()
    ]
    assert sorted(got, key=lambda kv: (-kv[1], kv[0])) == expect


def test_chi2_matches_pure_python(spark):
    cells = Counter()
    for ts, et in _cols("events", "ts", "event_type"):
        dow = (int(math.floor(ts.timestamp()) // 86400)) % 7
        cells[(et, dow)] += 1
    rt, ct = Counter(), Counter()
    for (et, dow), o in cells.items():
        rt[et] += o
        ct[dow] += o
    nt = sum(cells.values())
    expect = defaultdict(lambda: [0, 0])
    for (et, dow), o in cells.items():
        num = float(nt * o - rt[et] * ct[dow])
        den = float(nt) * float(rt[et]) * float(ct[dow])
        t = int(math.floor(num * num / den * 1_000_000 + 0.5))
        expect[et][0] += o
        expect[et][1] += t
    got = {
        r.event_type: [r.n_events, r.chi2_contrib_micro]
        for r in plans.QUERIES["a_chi2_independence"](spark, SF).collect()
    }
    assert got == dict(expect)
    # contributions are non-negative and the uniform generator keeps
    # the per-type chi2 far below the ~1% critical value for 6 dof
    assert all(v[1] >= 0 for v in got.values())
