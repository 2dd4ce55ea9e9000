"""Property tests for the round-4 closing batch #3: Benford digit
audit, per-group MAD, Markov transitions, source overlap matrix, and
boilerplate stripping.

Each is hash-checked against its DuckDB oracle by
tests/test_all_oracles.py; these pin the semantics against
independent pure-Python recomputations and the invariants the shared
oracle constants cannot vouch for.
"""

from __future__ import annotations

import hashlib
import math
import re
import statistics
from collections import Counter, defaultdict

import pyarrow.parquet as pq

from metadata_wrangler_spark import plans

plans.load_all_plans()

SF = "/root/testdata/sf0.001"


def _cols(table, *cols):
    t = pq.read_table(f"{SF}/{table}.parquet", columns=list(cols))
    return list(zip(*(t.column(c).to_pylist() for c in cols)))


def test_benford_matches_pure_python(spark):
    digits = Counter()
    for (p,) in _cols("orders", "o_totalprice"):
        if p >= 1:
            digits[int(str(int(math.floor(p)))[0])] += 1
    total = sum(digits.values())
    got = {
        r.digit: (r.n_orders, r.share_ppm, r.benford_ppm, r.deviation_ppm)
        for r in plans.QUERIES["a_benford_digits"](spark, SF).collect()
    }
    for d, n in digits.items():
        share = (1_000_000 * n) // total
        benford = int(math.floor(math.log10(1 + 1 / d) * 1_000_000 + 0.5))
        assert got[d] == (n, share, benford, share - benford)
    # benford expectations sum to ~1e6 (sanity on the constant chain)
    assert abs(sum(v[2] for v in got.values()) - 1_000_000) <= 5


def test_mad_matches_pure_python(spark):
    vals = defaultdict(list)
    for eid, et, v in _cols("events", "event_id", "event_type", "value"):
        vals[et].append((int(math.floor(v * 10_000 + 0.5)), eid))
    expect = {}
    for et, qs in vals.items():
        ordered = [q for q, _ in sorted(qs, key=lambda t: (t[0], t[1]))]
        med = ordered[(len(ordered) - 1) // 2]
        devs = sorted(
            (abs(q - med), eid) for q, eid in qs
        )
        mad = devs[(len(devs) - 1) // 2][0]
        expect[et] = (med / 10_000.0, mad / 10_000.0)
    got = {
        r.event_type: (r.median_value, r.mad)
        for r in plans.QUERIES["a_mad_robust"](spark, SF).collect()
    }
    assert got == expect
    # MAD is within [0, max deviation]; median close to statistics.median
    for et, qs in vals.items():
        assert abs(
            got[et][0] - statistics.median(q for q, _ in qs) / 10_000.0
        ) <= 0.5


def test_markov_matches_pure_python(spark):
    by_user = defaultdict(list)
    for uid, eid, ts, et in _cols("events", "user_id", "event_id",
                                  "ts", "event_type"):
        by_user[uid].append((ts, eid, et))
    trans = Counter()
    for seq in by_user.values():
        seq.sort()
        for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
            trans[(a, b)] += 1
    row_tot = Counter()
    for (a, _), n in trans.items():
        row_tot[a] += n
    got = {
        (r.prev_type, r.next_type): (r.n, r.prob_ppm)
        for r in plans.QUERIES["ev_markov_transitions"](spark, SF).collect()
    }
    expect = {
        (a, b): (n, (1_000_000 * n) // row_tot[a])
        for (a, b), n in trans.items()
    }
    assert got == expect
    # each row's probabilities sum to ~1e6
    sums = Counter()
    for (a, _), (_, ppm) in got.items():
        sums[a] += ppm
    assert all(1_000_000 - 30 <= s <= 1_000_000 for s in sums.values())


def _norm_words(text):
    return re.sub(r"\s+", " ", text.lower()).strip().split(" ")


def test_source_overlap_matches_pure_python(spark):
    sh = defaultdict(set)
    for src, text in _cols("documents", "source", "text"):
        w = _norm_words(text)
        sh[src].update(
            "_".join(w[i:i + 3]) for i in range(len(w) - 2)
        )
    expect = {}
    srcs = sorted(sh)
    for i, a in enumerate(srcs):
        for b in srcs[i + 1:]:
            shared = len(sh[a] & sh[b])
            if shared:
                expect[(a, b)] = (
                    shared, len(sh[a]), len(sh[b]),
                    (1_000_000 * shared) // min(len(sh[a]), len(sh[b])),
                )
    got = {
        (r.src_a, r.src_b): (r.n_shared, r.n_a, r.n_b, r.containment_ppm)
        for r in plans.QUERIES["dd_source_overlap"](spark, SF).collect()
    }
    assert got == expect


def test_boilerplate_strip_matches_pure_python(spark):
    L = 8
    docs = dict(_cols("documents", "doc_id", "text"))
    chunks = {}
    df = Counter()
    for doc_id, text in docs.items():
        w = _norm_words(text)
        cs = [
            (i, w[i:i + L]) for i in range(0, (len(w) // L) * L, L)
        ] if len(w) >= L else []
        # stride-8 chunks only up to the last FULL chunk
        cs = [(i, c) for i, c in cs if len(c) == L]
        chunks[doc_id] = (w, cs)
        df.update({hashlib.md5("_".join(c).encode()).hexdigest()
                   for _, c in cs})
    got = {
        r.doc_id: (r.n_chunks, r.n_dropped, r.clean_text)
        for r in plans.QUERIES["txt_boilerplate_strip"](spark, SF).collect()
    }
    assert set(got) == set(docs)
    total_dropped = 0
    for doc_id, (w, cs) in chunks.items():
        kept = []
        dropped = 0
        for _, c in cs:
            fp = hashlib.md5("_".join(c).encode()).hexdigest()
            if df[fp] >= 2:
                dropped += 1
            else:
                kept.append(" ".join(c))
        tail = w[len(cs) * L:] if cs else w
        clean = " ".join([x for x in [" ".join(kept)] if x]
                         + ([" ".join(tail)] if tail else [])).strip()
        assert got[doc_id] == (len(cs), dropped, clean), doc_id
        total_dropped += dropped
    assert total_dropped > 0  # non-vacuous on this corpus
