"""Property tests for the sketch/sampling/quantization additions:
PMI collocations, token-weighted sampling, HLL registers, and the
int8-quantized retrieval tier.

Each is already hash-checked against its DuckDB oracle by
tests/test_all_oracles.py; these tests pin the SEMANTIC invariants a
matching pair of wrong implementations could still violate together
(both engines share the generated-constant spellings, so a shared
spec bug would pass the oracle sweep): PMI/qdot against pure-Python
recomputation, the sampler's inclusion gate and expected size, HLL
register mergeability and error, and quantized-tier recall against
exact cosine.
"""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter

import pyarrow.parquet as pq

from metadata_wrangler_spark import plans

plans.load_all_plans()

SF = "/root/testdata/sf0.001"


def _md5_long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _docs():
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    return list(zip(t.column("doc_id").to_pylist(),
                    t.column("text").to_pylist()))


def _words(text: str) -> list[str]:
    return re.sub(r"\s+", " ", text.lower()).strip().split(" ")


def test_pmi_bigrams_match_pure_python(spark):
    uni: Counter = Counter()
    pairs: Counter = Counter()
    for _, text in _docs():
        w = _words(text)
        uni.update(w)
        pairs.update(zip(w, w[1:]))
    n_total = sum(uni.values())
    scored = [
        ((c * n_total * 10000) // (uni[a] * uni[b]), a, b, c)
        for (a, b), c in pairs.items()
        if c >= 5
    ]
    scored.sort(key=lambda t: (-t[0], t[1], t[2]))
    expect = [(a, b, c, s) for s, a, b, c in scored[:50]]

    got = [
        (r.w1, r.w2, int(r.c_xy), int(r.pmi_ratio_x10k))
        for r in plans.QUERIES["txt_pmi_bigrams"](spark, SF)
        .orderBy("rank").collect()
    ]
    assert got == expect


def test_pmi_surrogate_is_monotone_in_pmi(spark):
    """The integer surrogate must rank identically to true PMI
    (log is monotone; the only hazard is the 1e4 quantization
    collapsing distinct ratios — allowed, ties then break by words).
    """
    rows = plans.QUERIES["txt_pmi_bigrams"](spark, SF).collect()
    assert len(rows) == 50
    ratios = [int(r.pmi_ratio_x10k) for r in rows]
    assert ratios == sorted(ratios, reverse=True)
    # association strength: the top collocation must beat independence
    assert ratios[0] > 10000  # ratio 1.0 == independent


def test_weighted_sample_gate_and_size(spark):
    docs = _docs()
    weights = {d: len(_words(t)) for d, t in docs}
    total = sum(weights.values())
    expect = {
        d for d, w in weights.items()
        if (_md5_long(str(d)) % 1_000_000) * total < 1_000_000 * 20 * w
    }
    out = plans.QUERIES["txt_weighted_sample"](spark, SF).collect()
    got = {int(r.doc_id) for r in out}
    assert got == expect
    # expected size ≈ min(target, corpus): loose 3-sigma-ish bounds
    assert 5 <= len(got) <= 40
    for r in out:
        w = weights[int(r.doc_id)]
        assert int(r.prob_ppm) == min(
            1_000_000, (1_000_000 * 20 * w) // total
        )


def test_weighted_sample_stable_under_other_strata_growth():
    """A doc's keep/drop depends on its own weight and Σw only
    through the gate comparison — verify the documented invariant
    that adding docs can only change inclusion via Σw, and the gate
    recomputation in pure python matches on a doubled corpus."""
    docs = _docs()
    weights = {d: len(_words(t)) for d, t in docs}
    total = sum(weights.values())

    def included(d: int, tot: int) -> bool:
        return (_md5_long(str(d)) % 1_000_000) * tot \
            < 1_000_000 * 20 * weights[d]

    base = {d for d in weights if included(d, total)}
    # doubling Σw (corpus growth) can only shrink the sample
    grown = {d for d in weights if included(d, 2 * total)}
    assert grown <= base


def _hll_registers(hashes):
    regs: dict[int, int] = {}
    for h in set(hashes):
        b, rest = h % 64, h // 64
        rho = 55 if rest == 0 else 55 - rest.bit_length()
        regs[b] = max(regs.get(b, 0), rho)
    return regs


def test_hll_registers_merge_and_estimate(spark):
    t = pq.read_table(f"{SF}/events.parquet",
                      columns=["event_type", "user_id"])
    by_type: dict[str, list[int]] = {}
    for et, uid in zip(t.column("event_type").to_pylist(),
                       t.column("user_id").to_pylist()):
        by_type.setdefault(et, []).append(_md5_long(str(uid)))

    out = {
        r.event_type: (int(r.zero_registers), float(r.hll_estimate),
                       int(r.n_exact))
        for r in plans.QUERIES["a_hll_sketch"](spark, SF).collect()
    }
    assert set(out) == set(by_type)
    for et, hashes in by_type.items():
        regs = _hll_registers(hashes)
        # mergeability: split-halves registers max-combine to the whole
        half = len(hashes) // 2
        left = _hll_registers(hashes[:half])
        right = _hll_registers(hashes[half:])
        merged: dict[int, int] = {}
        for d in (left, right):
            for b, r in d.items():
                merged[b] = max(merged.get(b, 0), r)
        assert merged == regs

        zero, est, n_exact = out[et]
        assert zero == 64 - len(regs)
        s = sum(1 << (55 - r) for r in regs.values()) \
            + (64 - len(regs)) * (1 << 55)
        expect_est = (709.0 / 1000.0) * 4096.0 * float(1 << 55) / float(s)
        assert math.isclose(est, expect_est, rel_tol=1e-6)
        # 64 registers → ~13% typical error; allow a generous band
        # (no small-range correction by design, so skip the check
        # when the estimator is in its documented biased low range)
        if zero == 0:
            assert abs(est - n_exact) / n_exact < 0.6


def test_quantized_topk_qdot_exact_and_recall(spark):
    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_pylist()
    vecs = {i: [float(x) for x in v]
            for i, v in zip(ids, t.column("embedding").to_pylist())}
    m = max(abs(x) for v in vecs.values() for x in v)
    qv = {i: [math.floor((x * 127.0) / m + 0.5) for x in v]
          for i, v in vecs.items()}
    queries = [i for i in ids if i % 101 == 0]

    out = plans.QUERIES["sim_quantized_topk"](spark, SF).collect()
    assert {int(r.query_id) for r in out} == set(queries)
    for r in out:
        expect = sum(a * b for a, b in
                     zip(qv[int(r.query_id)], qv[int(r.corpus_id)]))
        assert int(r.qdot) == expect

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return d / (na * nb)

    hits = total = 0
    for qid in queries:
        exact = sorted(
            (i for i in ids if i != qid),
            key=lambda i: (-cos(vecs[qid], vecs[i]), i),
        )[:5]
        got = {int(r.corpus_id) for r in out if int(r.query_id) == qid}
        hits += len(got & set(exact))
        total += 5
    assert hits / total >= 0.6  # int8 @64d is usually >0.8
