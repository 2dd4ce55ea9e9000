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


def test_hopping_window_every_event_in_two_windows(spark):
    t = pq.read_table(f"{SF}/events.parquet", columns=["event_id"])
    n_events = t.num_rows
    out = plans.QUERIES["ev_hopping_window"](spark, SF).collect()
    assert sum(int(r.n_events) for r in out) == 2 * n_events
    # every window start is slide-aligned and width/slide = 2 means
    # consecutive starts differ by the slide where data is dense
    assert all(int(r.window_start_epoch) % 3600 == 0 for r in out)


def test_hopping_stream_equals_batch(spark, tmp_path):
    import shutil

    from metadata_wrangler_spark.catalog import load
    from metadata_wrangler_spark.streaming import incremental

    src = tmp_path / "events_src"
    src.mkdir()
    shutil.copy(f"{SF}/events.parquet", src / "part-000.parquet")
    got = incremental.run_hopping_stream(
        spark, str(src), str(tmp_path / "cp_hop"), query_name="t_hop"
    )
    batch = incremental.hopping_rollup(load(spark, SF, "events"))
    assert sorted(map(tuple, got.collect())) \
        == sorted(map(tuple, batch.collect()))


def test_kmv_set_ops_match_pure_python(spark):
    t = pq.read_table(f"{SF}/events.parquet",
                      columns=["event_type", "user_id"])
    users: dict[str, set[int]] = {}
    for et, uid in zip(t.column("event_type").to_pylist(),
                       t.column("user_id").to_pylist()):
        users.setdefault(et, set()).add(uid)
    sketches = {
        et: sorted(_md5_long(str(u)) for u in us)[:64]
        for et, us in users.items()
    }
    out = plans.QUERIES["a_kmv_set_ops"](spark, SF).collect()
    assert len(out) == len(users) * (len(users) - 1) // 2
    for r in out:
        a, b = r.type_a, r.type_b
        assert a < b
        u = sorted(set(sketches[a]) | set(sketches[b]))[:64]
        n_both = sum(1 for x in u
                     if x in set(sketches[a]) and x in set(sketches[b]))
        assert int(r.sketch_overlap) == n_both
        exact_inter = len(users[a] & users[b])
        exact_union = len(users[a] | users[b])
        assert int(r.exact_inter) == exact_inter
        assert int(r.exact_union) == exact_union
        if len(u) == 64:  # saturated sketch: estimator is live
            est_u = 63 * (2.0 ** 60) / float(u[-1])
            assert abs(float(r.est_union) - est_u) / est_u < 1e-6
            # K=64 -> ~12.5% std error; generous 3-sigma band
            assert abs(float(r.est_union) - exact_union) \
                / exact_union < 0.5
        assert float(r.est_inter) <= float(r.est_union) + 1e-9
