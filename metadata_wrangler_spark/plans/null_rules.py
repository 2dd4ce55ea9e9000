"""Named NULL-handling conventions and the per-oracle declaration
table the convention test enforces.

Round 7 added ~45 per-pair NULL alignments (tools/null_ladder.py);
the round-7 verdict flagged the drift risk: rules layered per-query
can silently diverge from the single documented convention in
``plans/__init__``'s module docstring. This module makes the
convention MECHANICAL: every NULL-handling construct that appears in
an oracle SQL string must be declared here under one of the named
rules below, and ``tests/test_null_convention.py`` fails the build
when an oracle gains an undeclared construct (or loses a declared
one — stale declarations are as misleading as missing ones).

The named rules (the "why" behind each construct):

``measure-excluded``
    The SQL-aggregate rule from the module docstring: rows whose
    MEASURE / WEIGHT / PAYLOAD is NULL are excluded on BOTH engines
    before aggregates, ranks, ECDFs, selections, top-k lists and
    serialized payloads. The construct is usually ``IS NOT NULL`` in
    a WHERE/FILTER; the Spark plan carries the identical filter.
    (The vector-family oracles get this rule injected mechanically —
    see ``plans.__init__._apply_null_vector_rule``.)

``null-group-kept``
    NULL GROUP KEYS are real groups. When an oracle joins per-group
    summaries back to rows it must join NULL-safely
    (``IS NOT DISTINCT FROM``), matching ``Window.partitionBy`` /
    ``groupBy`` which both treat NULL as a regular key.

``outer-default``
    A COALESCE/IFNULL supplies the documented default for an
    outer-join miss, a ROLLUP/CUBE grand-total label, or an
    absent-state default. The Spark plan uses the same literal, so
    both engines serialize the same value.

``semantic-null``
    NULL is part of the query's own business semantics — policy
    merge ("null never overwrites"), SCD2 open rows, gap-fill
    sentinels, LEFT-JOIN miss probes, first-match existence tests.
    Identical on both engines by construction; not a cross-engine
    alignment rule at all.

``arith-guard``
    NULLIF(x, 0) guarding a division; both engines propagate the
    NULL identically.

To add a NULL construct to an oracle: pick the rule it follows (or
make the case for a new named rule HERE, with a paragraph), then add
the ``query -> {construct: rule}`` entry below. The test tells you
exactly which entry to add when it fails.
"""

from __future__ import annotations

import re

#: rule name -> one-line reminder (full definitions in the docstring)
NULL_RULES: dict[str, str] = {
    "measure-excluded": "NULL measures/weights/payloads excluded on "
                        "both engines before aggregation/ranking",
    "null-group-kept": "NULL group keys are real groups; summary "
                       "re-joins are NULL-safe",
    "outer-default": "COALESCE supplies the documented default for "
                     "outer-join misses / rollup labels",
    "semantic-null": "NULL is the query's subject matter, not an "
                     "alignment rule",
    "arith-guard": "NULLIF divide-by-zero guard; NULL propagates "
                   "identically",
}

#: construct kind -> detector over the oracle SQL text. ``is_null``
#: is matched on the text with IS NOT NULL removed first, so the two
#: kinds never double-count the same token run.
NULL_CONSTRUCTS: dict[str, re.Pattern] = {
    "not_distinct": re.compile(r"IS\s+NOT\s+DISTINCT\s+FROM", re.I),
    "coalesce": re.compile(r"\bCOALESCE\s*\(", re.I),
    "is_not_null": re.compile(r"IS\s+NOT\s+NULL", re.I),
    "is_null": re.compile(r"IS\s+NULL", re.I),
    "ifnull": re.compile(r"\b(?:IFNULL|NVL)\s*\(", re.I),
    "nullif": re.compile(r"\bNULLIF\s*\(", re.I),
}

_NOT_NULL_STRIP = re.compile(r"IS\s+NOT\s+NULL", re.I)


def constructs_in(sql: str) -> set[str]:
    """The set of NULL-construct kinds present in an oracle string."""
    found = set()
    stripped = _NOT_NULL_STRIP.sub("", sql)
    for kind, pat in NULL_CONSTRUCTS.items():
        text = stripped if kind == "is_null" else sql
        if pat.search(text):
            found.add(kind)
    return found


#: query -> {construct kind: rule name}. Exhaustive over the current
#: 221 oracles (75 carry constructs); test_null_convention.py keeps
#: it exhaustive.
DECLARED: dict[str, dict[str, str]] = {
    "a_cube_report": {"coalesce": "outer-default"},
    "a_gini_coefficient": {"is_not_null": "measure-excluded"},
    "a_iqr_outliers": {"is_not_null": "measure-excluded", "not_distinct": "null-group-kept"},
    "a_kmv_set_ops": {"coalesce": "outer-default"},
    "a_ks_drift": {"is_not_null": "measure-excluded"},
    "a_mad_robust": {"is_not_null": "measure-excluded", "not_distinct": "null-group-kept"},
    "a_percentile_disc": {"is_not_null": "measure-excluded"},
    "a_regr_trend": {"nullif": "arith-guard"},
    "a_rollup_report": {"coalesce": "outer-default"},
    "a_weighted_median": {"is_not_null": "measure-excluded"},
    "d_entity_merge_repoint": {"coalesce": "outer-default", "is_not_null": "measure-excluded"},
    "d_forget_cascade_preview": {"coalesce": "outer-default"},
    "d_policy_merge_preview": {"coalesce": "semantic-null", "is_not_null": "semantic-null", "is_null": "semantic-null"},
    "d_queue_lifecycle": {"coalesce": "outer-default"},
    "d_snapshot_diff": {"coalesce": "outer-default", "is_null": "semantic-null"},
    "dd_cluster_keep": {"coalesce": "outer-default"},
    "dd_est_vs_exact": {"coalesce": "outer-default"},
    "ev_funnel_conversion": {"is_not_null": "measure-excluded"},
    "ev_gap_fill": {"is_not_null": "semantic-null", "is_null": "semantic-null"},
    "ev_gap_percentiles": {"is_not_null": "measure-excluded"},
    "ev_json_props": {"is_null": "semantic-null"},
    "ev_markov_transitions": {"is_not_null": "measure-excluded"},
    "ev_session_window_native": {"is_null": "semantic-null"},
    "ev_sessionized_gaps": {"is_null": "semantic-null"},
    "f_binary_prefix": {"is_not_null": "measure-excluded"},
    "f_name_munge": {"is_not_null": "measure-excluded"},
    "f_stateful_role_split": {"coalesce": "outer-default", "is_not_null": "measure-excluded"},
    "g_assortativity": {"nullif": "arith-guard"},
    "g_pagerank": {"coalesce": "outer-default"},
    "j_asof_nearest": {"is_not_null": "semantic-null", "is_null": "semantic-null"},
    "j_first_match": {"is_not_null": "semantic-null"},
    "j_left_outer_null_split": {"is_not_null": "semantic-null", "is_null": "semantic-null"},
    "j_scd2_pit": {"is_null": "semantic-null"},
    "mm_audio_windows": {"is_not_null": "measure-excluded"},
    "mm_binary_features": {"is_not_null": "measure-excluded"},
    "mm_frame_sample": {"is_not_null": "measure-excluded"},
    "mm_image_features": {"is_not_null": "measure-excluded"},
    "p_compound_predicates": {"is_not_null": "measure-excluded"},
    "pipe_corpus_curation": {"coalesce": "outer-default", "is_not_null": "measure-excluded"},
    "pipe_lookup_urn": {"is_not_null": "semantic-null", "is_null": "semantic-null"},
    "pipe_semantic_search": {"is_not_null": "measure-excluded"},
    "s_html_scrape": {"is_not_null": "measure-excluded"},
    "s_jsonld_contributor": {"is_not_null": "measure-excluded"},
    "s_jsonld_graph": {"is_not_null": "measure-excluded"},
    "s_opds_feed": {"is_not_null": "measure-excluded"},
    "s_overdrive_json": {"is_not_null": "measure-excluded"},
    "s_viaf_cluster": {"is_not_null": "measure-excluded"},
    "s_xml_classify": {"is_not_null": "measure-excluded"},
    "s_xml_classify_response": {"is_not_null": "measure-excluded"},
    "sim_centroid_drift": {"is_not_null": "measure-excluded"},
    "sim_cosine_topk": {"is_not_null": "measure-excluded"},
    "sim_diversified_topk": {"is_not_null": "measure-excluded"},
    "sim_ivf_topk": {"is_not_null": "measure-excluded"},
    "sim_ivf_train_step": {"is_not_null": "measure-excluded"},
    "sim_knn_graph": {"is_not_null": "measure-excluded"},
    "sim_label_centroids": {"is_not_null": "measure-excluded"},
    "sim_label_outliers": {"is_not_null": "measure-excluded"},
    "sim_lsh_multitable_topk": {"is_not_null": "measure-excluded"},
    "sim_lsh_probe_topk": {"is_not_null": "measure-excluded"},
    "sim_lsh_topk": {"is_not_null": "measure-excluded"},
    "sim_pq_topk": {"is_not_null": "measure-excluded"},
    "sim_quantized_topk": {"is_not_null": "measure-excluded"},
    "sim_recall_eval": {"is_not_null": "measure-excluded"},
    "sim_rp_topk": {"is_not_null": "measure-excluded"},
    "so_schema_evolution": {"coalesce": "outer-default"},
    "txt_boilerplate_strip": {"coalesce": "outer-default", "is_null": "semantic-null"},
    "txt_dsir_weight": {"coalesce": "outer-default", "is_not_null": "measure-excluded"},
    "txt_fingerprint": {"is_not_null": "measure-excluded"},
    "txt_ngram_topk": {"is_not_null": "measure-excluded"},
    "txt_quality_deciles": {"is_not_null": "measure-excluded"},
    "txt_repetition_filter": {"coalesce": "outer-default", "is_not_null": "measure-excluded"},
    "txt_sequence_packing": {"coalesce": "outer-default", "is_not_null": "measure-excluded"},
    "w_coalesce_cascade": {"coalesce": "semantic-null", "is_not_null": "measure-excluded"},
    "w_path_edit_similarity": {"is_not_null": "measure-excluded"},
    "w_session_path_topk": {"is_not_null": "measure-excluded"},
    "w_shortest_candidate": {"is_not_null": "measure-excluded"},
}
