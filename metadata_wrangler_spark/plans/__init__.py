"""Named query plans — the engine's public query surface.

Every operator family from SURVEY.md §2.11 is exposed as a named
query: a callable ``(spark, sf_dir) -> DataFrame`` registered in
``QUERIES``, paired (where SQL-expressible) with an ANSI-SQL oracle
string in ``ORACLES`` that DuckDB runs on the same parquet tables.

Numeric-stability convention: any aggregate over DOUBLE columns goes
through an exact DECIMAL(18,4) accumulation and is cast back to
DOUBLE, so Spark and the oracle produce bit-identical values
regardless of floating-point summation order (which differs between
engines and, at scale, between partitionings of the same data).
Non-aggregated doubles pass through untouched — they are the same
bits in both engines.

NULL convention (round 7, enforced by tools/null_ladder.py and
tests/test_null_ladder.py): rows whose MEASURE / WEIGHT / PAYLOAD is
NULL are excluded from the computation on BOTH engines (the SQL
aggregate rule, applied before ranks, ECDFs, selections, top-k lists
and serialized source payloads — the places where engine defaults
silently diverge: Spark orders NULLS FIRST ascending, DuckDB NULLS
LAST; DuckDB's max_by skips NULL values, Spark's does not; || nulls
a concatenation, concat_ws skips the field). NULL GROUP KEYS are
real groups (NULL-safe joins where an oracle joins group summaries
back). Each plan/oracle pair states its rule inline, AND declares it
under a named convention in ``plans/null_rules.py`` —
``tests/test_null_convention.py`` fails any oracle whose NULL
constructs are undeclared, so per-query rules cannot drift from the
documented convention (round-7 verdict, governance item).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator registering a plan under ``name`` with an optional
    DuckDB oracle. Plans without an oracle get a rows-only check."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# The driver's correctness gate hash-checks the FIRST 50 entries of
# `queries()` each round (dict iteration order). Rounds 1-3 verified
# every registered query EXCEPT the 13 that landed behind the window
# in round 3 (as-of/range joins, native session_window, LSH
# probe/multitable tiers, sequence packing, boilerplate, n-gram
# profile, KMV sketch, and four string-function twins). Round 4
# promotes all 13 into the leading window — plus every query added
# during round 4 itself (the leading block below: recursive-CTE
# twin through PageRank) — so zero never-verified
# queries remain, and keeps one previously-green representative of
# every SURVEY.md §2 family (so_/f_/a_/j_/w_/mm_/ev_/txt_/d_/g_/
# pipe_/s_/p_/sim_/dd_) green each round. The rotated-out stalwarts
# (r2- and r3-green string functions and source parsers) are still
# covered by pytest's all-queries oracle sweep
# (tests/test_all_oracles.py, every registered query at sf0.001).
# Size of the driver's per-round correctness window (first N of
# ordered_queries()); VERIFICATION_PRIORITY is curated to exactly N.
VERIFICATION_WINDOW = 50

# WINDOW POLICY (round 5 onward): any NEW query lands at the FRONT
# of VERIFICATION_PRIORITY in the same session that registers it, so
# the never-driver-verified gap of rounds 3 (13 queries) and 4 (49)
# cannot recur. When the never-verified set is smaller than the
# window, remaining slots go to the previously-green queries whose
# last driver verification is OLDEST (stalest-first rotation), with
# every SURVEY.md §2 family keeping at least one representative.
VERIFICATION_PRIORITY: tuple[str, ...] = (
    # --- round-7 window: STALENESS PAYDOWN. No new queries were
    # registered this round (construction froze at 221), so every
    # slot re-certifies existing plans under the driver's
    # independent gate, stalest first.
    #
    # Round-7 NULL-alignment pass: ~45 additional plan/oracle pairs
    # gained NULL-rule filters late in the session (see
    # tools/null_ladder.py). They cannot all fit one 50-slot window;
    # every touched pair was re-verified by the full sf0.001 gate,
    # the sf0.01 window mirror, AND the new per-query NULL-ladder
    # pytest — and the filters are provably no-ops on the driver's
    # NULL-free data (full gate green before and after).
    #
    # Block 1 — plans REWRITTEN this session (window policy: a
    # rewritten plan is treated like a new registration — front of
    # the window in the same session that rewrites it):
    "txt_ngram_novelty",     # first-occurrence key: hash → raw shingle
    "a_mad_robust",          # oracle NULL alignment (value filter + NULL-safe joins)
    "g_shortest_path",       # pointer-jump relaxation (log rounds)
    "g_bipartite_project",   # shared deduped basket table
    "a_assoc_rules",         # shared deduped basket table
    # Block 2 — the other plans rewritten in ROUND 6 onto the new
    # selection/plan shapes, whose rewritten spellings the r6 window
    # never covered (round-6 advice, medium):
    "a_percentile_disc",     # also r2-stale
    "a_weighted_median",
    "a_iqr_outliers",
    "a_regr_trend",
    "ev_gap_fill",
    "g_triangle_count",
    # Block 3 — the ENTIRE remaining r2-stale block (28; 29th is
    # a_percentile_disc above): last driver-verified in round 2,
    # covered since only by the pytest all-oracle sweep.
    "a_conditional_max",
    "a_daily_buckets",
    "a_group_count_distinct",
    "a_mode_top1",
    "a_percentile_cont",
    "a_pricing_summary",
    "a_token_explode_sum",
    "d_bulk_delete",
    "d_entity_merge_repoint",
    "d_get_one_or_create",
    "d_register_anti_join",
    "d_update_expression",
    "dd_decontaminate",
    "dd_exact_groups",
    "dd_incremental_exact",
    "dd_minhash_lsh",
    "dd_ngram_containment",
    "dd_ngram_jaccard",
    "dd_simhash",
    "dd_simhash_pairs",
    "p_like_blacklist",
    "txt_bpe_token_count",
    "txt_corpus_report",
    "txt_fingerprint",
    "txt_mixture_sample",
    "txt_token_stats",
    "w_keyset_pagination",
    "w_offset_pagination",
    # Block 4 — oldest r3-stale picks: one rep for each SURVEY §2
    # family the blocks above lack (f_, j_, mm_, pipe_, so_, sim_)
    # plus the stalest source parsers (S2–S11 family). After this
    # round no registered query's last driver check is older than
    # round 3.
    "f_title_token_jaccard",
    "j_first_match",
    "mm_binary_features",
    "pipe_lookup_urn",
    "so_drop_duplicates",
    "sim_ivf_topk",
    "s_soap_demand",
    "s_xml_classify",
    "s_viaf_cluster",
    "s_marc_json",
    "s_opds_feed",
)


if len(VERIFICATION_PRIORITY) != VERIFICATION_WINDOW:  # not assert: -O
    raise ValueError(
        f"VERIFICATION_PRIORITY has {len(VERIFICATION_PRIORITY)} entries; "
        f"the driver window is {VERIFICATION_WINDOW}"
    )


def ordered_queries() -> dict[str, QueryFn]:
    """QUERIES re-keyed so VERIFICATION_PRIORITY names come first
    (in that order), then everything else in registration order."""
    missing = [n for n in VERIFICATION_PRIORITY if n not in QUERIES]
    if missing:
        raise KeyError(f"VERIFICATION_PRIORITY names not registered: {missing}")
    rest = [n for n in QUERIES if n not in set(VERIFICATION_PRIORITY)]
    return {n: QUERIES[n] for n in (*VERIFICATION_PRIORITY, *rest)}


def load_all_plans() -> None:
    """Import every plan module so registration side effects run,
    then apply the cross-module oracle rewrites."""
    from metadata_wrangler_spark.plans import (  # noqa: F401
        documents,
        dml,
        events,
        functions,
        graph,
        pipeline,
        relational,
        sources,
        vectors,
    )

    _apply_null_vector_rule()


def _apply_null_vector_rule() -> None:
    """Rewrite the vector-family oracles so every scan of the
    ``embeddings`` table excludes NULL vectors — matching the
    Spark-side rule (the Arrow scorers and bucket projections drop
    NULL payloads at operator entry; see the NULL-content sweep in
    tests/test_empty_inputs.py and the NULL-ladder equivalence sweep
    in tools/null_ladder.py). Without this, a NULL embedding reaches
    the oracle's dot/norm arithmetic as NULL, ranks under NULLS
    LAST, and pads top-k lists the plan correctly omits.

    A registration-time rewrite rather than 23 hand edits: the
    substitution is a word-boundary table-reference swap, so aliased
    scans (``embeddings c``), comma joins and WHERE-suffixed scans
    all keep their shape. Idempotent (the rewritten text no longer
    contains the bare table token in vector oracles it already
    wrapped — the inner reference is inside the replacement subquery
    and rewriting it again is harmless but guarded anyway).

    Guarded against the two spellings a blind token swap would
    corrupt (round-7 advice): a QUALIFIED column reference
    (``embeddings.vec_id`` — the swap would yield the invalid
    ``(SELECT ...).vec_id``) and a CTE/alias that REBINDS the name
    (``WITH embeddings AS`` / ``AS embeddings`` — the swap would
    silently change which relation the query reads). Either pattern
    raises at registration time with instructions to hand-write the
    NULL rule inline instead; every rewritten oracle is then executed
    end-to-end by tests/test_all_oracles.py and the NULL-ladder
    sweep, so a rewrite that parses but misbehaves cannot go green.
    """
    import re

    nn = "(SELECT * FROM embeddings WHERE embedding IS NOT NULL)"
    pat = re.compile(r"\bembeddings\b(?!\s*WHERE embedding IS NOT NULL\))"
                     r"(?!\.)")
    hazards = re.compile(
        r"\bembeddings\s*\.|\bWITH\s+embeddings\b|\bAS\s+embeddings\b",
        re.IGNORECASE,
    )
    for name, sql in list(ORACLES.items()):
        if name.startswith(("sim_", "pipe_")) and "embeddings" in sql:
            if hazards.search(sql):
                raise ValueError(
                    f"oracle {name!r} uses a qualified 'embeddings.' "
                    "reference or rebinds the name as a CTE/alias; the "
                    "automatic NULL-vector rewrite would corrupt it — "
                    "write the IS NOT NULL rule into the SQL by hand"
                )
            ORACLES[name] = pat.sub(nn, sql)
