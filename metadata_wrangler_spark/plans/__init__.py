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
    # --- round-6 window. After round 5 the never-driver-verified
    # set is exactly the two r4 reds whose oracle-side CAST fix
    # landed after the r5 window was frozen — plus, per the window
    # policy, every query REGISTERED this round (front of the
    # window in the same session that created it):
    "d_snapshot_diff",
    "sim_knn_graph",
    "a_moments_skew_kurt",
    "g_degree_distribution",
    "txt_ngram_novelty",
    "sim_label_outliers",
    "d_cdc_apply",
    "ev_seasonal_anomaly",
    "j_band_join",
    "txt_bpe_merge_step",
    "ev_burstiness",
    "ev_gap_percentiles",
    "g_assortativity",
    "sim_centroid_drift",
    "dd_est_vs_exact",
    "txt_tokenizer_fertility",
    "a_ks_drift",
    "sim_recall_eval",
    "ev_activity_streaks",
    "j_asof_nearest",
    "s_compaction_plan",
    "txt_idf_rarity",
    "w_ntile",
    "so_schema_evolution",
    "ev_attribution_credit",
    "a_mutual_info",
    "j_bloom_prune",
    "ev_unpivot_long",
    # Stalest-first rotation: every remaining slot goes to an r2-
    # green query not re-verified by the driver since (pytest's
    # all-oracle sweep covers them each run; this rotates them back
    # under the driver's independent hash check), swapping in one
    # r3-green rep for each family the r2 block lacks (f_, g_,
    # pipe_, s_, sim_).
    "d_queue_lifecycle",
    "d_status_transitions",
    "dd_minhash_clusters",
    "dd_ngram_jaccard_pruned",
    "j_anti_join_queue",
    "j_dim_3way_broadcast",
    "j_fk_inner_join",
    "j_left_outer_null_split",
    "j_semi_join",
    "mm_frame_sample",
    "mm_image_features",
    # (four rotation slots ceded to the queries registered this
    # session — p_/w_/txt_ keep reps via p_projection_filter,
    # w_topk_per_group, txt_language_id/pii_scrub/repetition_filter)
    "p_projection_filter",
    "so_except_intersect",
    "txt_language_id",
    "txt_pii_scrub",
    "txt_repetition_filter",
    "w_topk_per_group",
    # Family reps for the five families with no r2-green member:
    "f_binary_prefix",
    "g_connected_components",
    "pipe_provider_end_to_end",
    "s_cached_fetch",
    "sim_cosine_topk",
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
    """Import every plan module so registration side effects run."""
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
