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
# `queries()` each round (dict iteration order). Round 2 verified the
# first 50 registrations (all dd_/txt_/mm_/d_/p_/j_/a_/w_/so_ core
# entries — green in CORRECTNESS_r02.json); this list promotes the
# remaining families (f_/g_/sim_/ev_/s_/pipe_ plus the scoring w_
# queries) into the window so every SURVEY.md §2 family earns a
# driver-verified row, and one representative of the p_/d_/txt_/mm_
# families (fully verified in round 2) keeps every family green each
# round. Near-duplicate variants (multi-probe / multi-table LSH,
# response/shortest/strip/token-sort twins of in-window entries)
# stay behind the window alongside the rest of the r2-verified set.
VERIFICATION_PRIORITY: tuple[str, ...] = (
    "so_drop_duplicates",
    "f_regex_extract_ids",
    "f_normalize_fingerprint",
    "f_levenshtein_ratio",
    "f_date_functions",
    "f_isbn10_to_13",
    "f_title_token_jaccard",
    "a_category_pct",
    "j_first_match",
    "w_order_by_rank",
    "w_viaf_candidate_score",
    "mm_binary_features",
    "ev_tumbling_window",
    "ev_incremental_updates",
    "ev_sessionized_gaps",
    "f_role_vocab_map",
    "f_stateful_role_split",
    "f_name_munge",
    "txt_quality_score",
    "f_url_classify",
    "f_binary_prefix",
    "f_strip_accents",
    "w_coalesce_cascade",
    "d_policy_merge_preview",
    "g_edge_one_hop",
    "g_transitive_closure",
    "g_connected_components",
    "pipe_provider_end_to_end",
    "pipe_lookup_urn",
    "pipe_updates_feed",
    "pipe_metadata_nested_apply",
    "s_xml_classify",
    "p_compound_predicates",
    "s_viaf_cluster",
    "s_jsonld_contributor",
    "s_jsonld_graph",
    "s_marc_json",
    "s_ntriples_scan",
    "s_html_scrape",
    "s_opds_feed",
    "s_cached_fetch",
    "s_soap_demand",
    "s_csv_roundtrip",
    "s_opds_sink",
    "s_image_mirror_rewrite",
    "s_overdrive_json",
    "sim_cosine_topk",
    "sim_lsh_topk",
    "sim_ivf_topk",
    "dd_embedding_cosine",
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
