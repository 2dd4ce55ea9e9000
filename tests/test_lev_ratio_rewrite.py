"""f_levenshtein_ratio round-10 rewrite: first-match-band dedup (no
post-join Exchange) and the digit-body levenshtein fast path.

The rewrite rests on two claims the oracle sweep alone exercises only
on format-conforming names:

1. A candidate pair colliding in MORE than one band is emitted exactly
   once — by a join-condition filter ("no earlier band also matches")
   instead of the old dropDuplicates shuffle over the full pair stream.
2. The banded DP runs on the 9-char digit body ONLY when both names
   are exactly 'Customer#' + digits (levenshtein is invariant under a
   shared prefix); any non-conforming name must fall back to the
   full-name DP, per row, so arbitrary corpora stay exact.

This file pins both: a plan-shape check (no hash-partitioned Exchange
anywhere — the only Exchange is the broadcast build) and an oracle
equivalence run over a corpus seeded with non-conforming names
(different prefix, different case, truncated digit bodies).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools",
    ),
)

from check_oracle import check_one, oracle_connection  # noqa: E402

from metadata_wrangler_spark import plans  # noqa: E402

SF = "/root/testdata/sf0.001"

plans.load_all_plans()
QUERIES = dict(plans.ordered_queries())
ORACLES = plans.ORACLES


def _explain_str(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_lev_ratio_has_no_pair_dedup_exchange(spark):
    """The candidate stream must flow join -> verify -> project with
    no shuffle: every Exchange in the plan is the broadcast build of
    the banded table (the old spelling's dropDuplicates added a
    hashpartitioning Exchange over the multi-million-row pairs).

    The broadcast threshold is PINNED for the assertion (round-10
    ADVICE): without it the "no hashpartitioning" check silently
    depends on sf0.001 size ESTIMATES staying under the session
    default — a stats or config change would flip the join to SMJ
    and fail this test with no real regression in what it pins."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set(
        "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
    )
    try:
        plan = _explain_str(QUERIES["f_levenshtein_ratio"](spark, SF))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "hashpartitioning" not in plan, plan
    assert "BroadcastHashJoin" in plan
    # Ordering assumption made explicit (round-10 ADVICE): the
    # measured win relies on Catalyst keeping the cheap first-match
    # band conjunct BEFORE the levenshtein CASE in the join
    # condition (left-to-right conjunct evaluation is behavior, not
    # contract — if an optimizer change reorders it, this assertion
    # flags the silent regression).
    cond = next(
        line for line in plan.splitlines() if "Join condition:" in line
    )
    assert 0 <= cond.find("band_no") < cond.find("levenshtein"), cond


def test_lev_ratio_nonconforming_names_match_oracle(spark, tmp_path):
    """Oracle equivalence on a corpus where the digit-body fast path
    is wrong unless guarded: names with a case-flipped prefix (pairs
    must NOT match on near digit bodies), names sharing a different
    prefix (pairs must still match, via the full-name fallback), and
    truncated names (short digit bodies on the fast path)."""
    import duckdb

    from metadata_wrangler_spark.catalog import TABLES

    dst = str(tmp_path / "sf_levmix")
    os.makedirs(dst, exist_ok=True)
    cp = duckdb.connect()
    for t in TABLES:
        sel = "*"
        if t == "customer":
            sel = (
                "* REPLACE (CASE"
                " WHEN c_custkey % 40 = 0"
                "   THEN 'CUSTOMER#' || substr(c_name, 10)"
                " WHEN c_custkey % 40 = 10"
                "   THEN 'Kustomer#' || substr(c_name, 10)"
                " WHEN c_custkey % 40 = 20"
                "   THEN substr(c_name, 1, 17)"
                " ELSE c_name END AS c_name)"
            )
        cp.execute(
            f"COPY (SELECT {sel} FROM read_parquet('{SF}/{t}.parquet'))"
            f" TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
    cp.close()

    con = oracle_connection(dst)
    try:
        problems = check_one(
            spark, con, QUERIES["f_levenshtein_ratio"],
            ORACLES["f_levenshtein_ratio"], dst,
        )
        assert not problems, problems
    finally:
        con.close()

    # the interesting paths actually produced rows (not vacuous):
    out = QUERIES["f_levenshtein_ratio"](spark, dst).collect()
    kust = [
        r for r in out
        if r.key_a % 40 == 10 and r.key_b % 40 == 10
    ]
    trunc = [
        r for r in out
        if r.key_a % 40 == 20 and r.key_b % 40 == 20
    ]
    assert kust, "no pair took the full-name fallback path"
    assert trunc, "no pair took the short-digit fast path"
