"""Driver-contract tests: __spark_entry__ exposes entry/queries/
oracle_sql with consistent keys, and entry() runs on a bare
SparkSession (the driver never uses our session factory)."""

from __future__ import annotations

import __spark_entry__ as mod


def test_queries_and_oracles_align():
    q = mod.queries()
    o = mod.oracle_sql()
    assert len(q) >= 80
    # every oracle belongs to a query; every query here has an oracle
    # (streaming-only ops would be the exception — none registered)
    assert set(o) <= set(q)
    missing = set(q) - set(o)
    assert missing == set(), f"rows-only queries present: {missing}"
    assert all(callable(fn) for fn in q.values())
    assert all(isinstance(sql, str) and sql.strip() for sql in o.values())


def test_entry_runs_and_returns_rows(spark):
    df = mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["key", "title", "author", "via"]


def test_query_names_follow_family_prefixes():
    families = ("p_", "j_", "a_", "w_", "so_", "f_", "d_", "g_", "ev_",
                "dd_", "txt_", "mm_", "sim_", "s_", "pipe_")
    for name in mod.queries():
        assert name.startswith(families), name


def test_lookup_urn_covers_all_dispositions(spark):
    """The §3.1 lookup twin yields every branch: parsed-and-resolved
    (200), pending metadata (202), unknown identifier (404),
    malformed urn (400)."""
    import __spark_entry__ as mod
    out = mod.queries()["pipe_lookup_urn"](spark, "/root/testdata/sf0.001")
    rows_ = out.collect()
    by_status = {}
    for r in rows_:
        by_status.setdefault(r["status"], []).append(r)
    assert set(by_status) == {200, 202, 400, 404}
    assert all(r["message"] == "Could not parse identifier."
               for r in by_status[400])
    assert all(r["message"] == "Identifier not found in collection"
               for r in by_status[404])
    assert all(r["message"] == "Metadata needed." for r in by_status[202])
    assert all(r["message"].startswith("Customer") for r in by_status[200])


def test_verification_window_covers_every_family():
    """The driver hash-checks the FIRST 50 entries of queries().
    Lock the ordering contract: the leading 50 are exactly
    VERIFICATION_PRIORITY (every name registered, no duplicates),
    and every operator family is driver-verified SOMEWHERE — either
    a representative sits inside this round's window, or one already
    has a green row in a committed CORRECTNESS_r*.json from a past
    round (the round-4 rotation gives every slot to never-verified
    queries, so p_/mm_/pipe_ reps ride on their r1-r3 green rows)."""
    import glob
    import json
    import os

    from metadata_wrangler_spark import plans

    q = mod.queries()
    names = list(q)
    prio = list(plans.VERIFICATION_PRIORITY)
    assert len(prio) == 50
    assert len(set(prio)) == 50
    assert names[:50] == prio

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    past_green: set[str] = set()
    for path in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        with open(path) as f:
            for name, row in json.load(f).items():
                if isinstance(row, dict) and row.get("hash_match"):
                    past_green.add(name)
    assert past_green, "no committed CORRECTNESS files found"

    window = set(names[:50])
    for family in {n.split("_")[0] for n in names}:
        members = [n for n in names if n.split("_")[0] == family]
        assert any(n in window or n in past_green for n in members), (
            f"family {family}_ has no windowed rep and no past "
            f"driver-green row"
        )
