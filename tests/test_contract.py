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
