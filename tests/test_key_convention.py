"""Key-uniqueness data contract: the per-row-distinct convention.

Several plans compute per-ENTITY distincts within the entity's own
row instead of a global dropDuplicates shuffle — the minhash
shingle tables (operators/dedup.py:303), txt_idf_rarity's term
pairs, txt_ngram_novelty's per-doc totals, txt_bm25_search's tf
counters. That equivalence ("within-row distinct IS the global
(key, item) distinct") holds exactly when the base table's key is
unique; the NULL ladder deliberately never NULLs or duplicates
keys ("keys and FKs stay intact", tools/null_ladder.py). This test
pins the invariant those plans rely on at the DATA-CONTRACT level:
every base-table primary key must be unique and non-null in the
driver-generated data. If a future generator (or a new ladder)
breaks this, the failure points HERE — at the convention — rather
than surfacing as an opaque oracle hash mismatch in whichever
per-row plan trips first.

DuckDB-only: no Spark session, runs in milliseconds.
"""

from __future__ import annotations

import os

import duckdb
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

#: table -> primary key expression (composite keys as a tuple expr)
PRIMARY_KEYS = {
    "region": "r_regionkey",
    "nation": "n_nationkey",
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}

#: lineitem is deliberately ABSENT: the generator does NOT make
#: (l_orderkey, l_linenumber) unique (sf0.001: 6000 rows, 4599
#: distinct pairs — measured when this contract was added), so no
#: plan may apply the per-row-distinct convention keyed on it. A
#: test below pins that fact so the assumption cannot creep in.



@pytest.mark.parametrize("table,pk", sorted(PRIMARY_KEYS.items()))
def test_primary_key_unique_and_nonnull(table, pk):
    path = os.path.join(SF_DIR, f"{table}.parquet")
    if not os.path.exists(path):
        pytest.skip(f"{path} absent")
    con = duckdb.connect()
    n, nk, nn = con.execute(
        f"""
        SELECT COUNT(*),
               COUNT(DISTINCT {pk}),
               SUM(CASE WHEN {pk} IS NULL THEN 1 ELSE 0 END)
        FROM read_parquet('{path}')
        """
    ).fetchone()
    assert nn in (0, None), f"{table}.{pk} has NULLs"
    assert n == nk, f"{table}.{pk} not unique: {n} rows, {nk} distinct"


def test_lineitem_composite_key_is_not_unique():
    """Anti-contract: document that lineitem has NO unique key in
    the generated data — a plan applying the per-row-distinct
    convention to lineitem would silently diverge from its oracle
    on real driver data, so the convention is documents/dimension
    keyed only. If the generator ever makes the pair unique, this
    test fails and BOTH facts should be re-recorded."""
    path = os.path.join(SF_DIR, "lineitem.parquet")
    if not os.path.exists(path):
        pytest.skip(f"{path} absent")
    con = duckdb.connect()
    n, nk = con.execute(
        f"""
        SELECT COUNT(*), COUNT(DISTINCT (l_orderkey, l_linenumber))
        FROM read_parquet('{path}')
        """
    ).fetchone()
    assert nk < n, "generator now emits unique lineitem keys - re-record"
