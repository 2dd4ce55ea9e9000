"""Local mirror of the driver's correctness gate: run every
`queries()` entry on Spark and its `oracle_sql()` twin on DuckDB over
the same parquet tables, then compare row count, column names, and an
order-insensitive value hash.

Usage:  python tools/check_oracle.py [sf_dir] [query ...]
        python tools/check_oracle.py [sf_dir] --window
            check ONLY the first 50 ordered queries — exactly the
            slice the driver's per-round correctness gate verifies
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from metadata_wrangler_spark.catalog import TABLES
from metadata_wrangler_spark.session import get_spark


def _normalize_cell(v):
    import datetime
    import decimal
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if v != v:  # NaN (pandas NULL in a float64 column)
            return "NULL"
        return repr(float(v))
    if isinstance(v, decimal.Decimal):
        return repr(float(v))
    if isinstance(v, datetime.datetime):
        if v != v:  # pandas NaT
            return "NULL"
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    return str(v)


def oracle_fetch(rel):
    """Materialize a DuckDB relation THE WAY THE DRIVER DOES — via
    Arrow, not ``fetchall``. The representation matters: DuckDB's
    HUGEINT (the result type of SUM over integers) crosses Arrow as
    decimal128 and normalizes as a float ("3.0"), while fetchall
    yields plain Python int ("3") — so an oracle missing a
    CAST(... AS BIGINT) hashes differently at the driver while a
    fetchall-based mirror stays green. Round 4 shipped two such
    latent bugs (j_bloom_prune, ev_unpivot_long); this mirror reds
    them locally first. Validated against CORRECTNESS_r04: the two
    known HUGEINT bugs red here, and the driver-green nullable-BIGINT
    and INTEGER-with-NULL queries (ev_asof_join,
    s_xml_classify_response) stay green — a plain fetchdf mirror
    fails that second check because pandas widens nullable ints to
    float64 on the oracle side only."""
    tbl = rel.fetch_arrow_table()
    cols = [c.lower() for c in tbl.column_names]
    rows = [tuple(d[c] for c in tbl.column_names) for d in tbl.to_pylist()]
    return cols, rows


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(_normalize_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def oracle_connection(sf_dir: str):
    """DuckDB connection with every engine table registered as a
    view over the same parquet the Spark side reads."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def check_one(spark, con, fn, sql: str | None, sf_dir: str) -> list[str]:
    """Run one named plan on Spark and its oracle on DuckDB; return
    the list of mismatches (empty = green). This is the exact
    comparison the driver's correctness gate applies — shared by the
    CLI below and tests/test_all_oracles.py."""
    sdf = fn(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = [c.lower() for c in sdf.columns]
    if sql is None:
        return []  # rows-only check: reaching here without raising
    ocols, orows = oracle_fetch(con.sql(sql))
    problems = []
    if sorted(scols) != sorted(ocols):
        problems.append(f"cols spark={sorted(scols)} duck={sorted(ocols)}")
    if len(srows) != len(orows):
        problems.append(f"rows spark={len(srows)} duck={len(orows)}")
    if not problems:
        sh = value_hash(scols, srows)
        oh = value_hash(ocols, orows)
        if sh != oh:
            problems.append(f"hash spark={sh} duck={oh}")
    return problems


def main() -> int:
    args = [a for a in sys.argv[1:]]
    window = "--window" in args
    args = [a for a in args if a != "--window"]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    import __spark_entry__ as entrymod
    from metadata_wrangler_spark.plans import VERIFICATION_WINDOW
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if window:
        queries = dict(list(queries.items())[:VERIFICATION_WINDOW])

    spark = get_spark("check_oracle")
    con = oracle_connection(sf_dir)

    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        spark_secs = time.time() - t0
        if name not in oracles:
            print(f"ROWS  {name}: {len(srows)} rows (no oracle) "
                  f"[{spark_secs:.1f}s]")
            continue
        try:
            ocols, orows = oracle_fetch(con.sql(oracles[name]))
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failures.append(name)
            continue
        scols_l = [c.lower() for c in scols]
        problems = []
        if sorted(scols_l) != sorted(ocols):
            problems.append(f"cols spark={sorted(scols_l)} duck={sorted(ocols)}")
        if len(srows) != len(orows):
            problems.append(f"rows spark={len(srows)} duck={len(orows)}")
        if not problems:
            sh = value_hash(scols_l, [tuple(r) for r in srows])
            oh = value_hash(ocols, orows)
            if sh != oh:
                problems.append(f"hash spark={sh} duck={oh}")
                # show a few differing lines to debug
                sset = {tuple(_normalize_cell(v) for v in r) for r in
                        (tuple(x[i] for i in sorted(range(len(scols_l)),
                         key=lambda j: scols_l[j])) for x in
                         (tuple(r) for r in srows))}
                oset = {tuple(_normalize_cell(v) for v in r) for r in
                        (tuple(x[i] for i in sorted(range(len(ocols)),
                         key=lambda j: ocols[j])) for x in
                         (tuple(r) for r in orows))}
                for d in list(sset - oset)[:3]:
                    print(f"        spark-only: {d}")
                for d in list(oset - sset)[:3]:
                    print(f"        duck-only:  {d}")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            failures.append(name)
        else:
            print(f"OK    {name}: {len(srows)} rows [{spark_secs:.1f}s]")

    print()
    if failures:
        print(f"{len(failures)} failing: {failures}")
        return 1
    print("all green")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
