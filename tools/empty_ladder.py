"""Empty-input ladder: run EVERY oracle-paired query against a
zero-row mirror of the test tables, on both engines, and compare
with the driver's own logic (rows + columns + value hash).

Why a whole ladder: the generator always emits rows, so "what does
this plan do on an empty table?" is never exercised by the driver's
gate or the NULL ladder. Empty inputs are not a corner case at
100 TB — they are every cold-start partition, every
predicate-prunes-everything incremental run, every new tenant. The
failure classes this surfaces are exactly the ones that take down a
scheduled pipeline at 3am:

  - driver-side probes that index into a `.collect()` result
    (`rows[0]`) or reduce over it (`max(...)`) without a guard;
  - numpy/Arrow local tiers called with zero-length arrays
    (reshape/argmin on empty raises);
  - global-aggregate queries where SQL returns ONE row of
    NULLs/zeros over an empty input (`SELECT count(*) ...` with no
    GROUP BY) while a plan that groups first returns ZERO rows —
    a genuine semantic drift between plan and oracle;
  - division by a COUNT that is now zero;
  - iterative operators whose convergence loop assumes a non-empty
    frontier on round 0.

Usage:  python tools/empty_ladder.py [src_sf_dir] [query ...]
        (default src: /root/testdata/sf0.001 — only schemas are
        taken from it; the mirror under /tmp/spark_graft_empty_ladder
        has the same columns/types and zero rows everywhere)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import duckdb

from check_oracle import check_one, oracle_connection

from metadata_wrangler_spark.catalog import TABLES


def build_mirror(src: str, dst: str) -> None:
    """Zero-row, schema-identical parquet copy of every table."""
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet') "
            f"WHERE false) TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
        (n,) = con.execute(
            f"SELECT count(*) FROM read_parquet('{dst}/{t}.parquet')"
        ).fetchone()
        if n != 0:
            raise AssertionError(f"empty ladder mirror of {t} has {n} rows")
    con.close()


def main() -> int:
    args = sys.argv[1:]
    src = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.001"
    names = [a for a in args if not os.path.isdir(a)]
    dst = "/tmp/spark_graft_empty_ladder"
    build_mirror(src, dst)

    from metadata_wrangler_spark.plans import ORACLES, load_all_plans, ordered_queries
    from metadata_wrangler_spark.session import get_spark

    load_all_plans()
    qs = ordered_queries()
    if names:
        # A mistyped src directory falls through os.path.isdir into
        # `names`, and an unknown query name would silently filter
        # qs to {} -- the ladder would then loop over nothing and
        # exit 0 "all green". Fail loudly instead (round-8 advice).
        unknown = sorted(set(names) - set(qs))
        if unknown:
            raise SystemExit(f"unknown queries (or bad src dir): {unknown}")
        qs = {k: v for k, v in qs.items() if k in names}
    if not qs:
        raise SystemExit("no queries selected -- nothing to verify")
    spark = get_spark()
    con = oracle_connection(dst)
    failures: dict[str, list[str]] = {}

    for name, fn in qs.items():
        t0 = time.monotonic()
        try:
            problems = check_one(spark, con, fn, ORACLES.get(name), dst)
        except Exception as e:  # noqa: BLE001 - inventory, don't stop
            problems = [f"{type(e).__name__}: {str(e)[:160]}"]
        dt = time.monotonic() - t0
        if problems:
            failures[name] = problems
            print(f"FAIL  {name}: {'; '.join(problems)} [{dt:.1f}s]",
                  flush=True)
        else:
            print(f"OK    {name} [{dt:.1f}s]", flush=True)
    print()
    if failures:
        print(f"{len(failures)} / {len(qs)} queries diverge on the "
              f"empty ladder:")
        for name in failures:
            print(f"  {name}")
        return 1
    print("all green on the empty ladder")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
