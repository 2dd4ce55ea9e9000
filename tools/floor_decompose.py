"""Floor decomposition for the slow-tail queries: split each query's
wall time into (scheduling floor) + (data-bound work) with MEASURED
quantities, so "correct but >2x the oracle at sf0.1" claims can be
adjudicated — is the gap a plan problem that scales, or N stages
times the fixed per-stage cost that amortizes to noise at 100 TB?

Method:
  - per-stage floor: a data-free 1-stage job (spark.range count over
    a shuffle) timed best-of-5 — the pure schedule/launch/AQE cost.
  - per query: best-of-3 wall (same protocol as bench.py's
    sequential series), plus the number of jobs and stages actually
    executed (statusTracker over a per-query job group).
  - est_floor = n_stages x per-stage floor; data_bound = wall -
    est_floor; data_ratio = data_bound / duckdb_wall.

Usage: python tools/floor_decompose.py [sf_dir] name...
Prints a table and one JSON line (for BENCH_NOTES capture).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from metadata_wrangler_spark.session import get_spark


def measure_stage_floor(spark) -> float:
    from pyspark.sql import functions as F

    def probe():
        (
            spark.range(1000)
            .withColumn("k", F.col("id") % 7)
            .groupBy("k").count().toPandas()
        )

    probe()
    best = float("inf")
    for _ in range(5):
        t0 = time.time()
        probe()
        best = min(best, time.time() - t0)
    # the probe is scan + exchange + final agg ≈ 2 stages
    return best / 2


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.1"
    names = args[1:] if args and os.path.isdir(args[0]) else args

    import duckdb

    import __spark_entry__ as entrymod
    from metadata_wrangler_spark.catalog import TABLES

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if not names:
        names = list(queries)

    spark = get_spark("floor_decompose")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    stage_floor = measure_stage_floor(spark)
    out = {}
    print(f"per-stage floor: {stage_floor*1000:.0f} ms")
    header = (f"{'query':34} {'spark':>7} {'duck':>7} {'ratio':>6} "
              f"{'jobs':>5} {'stages':>6} {'floor':>7} {'data':>7} "
              f"{'d-ratio':>7}")
    print(header)
    for name in names:
        fn = queries[name]
        fn(spark, sf_dir).toPandas()  # warm (codegen/JIT)
        group = f"fd-{name}"
        sc.setJobGroup(group, name)
        t0 = time.time()
        fn(spark, sf_dir).toPandas()
        _ = time.time() - t0
        job_ids = tracker.getJobIdsForGroup(group)
        n_stages = 0
        for j in job_ids:
            info = tracker.getJobInfo(j)
            if info is not None:
                n_stages += len(info.stageIds)
        sc.setJobGroup("fd-timing", name)
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            fn(spark, sf_dir).toPandas()
            best = min(best, time.time() - t0)
        dt0 = time.time()
        sql = oracles.get(name)
        dbest = None
        if sql:
            for _ in range(3):
                dt0 = time.time()
                con.execute(sql).fetchdf()
                dbest = min(dbest or 9e9, time.time() - dt0)
        est_floor = n_stages * stage_floor
        data = max(0.0, best - est_floor)
        row = {
            "spark": round(best, 3),
            "duck": round(dbest, 3) if dbest else None,
            "jobs": len(job_ids),
            "stages": n_stages,
            "est_floor": round(est_floor, 3),
            "data_bound": round(data, 3),
            "data_ratio": round(data / dbest, 2) if dbest else None,
        }
        out[name] = row
        print(f"{name:34} {best:6.2f}s {dbest or 0:6.2f}s "
              f"{best/(dbest or 1):5.1f}x {len(job_ids):5d} {n_stages:6d} "
              f"{est_floor:6.2f}s {data:6.2f}s "
              f"{(data/(dbest or 1)):6.1f}x")
    print(json.dumps({"stage_floor": round(stage_floor, 4), "queries": out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
