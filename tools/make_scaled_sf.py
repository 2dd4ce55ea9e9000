"""Generate a scaled-up copy of a driver testdata directory.

Usage: python tools/make_scaled_sf.py [factor] [src_dir] [dst_dir]
       (defaults: 10 /root/testdata/sf0.1 .scaled/sf1)

Each table is replicated ``factor`` times with all primary/foreign
keys shifted by a per-table stride per copy, so referential
integrity (orders→customer, lineitem→orders/part/supplier) is
preserved copy-by-copy and every key stays unique. Dimension tables
(region, nation) are NOT scaled — exactly how real star schemas
scale: facts grow, dims don't.

Content columns are perturbed so the scaled corpus doesn't become a
pile of exact duplicates (which would turn every dedup query
quadratic in the copy count and misrepresent the workload):

* documents.text — word-rotated by a per-copy offset (preserves
  token/length distributions; shingle sets diverge, so cross-copy
  near-dup structure stays realistic);
* customer.c_name — regenerated from the shifted key (identical
  names across copies collapse the fuzzy-match blocking keys: 27.4M
  candidate pairs instead of ~340k at sf1 — a duplicate-content
  artifact, not scaling);
* part.p_name — words suffixed per copy (token-set joins like the
  title Jaccard otherwise pair every copy with every other copy:
  ~100× pairs for 10× data on BOTH engines);
* embeddings.embedding — cyclically rotated by the copy index
  (norms and WITHIN-copy pairwise dot products are exactly
  preserved; cross-copy products decorrelate);
* events.ts — unchanged: ×factor event density over the same time
  range, i.e. windows get denser, sessions per user don't warp.

Everything is deterministic — re-running reproduces byte-identical
inputs, and the Spark plans and DuckDB oracles see the same bits.

This feeds the scale-trend measurement (SCALE.md): run
``SPARK_GRAFT_SF_DIR=.scaled/sf1 python bench.py`` and compare the
ratio against the sf0.1 round numbers.
"""

from __future__ import annotations

import os
import sys

import duckdb


def stride(con, src: str, table: str, key: str) -> int:
    (m,) = con.sql(
        f"SELECT COALESCE(MAX({key}), 0) FROM "
        f"read_parquet('{src}/{table}.parquet')"
    ).fetchone()
    return int(m) + 1


def main() -> int:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dst = sys.argv[3] if len(sys.argv) > 3 else ".scaled/sf1"
    os.makedirs(dst, exist_ok=True)

    con = duckdb.connect()
    con.execute(f"CREATE TABLE copies AS SELECT * FROM range({factor}) t(i)")

    k_cust = stride(con, src, "customer", "c_custkey")
    k_supp = stride(con, src, "supplier", "s_suppkey")
    k_part = stride(con, src, "part", "p_partkey")
    k_ord = stride(con, src, "orders", "o_orderkey")
    k_ev = stride(con, src, "events", "event_id")
    k_user = stride(con, src, "events", "user_id")
    k_doc = stride(con, src, "documents", "doc_id")
    k_vec = stride(con, src, "embeddings", "vec_id")

    jobs = {
        "region": "SELECT * FROM t",
        "nation": "SELECT * FROM t",
        "customer": f"""
            SELECT c_custkey + i * {k_cust} AS c_custkey,
                   CASE WHEN i = 0 THEN c_name
                        ELSE 'Customer#' || lpad(CAST(c_custkey
                             + i * {k_cust} AS VARCHAR), 9, '0')
                   END AS c_name,
                   * EXCLUDE (c_custkey, c_name, i)
            FROM t, copies""",
        "supplier": f"""
            SELECT s_suppkey + i * {k_supp} AS s_suppkey,
                   * EXCLUDE (s_suppkey, i)
            FROM t, copies""",
        "part": f"""
            SELECT p_partkey + i * {k_part} AS p_partkey,
                   CASE WHEN i = 0 THEN p_name
                        ELSE array_to_string(list_transform(
                             string_split(p_name, ' '),
                             w -> w || '~' || i), ' ')
                   END AS p_name,
                   * EXCLUDE (p_partkey, p_name, i)
            FROM t, copies""",
        "orders": f"""
            SELECT o_orderkey + i * {k_ord} AS o_orderkey,
                   o_custkey + i * {k_cust} AS o_custkey,
                   * EXCLUDE (o_orderkey, o_custkey, i)
            FROM t, copies""",
        "lineitem": f"""
            SELECT l_orderkey + i * {k_ord} AS l_orderkey,
                   l_partkey + i * {k_part} AS l_partkey,
                   l_suppkey + i * {k_supp} AS l_suppkey,
                   * EXCLUDE (l_orderkey, l_partkey, l_suppkey, i)
            FROM t, copies""",
        "events": f"""
            SELECT event_id + i * {k_ev} AS event_id,
                   ts,
                   user_id + i * {k_user} AS user_id,
                   event_type, value, props
            FROM t, copies""",
        "documents": f"""
            SELECT doc_id + i * {k_doc} AS doc_id,
                   CASE WHEN i = 0 THEN text ELSE array_to_string(
                       list_concat(
                           string_split(text, ' ')[1 + ((i * 7) % greatest(len(string_split(text, ' ')), 1)):],
                           string_split(text, ' ')[:((i * 7) % greatest(len(string_split(text, ' ')), 1))]
                       ), ' ')
                   END AS text,
                   lang, source, n_chars
            FROM t, copies""",
        "embeddings": f"""
            SELECT vec_id + i * {k_vec} AS vec_id,
                   CASE WHEN i = 0 THEN embedding ELSE
                       list_concat(embedding[1 + (i % len(embedding)):],
                                   embedding[:(i % len(embedding))])
                   END AS embedding,
                   label
            FROM t, copies""",
    }
    # Row-group sizing: row groups are the parquet split unit, so a
    # single-file table with few row groups caps scan parallelism at
    # that count — and broadcast-join pair scoring (cosine, token
    # jaccard) runs INSIDE the probe side's scan stage, so a 3-row-
    # group embeddings file serializes millions of pair scores onto
    # 3 tasks. At production scale a table is many files and this
    # never arises; locally, size row groups so every table splits
    # to ≥ the core count.
    row_group = {
        "documents": 1024, "embeddings": 512, "part": 4096,
        "customer": 4096, "supplier": 512,
    }
    for table, body in jobs.items():
        sql = body.replace(
            "FROM t", f"FROM read_parquet('{src}/{table}.parquet') t"
        )
        con.execute(
            f"COPY ({sql}) TO '{dst}/{table}.parquet' "
            f"(FORMAT PARQUET, ROW_GROUP_SIZE {row_group.get(table, 65536)})"
        )
        (n,) = con.sql(
            f"SELECT COUNT(*) FROM read_parquet('{dst}/{table}.parquet')"
        ).fetchone()
        print(f"{table}: {n} rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
