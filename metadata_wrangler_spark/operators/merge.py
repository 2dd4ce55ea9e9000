"""Write-side merge operators — the reference's upsert semantics
re-expressed as set-oriented DataFrame transforms.

Reference semantics covered (SURVEY.md §2.7):

  get_one_or_create   `/root/reference/oclc/classify.py:958-967`
                      (unique on a key; insert iff absent)
  Metadata.apply      policy-guarded attribute-wise upsert; the one
                      hard rule is "a NULL never overwrites a value"
                      (`/root/reference/migration/20190205-remove-
                      content-cafe-coverage-for-books-with-no-title
                      .sql:9-11`)
  merge_into (D6)     contributor dedup + FK repoint
                      (`/root/reference/viaf.py:777-798`,
                      `/root/reference/oclc/classify.py:1311-1346`)
  bulk DELETE (D1)    anti-join rewrite
  UPDATE expr (D2)    column rewrite + overwrite

Each function is pure (DataFrames in → post-state DataFrame out);
persistence is `ParquetStateTable`, which commits a post-state via
parquet write with dynamic partition overwrite — the parquet-only
stand-in for a Delta/Iceberg MERGE target. On a cluster with a
transactional table format, swap `commit` for `MERGE INTO`; every
plan above it is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def get_one_or_create(
    current: DataFrame, incoming: DataFrame, key_cols: list[str]
) -> DataFrame:
    """Post-state of `get_one_or_create`: current rows win; incoming
    rows are appended only where the key is absent. One left_anti
    join (shuffle on the key; broadcast when incoming is small)."""
    fresh = incoming.join(
        current.select(*key_cols).dropDuplicates(), key_cols, "left_anti"
    )
    return current.unionByName(fresh)


def policy_merge(
    current: DataFrame,
    staged: DataFrame,
    key_cols: list[str],
    replace_cols: list[str],
    insert_missing: bool = True,
) -> DataFrame:
    """`Metadata.apply` post-state: attribute-wise upsert of one
    source's view with the null-guard policy — a staged NULL never
    overwrites a current value.

    ``replace_cols`` are the policy-guarded attributes; key columns
    identify the entity. Non-key, non-replace columns keep the
    current value (or take the staged one for brand-new keys).
    """
    other_cols = [
        c for c in current.columns if c not in key_cols + replace_cols
    ]
    c = current.alias("c")
    s = staged.alias("s")
    cond = None
    for k in key_cols:
        eq = F.col(f"c.{k}") == F.col(f"s.{k}")
        cond = eq if cond is None else (cond & eq)
    joined = c.join(s, cond, "full_outer")
    is_new = F.col(f"c.{key_cols[0]}").isNull()
    out_cols = []
    for k in key_cols:
        out_cols.append(F.coalesce(F.col(f"c.{k}"), F.col(f"s.{k}")).alias(k))
    for col in replace_cols:
        # staged non-null wins; staged NULL (or no staged row) keeps
        # the current value — the 20190205 migration's invariant.
        out_cols.append(
            F.when(F.col(f"s.{col}").isNotNull(), F.col(f"s.{col}"))
            .otherwise(F.col(f"c.{col}")).alias(col)
        )
    for col in other_cols:
        if col in staged.columns:
            out_cols.append(
                F.when(is_new, F.col(f"s.{col}"))
                .otherwise(F.col(f"c.{col}")).alias(col)
            )
        else:
            out_cols.append(F.col(f"c.{col}").alias(col))
    if not insert_missing:
        joined = joined.where(~is_new)
    return joined.select(*out_cols)


def merge_entities(
    entities: DataFrame,
    match_cols: list[str],
    id_col: str = "id",
) -> DataFrame:
    """D6 step 1 — canonicalization map: within each duplicate group
    (equal non-null ``match_cols``), the min-id row is canonical.

    Returns (old_id, canonical_id) for every entity (identity rows
    included, so FK repointing is a plain inner join).
    """
    non_null = None
    for m in match_cols:
        p = F.col(m).isNotNull()
        non_null = p if non_null is None else (non_null & p)
    canon = (
        entities.where(non_null)
        .groupBy(*match_cols)
        .agg(F.min(id_col).alias("canonical_id"))
    )
    mapped = entities.join(canon, match_cols, "left").select(
        F.col(id_col).alias("old_id"),
        F.coalesce("canonical_id", F.col(id_col)).alias("canonical_id"),
    )
    return mapped


def repoint_fks(
    referencing: DataFrame, mapping: DataFrame, fk_col: str
) -> DataFrame:
    """D6 step 2 — rewrite a foreign key through the canonicalization
    map (broadcast the map when duplicate groups are rare)."""
    m = mapping.withColumnsRenamed(
        {"old_id": fk_col, "canonical_id": f"_{fk_col}_canon"}
    )
    out = referencing.join(m, fk_col, "left")
    return out.withColumn(
        fk_col, F.coalesce(f"_{fk_col}_canon", fk_col)
    ).drop(f"_{fk_col}_canon")


def delete_where(df: DataFrame, predicate) -> DataFrame:
    """D1 post-state: bulk DELETE as a predicate-inverted filter.

    At scale the predicate prunes whole partitions before touching
    rows (Delta DELETE does the same under the hood)."""
    return df.where(~predicate)


def update_where(df: DataFrame, predicate, assignments: dict) -> DataFrame:
    """D2 post-state: UPDATE … SET col = expr WHERE predicate."""
    out = df
    for col, expr in assignments.items():
        out = out.withColumn(col, F.when(predicate, expr).otherwise(F.col(col)))
    return out


class ParquetStateTable:
    """Minimal transactional-ish state table on plain parquet.

    Writes go to a partitioned directory with dynamic partition
    overwrite, so a MERGE that only touches some partitions rewrites
    only those. Stand-in for Delta/Iceberg MERGE on clusters without
    a table format; the read/merge plans above are format-agnostic.
    """

    def __init__(self, spark: SparkSession, path: str,
                 partition_by: str | None = None):
        self.spark = spark
        self.path = path
        self.partition_by = partition_by

    def read(self) -> DataFrame:
        return self.spark.read.parquet(self.path)

    def init(self, df: DataFrame) -> None:
        w = df.write.mode("overwrite")
        if self.partition_by:
            w = w.partitionBy(self.partition_by)
        w.parquet(self.path)

    def commit(self, post_state: DataFrame) -> None:
        """Replace table contents with the post-state. With a
        partition column and dynamic overwrite mode, untouched
        partitions are preserved without a rewrite."""
        prev = self.spark.conf.get(
            "spark.sql.sources.partitionOverwriteMode", "static"
        )
        self.spark.conf.set(
            "spark.sql.sources.partitionOverwriteMode", "dynamic"
        )
        try:
            # Materialize before overwriting the directory being read.
            rows = post_state.localCheckpoint(eager=True)
            w = rows.write.mode("overwrite")
            if self.partition_by:
                w = w.partitionBy(self.partition_by)
            w.parquet(self.path)
        finally:
            self.spark.conf.set(
                "spark.sql.sources.partitionOverwriteMode", prev
            )
