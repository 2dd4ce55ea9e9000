"""Bounded weighted transitive closure over an identifier-equivalency
edge table — the reference's one genuinely non-relational algorithm.

Reference semantics being re-expressed (see SURVEY.md §2.3 J4):
  * `Identifier.recursively_equivalent_identifier_ids(levels, threshold)`
    — `/root/reference/scripts.py:493-496` (levels=6, threshold=0),
    `/root/reference/oclc/linked_data.py:958-962`.
  * per-edge strength cutoff while walking —
    `/root/reference/oclc/linked_data.py:820-830` (`strength <= 0.7`
    edges are not followed).

Spark design — adaptive two-tier:

  * **Distributed tier** (the 100 TB path): breadth-first frontier
    expansion with one equi-join per level (closure) / min-label
    propagation with pointer-jump acceleration (components). The
    visited set is accumulated and each new frontier is anti-joined
    against it, so a node is expanded exactly once (min-level
    semantics, cycle-safe). ``localCheckpoint`` truncates the lineage
    each level — without it the iterative plan grows exponentially
    and the optimizer chokes long before 100 TB.
  * **Local tier**: iterative jobs cost ~0.3-0.5 s each in scheduling
    alone, so when the deduplicated edge set is small enough to hold
    on the driver (``local_solve_max_edges``, default 10^6 edges ≈
    16 MB) the closure is solved in-process on the already-
    materialized edges — the same trick every production graph
    system uses (a recursive-CTE engine IS the local tier). Both
    tiers produce identical rows; tests assert the equivalence.

Scale notes:
  * The frontier is usually far smaller than the edge table; the edge
    table is the big side. The filtered edge set is materialized ONCE
    (checkpoint) and every per-level join reuses it.
  * Closure level count is bounded (default 6, per the reference), so
    the total work is ≤ levels × one join — no fixpoint risk.
  * For whole-graph consolidation (Work clustering) use
    ``connected_components``, the same loop run to fixpoint on
    min-id label propagation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Above this many deduplicated edges the driver-local tier is skipped
# and the distributed loop runs. 10^6 (src,dst) longs ≈ 16 MB on the
# driver — far below any sane driver heap; at 100 TB the edge tables
# are billions of rows and always take the distributed path.
LOCAL_SOLVE_MAX_EDGES = 1_000_000


def equivalent_ids(
    edges: DataFrame,
    seeds: DataFrame,
    levels: int = 6,
    threshold: float = 0.0,
    src: str = "src",
    dst: str = "dst",
    strength: str = "strength",
    local_solve_max_edges: int = LOCAL_SOLVE_MAX_EDGES,
) -> DataFrame:
    """All nodes reachable from ``seeds`` in ≤ ``levels`` hops using
    edges with ``strength`` > ``threshold``.

    Parameters
    ----------
    edges : DataFrame with columns (src, dst, strength)
    seeds : DataFrame whose first column holds seed node ids
    Returns DataFrame(node BIGINT, level INT) — min hop distance.
    """
    spark = edges.sparkSession
    seed_col = seeds.columns[0]
    # Materialize the filtered edge set ONCE. Every level joins
    # against it (and the local tier collects from it); without the
    # checkpoint each level re-runs the upstream scan + filter +
    # dedup (at 100 TB: levels × full-table reads instead of one).
    usable = (
        edges.where(F.col(strength) > F.lit(threshold))
        .select(F.col(src).alias("_src"), F.col(dst).alias("_dst"))
        .dropDuplicates()
        .localCheckpoint(eager=True)
    )
    # One bounded collect serves as BOTH the size probe and the local
    # tier's edge materialization (the count-then-collect spelling
    # paid two jobs). On the checkpointed edges the limit scan is
    # cheap and stops early when the graph is big.
    probe = usable.limit(local_solve_max_edges + 1).collect()
    if len(probe) <= local_solve_max_edges:
        return _equivalent_ids_local(spark, probe, seeds, seed_col, levels)

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
        # Lazy checkpoint + count: the count job materializes the
        # checkpoint (truncating lineage so iteration plans never
        # nest) AND serves as the emptiness probe — one job per level
        # instead of an eager-checkpoint job plus an isEmpty job.
        nxt = nxt.localCheckpoint(eager=False)
        if nxt.count() == 0:
            break
        frontiers.append(nxt)
        visited = frontiers[0]
        for f in frontiers[1:]:
            visited = visited.unionByName(f)
        frontier = nxt

    return visited


def _equivalent_ids_local(
    spark, edge_rows, seeds: DataFrame, seed_col: str, levels: int
) -> DataFrame:
    """Driver-local BFS over the already-collected edge rows —
    row-identical to the distributed loop."""
    adj: dict[int, list[int]] = {}
    for r in edge_rows:
        if r._src is None or r._dst is None:
            continue
        adj.setdefault(int(r._src), []).append(int(r._dst))
    level_of: dict[int, int] = {}
    for r in seeds.select(seed_col).dropDuplicates().collect():
        if r[0] is not None:
            level_of.setdefault(int(r[0]), 0)
    frontier = list(level_of)
    for lvl in range(1, levels + 1):
        nxt = []
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in level_of:
                    level_of[v] = lvl
                    nxt.append(v)
        if not nxt:
            break
        frontier = nxt
    return spark.createDataFrame(
        list(level_of.items()), "node bigint, level int"
    )


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 50,
    pointer_jump_after: int = 10,
    local_solve_max_edges: int = LOCAL_SOLVE_MAX_EDGES,
) -> DataFrame:
    """Connected components by min-id label propagation (the Work
    consolidation variant of the closure: every identifier cluster
    gets one canonical label).

    Returns DataFrame(node BIGINT, component BIGINT).

    Large-graph variant of the same loop as ``equivalent_ids`` — runs
    to fixpoint instead of a level bound; each round is one join +
    one aggregate, with lineage checkpointing. Plain propagation
    converges in O(diameter) rounds (the min label travels one hop
    per round), which is optimal for the shallow clusters real
    identifier graphs produce — a pointer-jump acceleration measured
    12 -> 7 rounds on an 11-diameter test graph but its extra label
    self-join cost more than the saved rounds. It is NOT optimal for
    adversarial long-path graphs (a 10^4-node chain would need 10^4
    rounds), so after ``pointer_jump_after`` rounds the loop turns on
    pointer jumping — each node also adopts the label of its label —
    which halves the remaining label distance per round and converges
    in O(log diameter) additional rounds. Shallow graphs never pay
    for the self-join; deep graphs finish ~10 + log2(diameter)
    rounds instead of diameter. Small graphs (``local_solve_max_edges``)
    are solved driver-local by union-find on the materialized edge
    set — identical rows, none of the per-round scheduling cost.
    """
    spark = edges.sparkSession
    # Materialize the symmetrized edge set ONCE — every propagation
    # round joins against it (and the local tier collects from it);
    # without the checkpoint each round re-runs the upstream scan +
    # union + dedup from the source table.
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
    # Bounded collect = size probe + local-tier materialization in
    # one job (see equivalent_ids).
    probe = sym.limit(local_solve_max_edges + 1).collect()
    if len(probe) <= local_solve_max_edges:
        return _connected_components_local(spark, probe)

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

    for rnd in range(max_iterations):
        # Every node adopts the min label among itself and its
        # neighbours' labels.
        neighbour_labels = (
            sym.join(labels, sym.b == labels.node)
            .select(F.col("a").alias("node"), "component")
        )
        candidates = labels.unionByName(neighbour_labels)
        if rnd >= pointer_jump_after:
            # Pointer jump: adopt the label OF your label. Labels only
            # point within the component, so this is sound; distance
            # to the min label halves per round → O(log diameter).
            parents = labels.select(
                F.col("node").alias("component"),
                F.col("component").alias("_jump"),
            )
            jumped = (
                labels.join(parents, "component")
                .select("node", F.col("_jump").alias("component"))
            )
            candidates = candidates.unionByName(jumped)
        # Lazy checkpoint: the SUM probe below scans every partition,
        # so it both materializes this round's labels (truncating
        # lineage) and measures convergence — one job per round
        # instead of a checkpoint job plus a probe job.
        labels = (
            candidates
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=False)
        )
        new_sum = labels.agg(F.sum("component")).collect()[0][0]
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    return labels


def _connected_components_local(spark, edge_rows) -> DataFrame:
    """Driver-local union-find over the already-collected
    symmetrized edge rows — row-identical to the distributed loop
    (component = min node id in the component)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for r in edge_rows:
        a, b = r.a, r.b
        if a is None or b is None:
            continue
        a, b = int(a), int(b)
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comp_min: dict[int, int] = {}
    roots = {n: find(n) for n in parent}
    for n, root in roots.items():
        if root not in comp_min or n < comp_min[root]:
            comp_min[root] = n
    out = [(n, comp_min[root]) for n, root in roots.items()]
    return spark.createDataFrame(out, "node bigint, component bigint")
