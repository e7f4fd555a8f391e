"""Iterative graph operators (driver-coordinated DataFrame loops).

Connected components via min-label propagation WITH pointer doubling: the
standard dedup-cluster step after pairwise near-dup detection (pairs →
clusters → one canonical doc per cluster). Each round does (1) a hook step
— every node adopts the min component label among itself and its
neighbors — and (2) a jump step — every node re-points to its label's
label (``comp = comp[comp]``), the large-star/small-star contraction of
Kiveris et al. "Connected Components in MapReduce and Beyond" (SOCC'14).
Hooking alone needs O(diameter) rounds; hook+jump converges in
O(log diameter) (tests/test_graph.py proves the bound on a long path).

All per-round work is distributed (two joins + one aggregate). The only
driver interaction per round is a 1-row convergence counter
(``limit(1).count()``) — the driver never holds node data. Spark cannot
express this fixpoint as a native recursive CTE: the SQL standard (and
Spark 4.1) forbids aggregation in the recursive term, and the
enumerable-paths encoding explodes on the near-clique components dedup
graphs produce, so the materialized-loop shape is the one that scales.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 20
) -> DataFrame:
    """Return (node, component) where component = min node id reachable.

    ``edges`` is undirected input (each pair once); isolated nodes absent
    from ``edges`` are simply not returned (callers union them back if
    needed).
    """
    sym = (
        edges.selectExpr(f"{src} AS a", f"{dst} AS b")
        .unionByName(edges.selectExpr(f"{dst} AS a", f"{src} AS b"))
        .distinct()
        .persist()
    )
    # Each round references the previous labels TWICE (hook join + pointer
    # table), so the logical plan would double per round — persist()
    # truncates execution but Catalyst still re-analyzes the full lineage,
    # which is exponential in rounds. localCheckpoint (eager) truncates the
    # plan itself: per-round analysis cost stays constant. On a real
    # cluster with executor churn, swap for reliable checkpoint().
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        # hook: each node adopts min(own comp, neighbors' comps)
        neigh = (
            sym.join(labels, sym.b == labels.node)
            .groupBy(sym.a)
            .agg(F.min("comp").alias("ncomp"))
            .withColumnRenamed("a", "node")
        )
        hooked = labels.join(neigh, "node", "left").select(
            "node",
            F.least(F.col("comp"), F.coalesce("ncomp", "comp")).alias("comp"),
        )
        # jump (pointer doubling): comp = comp's own current label, so label
        # chains halve every round — O(log diameter) total rounds
        ptr = hooked.select(
            F.col("node").alias("comp"), F.col("comp").alias("comp2")
        )
        new_labels = (
            hooked.join(ptr, "comp", "left")
            .select("node", F.coalesce("comp2", "comp").alias("comp"))
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    sym.unpersist()
    return labels
