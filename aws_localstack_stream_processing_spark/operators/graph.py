"""Iterative graph operators (driver-coordinated DataFrame loops).

Connected components via min-label propagation: the standard dedup-cluster
step after pairwise near-dup detection (pairs → clusters → one canonical doc
per cluster). Each iteration is one join + one aggregate — all distributed;
the driver only checks the convergence counter, it never holds node data.
At 100 TB this is the large-star/small-star pattern; component diameters in
dedup graphs are tiny (near-dup relations are almost-cliques), so the loop
converges in a handful of rounds.
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
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .persist()
    )
    for _ in range(max_iter):
        # each node adopts min(own comp, neighbors' comps)
        neigh = (
            sym.join(labels, sym.b == labels.node)
            .groupBy(sym.a)
            .agg(F.min("comp").alias("ncomp"))
            .withColumnRenamed("a", "node")
        )
        new_labels = (
            labels.join(neigh, "node", "left")
            .select(
                "node",
                F.least(F.col("comp"), F.coalesce("ncomp", "comp")).alias("comp"),
            )
            .persist()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .limit(1)
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    sym.unpersist()
    return labels
