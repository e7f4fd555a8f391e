"""Iterative graph analytics beyond connected components
(``dedup_cc_clusters``): fixed-point PageRank over the customer ↔
supplier bipartite graph implied by orders × lineitem.

Determinism: ranks are carried as BIGINT micro-units (1 rank = 10^12
units) and every division is truncating integer division, so the
numbers are bit-identical in any engine — no float accumulation, no
decimal-division scale rules. The documented tradeoff is a ≤ outdeg
unit truncation loss per node per iteration (bounded by nodes·iters ≈
10^-9 of total mass), which is part of the operator's contract.

Scale notes: the edge list is built once and reused across iterations
(persist + localCheckpoint on the Spark side — at cluster scale each
iteration is one shuffle on dst; lineage is cut so iteration N does not
replay iterations 1..N-1). The rank vector is |V| rows, never
collected to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dialect import tbl, views
from .registry import query

_SCALE = 1_000_000_000_000  # 1.0 rank in integer units
_DAMP_NUM, _DAMP_DEN = 85, 100
_ITERS = 3
_SUPP_OFFSET = 1_000_000
_TOP = 30


def _pagerank_oracle() -> str:
    d = "duck"
    edges = f"""
  SELECT DISTINCT o.o_custkey AS src, l.l_suppkey + {_SUPP_OFFSET} AS dst
  FROM {tbl('orders', d)} o JOIN {tbl('lineitem', d)} l
    ON o.o_orderkey = l.l_orderkey
"""
    sql = f"""
WITH fwd AS ({edges}),
edges AS (
  SELECT src, dst FROM fwd UNION ALL SELECT dst AS src, src AS dst FROM fwd
),
deg AS (
  SELECT src AS node, COUNT(*) AS outdeg FROM edges GROUP BY src
),
nn AS (SELECT COUNT(*) AS n FROM deg),
r0 AS (
  SELECT node, outdeg, ({_SCALE} // (SELECT n FROM nn)) AS rank_u FROM deg
)
"""
    prev = "r0"
    for i in range(1, _ITERS + 1):
        sql += f""",
c{i} AS (
  SELECT e.dst AS node, SUM(r.rank_u // r.outdeg) AS inflow
  FROM edges e JOIN {prev} r ON e.src = r.node
  GROUP BY e.dst
),
r{i} AS (
  SELECT d.node, d.outdeg,
         (({_SCALE} * (100 - {_DAMP_NUM}) // {_DAMP_DEN}) // (SELECT n FROM nn))
         + ({_DAMP_NUM} * COALESCE(c{i}.inflow, 0) // {_DAMP_DEN}) AS rank_u
  FROM deg d LEFT JOIN c{i} ON d.node = c{i}.node
)
"""
        prev = f"r{i}"
    sql += f"""
SELECT node, CAST(rank_u AS BIGINT) AS rank_u
FROM {prev}
ORDER BY rank_u DESC, node
LIMIT {_TOP}
"""
    # CAST matters: DuckDB SUM(BIGINT) widens to HUGEINT, which pandas
    # renders as float64 — identical values, different hash. Spark keeps
    # BIGINT throughout, so pin the oracle to BIGINT at the boundary.
    return sql


@query("graph_pagerank", oracle=_pagerank_oracle(), tags=("graph", "iterative"))
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point PageRank (damping 0.85, 3 iterations) over the
    undirected customer↔supplier purchase graph. The Spark side runs the
    iteration as a DataFrame loop with the edge list persisted once and
    the rank vector localCheckpoint-ed per step (cuts lineage so step N
    is one shuffle, not a replay of the whole history); the oracle is
    the same recurrence unrolled as CTEs. Integer micro-unit arithmetic
    makes both bit-identical."""
    t = views(spark, sf_dir, "orders", "lineitem")
    fwd = (
        t["orders"]
        .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey") + _SUPP_OFFSET).alias("dst"),
        )
        .distinct()
    )
    edges = fwd.unionAll(fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    edges = edges.persist()
    deg = edges.groupBy("src").agg(F.count("*").alias("outdeg")).withColumnRenamed("src", "node")
    n_nodes = deg.count()  # one scalar to the driver — sizes the teleport term

    base = (_SCALE * (100 - _DAMP_NUM) // _DAMP_DEN) // n_nodes
    ranks = deg.select("node", "outdeg", F.lit(_SCALE // n_nodes).alias("rank_u"))
    for _ in range(_ITERS):
        contrib = (
            edges.join(ranks, edges.src == ranks.node)
            # integer DIV, never float `/`: a double quotient can round up
            # across the floor boundary and desync from the oracle
            .select(edges.dst.alias("node"), F.expr("rank_u DIV outdeg").alias("share"))
            .groupBy("node")
            .agg(F.sum("share").alias("inflow"))
        )
        ranks = (
            deg.join(contrib, "node", "left")
            .select(
                "node",
                "outdeg",
                F.expr(
                    f"{base}L + (({_DAMP_NUM} * coalesce(inflow, 0L)) DIV {_DAMP_DEN})"
                ).alias("rank_u"),
            )
            .localCheckpoint(eager=False)
        )
    out = ranks.select("node", "rank_u").orderBy(F.desc("rank_u"), "node").limit(_TOP)
    return out


# ---------------------------------------------------------------------------
# Degree-oriented triangle counting.
# ---------------------------------------------------------------------------

_TRI_TOP = 20


def _triangle_prologue(
    d: str, pairs_src: str | None = None, or_src: str | None = None
) -> str:
    """The shared WITH-prologue (pairs → deg → oriented → tri) of the
    degree-oriented wedge machinery, ending after the ``tri`` CTE with no
    trailing SELECT — composed by both the triangle-count and the
    clustering-coefficient templates (callers append their own final
    SELECT and may append further CTEs after a comma)."""
    li = tbl("lineitem", d)
    if pairs_src and or_src:
        head = f"""
WITH pairs AS (SELECT u, v FROM {pairs_src}),
oriented AS (SELECT src, dst, dst_deg FROM {or_src})"""
    else:
        head = f"""
WITH pairs AS (
  SELECT DISTINCT l1.l_partkey AS u, l2.l_partkey AS v
  FROM {li} l1 JOIN {li} l2
    ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
), deg AS (
  SELECT node, COUNT(*) AS dg FROM (
    SELECT u AS node FROM pairs UNION ALL SELECT v AS node FROM pairs
  ) b GROUP BY node
), oriented AS (
  SELECT CASE WHEN du.dg < dv.dg OR (du.dg = dv.dg AND p.u < p.v)
              THEN p.u ELSE p.v END AS src,
         CASE WHEN du.dg < dv.dg OR (du.dg = dv.dg AND p.u < p.v)
              THEN p.v ELSE p.u END AS dst,
         CASE WHEN du.dg < dv.dg OR (du.dg = dv.dg AND p.u < p.v)
              THEN dv.dg ELSE du.dg END AS dst_deg
  FROM pairs p
  JOIN deg du ON du.node = p.u
  JOIN deg dv ON dv.node = p.v
)"""
    return f"""{head}, tri AS (
  SELECT o1.src AS s, o1.dst AS a, o2.dst AS b
  FROM oriented o1
  JOIN oriented o2
    ON o1.src = o2.src
   AND (o1.dst_deg < o2.dst_deg
        OR (o1.dst_deg = o2.dst_deg AND o1.dst < o2.dst))
  JOIN oriented o3 ON o3.src = o1.dst AND o3.dst = o2.dst
)"""


def _tri_node_rows(d: str) -> str:
    """Explode each triangle to its three corner nodes, per dialect."""
    return (
        "SELECT t.node FROM tri LATERAL VIEW explode(array(s, a, b)) t AS node"
        if d == "spark"
        else "SELECT unnest([s, a, b]) AS node FROM tri"
    )


def _triangle_sql(d: str, pairs_src: str | None = None, or_src: str | None = None) -> str:
    """Triangle counting over the co-purchase graph (parts appearing in the
    same order). Edges are oriented low→high by the total order (degree,
    node) — the classic wedge-bounding trick that caps enumeration at
    O(E^1.5) even on skewed degree distributions, where naive node-iterator
    wedges blow up quadratically on hub nodes. On the Spark side the pairs
    and oriented tables are pre-materialized views (CTE inlining would
    recompute the distinct self-join per reference)."""
    return f"""{_triangle_prologue(d, pairs_src, or_src)}
SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM ({_tri_node_rows(d)}) x
GROUP BY node
ORDER BY n_triangles DESC, node
LIMIT {_TRI_TOP}
"""


@query(
    "graph_triangle_count",
    oracle=_triangle_sql("duck"),
    tags=("graph", "join"),
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle membership over the co-purchase graph, top 20.
    Every triangle (s ≺ a ≺ b in degree order) is found exactly once as a
    wedge at its lowest-degree corner closed by the oriented (a, b) edge —
    three equi-joins, no inequality-only join, no cartesian. Each triangle
    then credits all three corners via a 3-way explode before the final
    count. The distinct edge list and its degree-oriented form are
    persisted once and reused by all three join legs."""
    views(spark, sf_dir, "lineitem")
    pairs = spark.sql(
        f"""SELECT DISTINCT l1.l_partkey AS u, l2.l_partkey AS v
FROM {tbl('lineitem', 'spark')} l1 JOIN {tbl('lineitem', 'spark')} l2
  ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey"""
    ).persist()
    pairs.createOrReplaceTempView("slsp_tri_pairs")
    deg = (
        pairs.selectExpr("u AS node")
        .unionAll(pairs.selectExpr("v AS node"))
        .groupBy("node")
        .agg(F.count("*").alias("dg"))
    )
    deg.createOrReplaceTempView("slsp_tri_deg")
    oriented = spark.sql(
        """SELECT CASE WHEN du.dg < dv.dg OR (du.dg = dv.dg AND p.u < p.v)
              THEN p.u ELSE p.v END AS src,
         CASE WHEN du.dg < dv.dg OR (du.dg = dv.dg AND p.u < p.v)
              THEN p.v ELSE p.u END AS dst,
         CASE WHEN du.dg < dv.dg OR (du.dg = dv.dg AND p.u < p.v)
              THEN dv.dg ELSE du.dg END AS dst_deg
FROM slsp_tri_pairs p
JOIN slsp_tri_deg du ON du.node = p.u
JOIN slsp_tri_deg dv ON dv.node = p.v"""
    ).persist()
    oriented.createOrReplaceTempView("slsp_tri_oriented")
    return spark.sql(
        _triangle_sql("spark", pairs_src="slsp_tri_pairs", or_src="slsp_tri_oriented")
    )


# ---------------------------------------------------------------------------
# k-core peeling (fixed-k, bounded rounds).
# ---------------------------------------------------------------------------

_KCORE_ROUNDS = 3
_KCORE_Q = 0.1  # k = floor(10th-percentile initial degree)
_KCORE_TOP = 30


def _kcore_oracle() -> str:
    li = tbl("lineitem", "duck")
    sql = f"""
WITH pairs AS (
  SELECT DISTINCT l1.l_partkey AS u, l2.l_partkey AS v
  FROM {li} l1 JOIN {li} l2
    ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
), e0 AS (SELECT u AS s, v AS d FROM pairs UNION ALL SELECT v AS s, u AS d FROM pairs),
deg0 AS (SELECT s AS node, COUNT(*) AS dg FROM e0 GROUP BY s),
kt AS (SELECT CAST(floor(quantile_cont(dg, {_KCORE_Q})) AS BIGINT) AS kv FROM deg0)
"""
    prev = "e0"
    for r in range(1, _KCORE_ROUNDS + 1):
        sql += f""",
deg{r} AS (SELECT s AS node, COUNT(*) AS dg FROM {prev} GROUP BY s),
keep{r} AS (SELECT node FROM deg{r}, kt WHERE dg >= kt.kv),
e{r} AS (
  SELECT e.s, e.d FROM {prev} e
  JOIN keep{r} k1 ON e.s = k1.node JOIN keep{r} k2 ON e.d = k2.node
)"""
        prev = f"e{r}"
    sql += f"""
SELECT s AS node, CAST(COUNT(*) AS BIGINT) AS core_degree
FROM {prev} GROUP BY s
ORDER BY core_degree DESC, node
LIMIT {_KCORE_TOP}
"""
    return sql


@query("graph_kcore_peel", oracle=_kcore_oracle(), tags=("graph", "iterative"))
def graph_kcore_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded k-core peeling over the co-purchase graph: k is the floor of
    the 10th-percentile initial degree (Spark ``percentile`` and DuckDB
    ``quantile_cont`` share the interpolation definition), then three
    peel rounds drop nodes whose degree fell below k and their incident
    edges. The Spark side runs the loop as DataFrames with the edge set
    persisted per round (a CTE chain would recompute the distinct
    self-join 2^rounds times); survivors report their in-core degree.
    Per round: one degree aggregation + two semi-joins against the
    (shrinking, broadcastable) keep-list — never a rebuild of the base
    edge list."""
    t = views(spark, sf_dir, "lineitem")
    li = t["lineitem"]
    l2 = li.select(
        F.col("l_orderkey").alias("ok2"), F.col("l_partkey").alias("pk2")
    )
    pairs = (
        li.join(l2, (li.l_orderkey == l2.ok2) & (li.l_partkey < l2.pk2))
        .select(F.col("l_partkey").alias("u"), F.col("pk2").alias("v"))
        .distinct()
    )
    edges = pairs.selectExpr("u AS s", "v AS d").unionAll(
        pairs.selectExpr("v AS s", "u AS d")
    ).persist()
    deg0 = edges.groupBy("s").agg(F.count("*").alias("dg"))
    kv = int(
        deg0.selectExpr(
            f"CAST(floor(percentile(dg, {_KCORE_Q})) AS BIGINT) AS kv"
        ).first()["kv"]
    )  # one scalar to the driver — the fixed peel threshold
    cur = edges
    for _ in range(_KCORE_ROUNDS):
        keep = (
            cur.groupBy("s")
            .agg(F.count("*").alias("dg"))
            .filter(F.col("dg") >= kv)
            .select(F.col("s").alias("node"))
        )
        cur = (
            cur.join(keep, cur.s == keep.node, "left_semi")
            .join(keep.withColumnRenamed("node", "node2"), F.col("d") == F.col("node2"), "left_semi")
            .persist()
        )
    return (
        cur.groupBy("s")
        .agg(F.count("*").cast("bigint").alias("core_degree"))
        .select(F.col("s").alias("node"), "core_degree")
        .orderBy(F.desc("core_degree"), "node")
        .limit(_KCORE_TOP)
    )


# ---------------------------------------------------------------------------
# Multi-source BFS — frontier expansion over the purchase graph.
# ---------------------------------------------------------------------------

_BFS_DEPTH = 3
_BFS_SEED_MOD = 100


def _bfs_oracle() -> str:
    d = "duck"
    sql = f"""
WITH fwd AS (
  SELECT DISTINCT o.o_custkey AS src, l.l_suppkey + {_SUPP_OFFSET} AS dst
  FROM {tbl('orders', d)} o JOIN {tbl('lineitem', d)} l
    ON o.o_orderkey = l.l_orderkey
),
edges AS (
  SELECT src, dst FROM fwd UNION ALL SELECT dst AS src, src AS dst FROM fwd
),
nodes AS (SELECT DISTINCT src AS node FROM edges),
d0 AS (
  SELECT node, CAST(0 AS BIGINT) AS dist FROM nodes
  WHERE node % {_BFS_SEED_MOD} = 1
),
v0 AS (SELECT node, dist FROM d0)"""
    for i in range(1, _BFS_DEPTH + 1):
        sql += f""",
f{i} AS (
  SELECT DISTINCT e.dst AS node FROM edges e
  JOIN d{i - 1} ON e.src = d{i - 1}.node
),
d{i} AS (
  SELECT f.node, CAST({i} AS BIGINT) AS dist FROM f{i} f
  WHERE NOT EXISTS (SELECT 1 FROM v{i - 1} v WHERE v.node = f.node)
),
v{i} AS (
  SELECT node, dist FROM v{i - 1} UNION ALL SELECT node, dist FROM d{i}
)"""
    sql += f"""
SELECT node, dist FROM v{_BFS_DEPTH} ORDER BY dist, node
"""
    return sql


@query("graph_bfs_frontier", oracle=_bfs_oracle(), tags=("graph", "iterative"))
def graph_bfs_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS (depth 3) from seed nodes over the undirected
    purchase graph — min-hop distance labeling, the Pregel frontier
    pattern as DataFrame rounds. Each round is ONE shuffle: frontier ⋈
    edges, dedup, anti-join against the visited set; the edge list is
    persisted once and the visited set is localCheckpoint-ed per round
    so round N never replays rounds 1..N-1. The oracle is the same
    expansion unrolled level-by-level (exactly-min-hop by construction
    in both engines — a node enters at the first level that reaches
    it). Frontier sizes, not |V|, bound each round's work, which is why
    BFS over a 100 TB edge list stays feasible when the frontier is a
    small fraction of the graph."""
    t = views(spark, sf_dir, "orders", "lineitem")
    fwd = (
        t["orders"]
        .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey") + _SUPP_OFFSET).alias("dst"),
        )
        .distinct()
    )
    edges = fwd.unionAll(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).persist()
    visited = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .filter(F.col("node") % _BFS_SEED_MOD == 1)
        .withColumn("dist", F.lit(0).cast("bigint"))
    )
    frontier = visited.select("node")
    for depth in range(1, _BFS_DEPTH + 1):
        reached = (
            edges.join(frontier, edges.src == frontier.node)
            .select(edges.dst.alias("node"))
            .distinct()
        )
        fresh = reached.join(visited, "node", "left_anti").withColumn(
            "dist", F.lit(depth).cast("bigint")
        )
        visited = visited.unionAll(fresh).localCheckpoint(eager=False)
        frontier = fresh.select("node")
    return visited.orderBy("dist", "node")


# ---------------------------------------------------------------------------
# Label propagation — community detection by neighbor-majority vote.
# ---------------------------------------------------------------------------

_LPA_ROUNDS = 3
_LPA_TOP = 40


def _lpa_round_sql(prev: str, i: int) -> str:
    """One synchronized LPA round: each node takes the most frequent label
    among its neighbors (ties -> smallest label). Deterministic by the
    (count DESC, label ASC) total order."""
    return f"""
votes{i} AS (
  SELECT e.dst AS node, p.label, COUNT(*) AS n
  FROM edges e JOIN {prev} p ON e.src = p.node
  GROUP BY e.dst, p.label
),
l{i} AS (
  SELECT node, label FROM (
    SELECT node, label,
           ROW_NUMBER() OVER (PARTITION BY node
                              ORDER BY n DESC, label) AS rnk
    FROM votes{i}
  ) r WHERE rnk = 1
)"""


def _lpa_oracle() -> str:
    d = "duck"
    sql = f"""
WITH fwd AS (
  SELECT DISTINCT o.o_custkey AS src, l.l_suppkey + {_SUPP_OFFSET} AS dst
  FROM {tbl('orders', d)} o JOIN {tbl('lineitem', d)} l
    ON o.o_orderkey = l.l_orderkey
),
edges AS (
  SELECT src, dst FROM fwd UNION ALL SELECT dst AS src, src AS dst FROM fwd
),
l0 AS (SELECT DISTINCT src AS node, src AS label FROM edges)"""
    prev = "l0"
    for i in range(1, _LPA_ROUNDS + 1):
        sql += "," + _lpa_round_sql(prev, i)
        prev = f"l{i}"
    sql += f"""
SELECT CAST(label AS BIGINT) AS community,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       CAST(MIN(node) AS BIGINT) AS min_node,
       CAST(MAX(node) AS BIGINT) AS max_node
FROM {prev}
GROUP BY label
ORDER BY n_members DESC, community
LIMIT {_LPA_TOP}
"""
    return sql


@query("graph_label_propagation", oracle=_lpa_oracle(), tags=("graph", "iterative"))
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synchronous label propagation (3 rounds) — community detection by
    neighbor-majority vote with a deterministic (count DESC, label ASC)
    tie-break, so the result is engine-independent (classic LPA's random
    tie-breaking is deliberately replaced). Each round is two shuffles
    (vote count on (node, label), then the per-node argmax window on the
    same partitioning); labels are localCheckpoint-ed per round. Unlike
    min-label propagation (connected components) the majority vote finds
    dense substructures, not just reachability."""
    t = views(spark, sf_dir, "orders", "lineitem")
    fwd = (
        t["orders"]
        .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey") + _SUPP_OFFSET).alias("dst"),
        )
        .distinct()
    )
    edges = fwd.unionAll(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).persist()
    labels = edges.select(F.col("src").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("node").orderBy(F.desc("n"), "label")
    for _ in range(_LPA_ROUNDS):
        votes = (
            edges.join(labels, edges.src == labels.node)
            .select(edges.dst.alias("node"), "label")
            .groupBy("node", "label")
            .agg(F.count("*").alias("n"))
        )
        labels = (
            votes.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") == 1)
            .select("node", "label")
            .localCheckpoint(eager=False)
        )
    return (
        labels.groupBy("label")
        .agg(
            F.count("*").cast("bigint").alias("n_members"),
            F.min("node").cast("bigint").alias("min_node"),
            F.max("node").cast("bigint").alias("max_node"),
        )
        .select(
            F.col("label").cast("bigint").alias("community"),
            "n_members",
            "min_node",
            "max_node",
        )
        .orderBy(F.desc("n_members"), "community")
        .limit(_LPA_TOP)
    )
