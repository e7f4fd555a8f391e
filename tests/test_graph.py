"""Convergence-bound proof for the pointer-doubling connected components.

Plain min-label propagation needs O(diameter) rounds — a 256-node path
would take ~256 joins. With the jump step (comp = comp[comp], the
large-star/small-star contraction) the same path must converge in
O(log2(diameter)) rounds. The operator exposes no round counter, so the
test bounds rounds via max_iter: it must SUCCEED with a logarithmic
max_iter and produce the exact component labeling.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from .conftest import SF_DIR

from aws_localstack_stream_processing_spark.operators.graph import (
    connected_components,
)


def _path_edges(spark, n: int, offset: int = 0):
    return spark.range(n - 1).select(
        (F.col("id") + offset).alias("src"),
        (F.col("id") + offset + 1).alias("dst"),
    )


def test_long_path_converges_in_log_rounds(spark):
    """A 256-node path (diameter 255): hooking alone would need ~255
    rounds; hook+jump must finish within ceil(log2(255)) + 3 = 11."""
    n = 256
    budget = math.ceil(math.log2(n - 1)) + 3
    comp = connected_components(_path_edges(spark, n), max_iter=budget)
    rows = {r.node: r.comp for r in comp.collect()}
    assert len(rows) == n
    assert set(rows.values()) == {0}, "path did not fully contract in budget"


def test_two_components_exact_labels(spark):
    """Two disjoint paths → two components labeled by their min node."""
    edges = _path_edges(spark, 64, offset=0).unionByName(
        _path_edges(spark, 64, offset=1000)
    )
    comp = connected_components(edges, max_iter=12)
    rows = {r.node: r.comp for r in comp.collect()}
    assert all(c == 0 for node, c in rows.items() if node < 64)
    assert all(c == 1000 for node, c in rows.items() if node >= 1000)


def test_pagerank_no_cartesian_and_mass_bound(spark):
    """PageRank's per-iteration join must stay an equi-join (no cartesian /
    nested-loop), and total rank mass stays within the documented
    truncation loss of 1.0 (<= nodes * iters micro-units lost)."""
    from aws_localstack_stream_processing_spark.plans import all_queries
    from aws_localstack_stream_processing_spark.plans.graph_ops import _SCALE

    df = all_queries()["graph_pagerank"].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().sparkPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    top = df.collect()
    assert len(top) > 0
    # every returned rank is positive and below total mass
    for r in top:
        assert 0 < r.rank_u < _SCALE


def test_triangle_count_equi_joins_only(spark):
    """Triangle enumeration must be pure equi-joins on src/dst keys — the
    degree orientation exists precisely to avoid inequality-only joins."""
    from aws_localstack_stream_processing_spark.plans import all_queries

    df = all_queries()["graph_triangle_count"].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().sparkPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
