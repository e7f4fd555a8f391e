"""Executed-plan fingerprints: the shape of a query plan as a small
count vector (VERDICT r7 #5).

The round-7 lesson (PLANS.md) is that wall-clock on this host is only
trustworthy inside verified-quiet windows, while PLAN SHAPE is always
trustworthy: a regression that adds an exchange or downgrades a
broadcast join to a sort-merge join shows up as a node-count delta
regardless of VM noise. So every registered batch query's fingerprint —
counts of the scale-relevant physical nodes (exchanges, join
strategies, windows, aggregates, Python-eval nodes, scans) — is pinned
in the checked-in ``PLANFP.json``; ``tests/test_plan_fingerprints.py``
diffs live plans against it and fails on ANY drift. Intentional plan
changes regenerate the file in the same commit
(``SPARK_GRAFT_REGEN_PLANFP=1 python -m pytest
tests/test_plan_fingerprints.py``), so a reviewer sees the plan-shape
diff next to the code that caused it.
"""

from __future__ import annotations

import re

# node-name prefixes worth pinning, normalized (Exec suffix dropped by the
# tokenizer; AQE wrapper and codegen markers are stripped, not counted).
# Each entry maps a fingerprint key to the exact node-name prefixes that
# count toward it — prefix match so parameterized forms group together.
_NODE_KEYS: dict[str, tuple[str, ...]] = {
    "exchange_hash": ("Exchange hashpartitioning",),
    "exchange_range": ("Exchange rangepartitioning",),
    "exchange_single": ("Exchange SinglePartition",),
    "broadcast_exchange": ("BroadcastExchange",),
    "broadcast_hash_join": ("BroadcastHashJoin",),
    "sort_merge_join": ("SortMergeJoin",),
    "shuffled_hash_join": ("ShuffledHashJoin",),
    "broadcast_nl_join": ("BroadcastNestedLoopJoin",),
    "cartesian": ("CartesianProduct",),
    "window": ("Window ", "Window["),
    "window_group_limit": ("WindowGroupLimit",),
    "hash_aggregate": ("HashAggregate",),
    "object_hash_aggregate": ("ObjectHashAggregate",),
    "sort_aggregate": ("SortAggregate",),
    "take_ordered": ("TakeOrderedAndProject",),
    "scan_parquet": ("Scan parquet", "FileScan parquet"),
    "scan_memory": ("InMemoryTableScan",),
    "python_arrow_eval": ("ArrowEvalPython",),
    "python_row_eval": ("BatchEvalPython",),
    "pandas_group_map": ("FlatMapGroupsInPandas",),
    "pandas_map": ("MapInPandas", "PythonMapInArrow", "MapInArrow"),
    "generate": ("Generate ",),
    "expand": ("Expand",),
    # streaming-only nodes (zero in batch plans): pin the stateful-operator
    # inventory and the watermark assignment of every stream_* query —
    # an extra StateStoreSave or a lost EventTimeWatermark is a semantics
    # change the memory-sink result may not reveal (r9, STREAMFP.json)
    "state_store_save": ("StateStoreSave",),
    "state_store_restore": ("StateStoreRestore",),
    "streaming_dedup": ("StreamingDeduplicate",),
    "streaming_join": ("StreamingSymmetricHashJoin",),
    "event_time_watermark": ("EventTimeWatermark",),
    "pandas_state": ("FlatMapGroupsInPandasWithState",),
    "session_window": ("UpdatingSessionsExec", "MergingSessions"),
}

# strips tree-drawing prefixes and the whole-stage-codegen "*(3) " marker
_LINE_PREFIX = re.compile(r"^[\s:+\-]*(\*\(\d+\)\s*)?")


def fingerprint(executed_plan: str) -> dict[str, int]:
    """Count scale-relevant physical nodes in a plan's ``toString()``.

    Only non-zero counts are returned, so fingerprints diff cleanly and
    the checked-in JSON stays readable.

    Cached-plan dedupe (r9): ``toString()`` reprints an InMemoryRelation's
    *definition* subtree under every InMemoryTableScan that references it,
    so a plan with one persisted projection read 13 times used to count
    13 parquet scans — physically it scans once (cache materialization)
    and the other 12 reads are memory hits. The fingerprint now counts
    each DISTINCT cached subtree once (identity = subtree text with
    attribute ids stripped) and still counts every InMemoryTableScan, so
    it reflects execution shape: one materialization plus N cache reads."""
    lines = executed_plan.splitlines()
    depth = [re.match(r"^[\s:+\-]*", ln).end() for ln in lines]
    skip = [False] * len(lines)
    seen_cached: set[str] = set()
    for i, raw in enumerate(lines):
        if skip[i]:
            continue
        if _LINE_PREFIX.sub("", raw).startswith("InMemoryRelation"):
            j = i + 1
            while j < len(lines) and depth[j] > depth[i]:
                j += 1
            # identity must be position-independent: strip attribute ids
            # AND the tree-drawing prefix (which encodes where in the
            # outer plan the reference sits), keeping relative depth
            norm = "\n".join(
                f"{depth[k] - depth[i]}|"
                + re.sub(r"#\d+", "#", _LINE_PREFIX.sub("", lines[k]))
                for k in range(i, j)
            )
            if norm in seen_cached:
                for k in range(i, j):
                    skip[k] = True
            else:
                seen_cached.add(norm)
    counts: dict[str, int] = {}
    for i, raw in enumerate(lines):
        if skip[i]:
            continue
        line = _LINE_PREFIX.sub("", raw)
        for key, prefixes in _NODE_KEYS.items():
            if line.startswith(prefixes):
                counts[key] = counts.get(key, 0) + 1
                break
    return counts


# physical Exec class → fingerprint key for the JVM tree walk below
# (ShuffleExchangeExec is keyed by its output partitioning, handled inline)
_EXEC_KEYS: dict[str, str] = {
    "BroadcastHashJoinExec": "broadcast_hash_join",
    "SortMergeJoinExec": "sort_merge_join",
    "ShuffledHashJoinExec": "shuffled_hash_join",
    "BroadcastNestedLoopJoinExec": "broadcast_nl_join",
    "CartesianProductExec": "cartesian",
    "BroadcastExchangeExec": "broadcast_exchange",
    "WindowExec": "window",
    "WindowGroupLimitExec": "window_group_limit",
    "HashAggregateExec": "hash_aggregate",
    "ObjectHashAggregateExec": "object_hash_aggregate",
    "SortAggregateExec": "sort_aggregate",
    "TakeOrderedAndProjectExec": "take_ordered",
    "FileSourceScanExec": "scan_parquet",
    "InMemoryTableScanExec": "scan_memory",
    "ArrowEvalPythonExec": "python_arrow_eval",
    "BatchEvalPythonExec": "python_row_eval",
    "FlatMapGroupsInPandasExec": "pandas_group_map",
    "MapInPandasExec": "pandas_map",
    "PythonMapInArrowExec": "pandas_map",
    "GenerateExec": "generate",
    "ExpandExec": "expand",
}


def aqe_final_fingerprint(df) -> dict[str, int]:
    """Fingerprint of the runtime-FINAL adaptive plan (VERDICT r9 #7).

    Call AFTER the DataFrame's own query execution ran (``collect()`` —
    a write wraps the plan in a new QueryExecution and leaves this one
    un-finalized). Walks the JVM plan TREE instead of parsing
    ``toString()``: the executed-plan string reprints every
    ``InMemoryRelation``'s definition at every read site with
    indentation that breaks subtree slicing (measured on
    ``graph_kcore_peel``: 24,965 lines, 519 nested adaptive plans, 9
    physical joins printed 1,640 times), while the tree has exactly one
    node per physical operator.

    Walk rules: ``AdaptiveSparkPlanExec`` → its final plan; QueryStage
    wrappers → their materialized plan; ``InMemoryTableScanExec``
    counts as a cache read but its relation's DEFINITION is not entered
    (the static fingerprint owns materialization shape);
    ``Reused[Exchange|Subquery]Exec`` = no second execution, skipped;
    every node's executed subquery PLANS (``subqueries()`` — scalar/IN
    subquery physical plans, each its own adaptive execution) are
    walked too, so a query whose joins live entirely in scalar
    subqueries still pins its runtime strategies. The result is the
    operator inventory of the plan that actually ran, so a runtime
    broadcast↔sort-merge flip is a count delta here even when the
    static plan is unchanged."""
    counts: dict[str, int] = {}
    stack = [df._jdf.queryExecution().executedPlan()]
    while stack:
        node = stack.pop()
        cls = node.getClass().getSimpleName()
        if cls == "AdaptiveSparkPlanExec":
            stack.append(node.executedPlan())
            continue
        if cls.endswith("QueryStageExec"):
            stack.append(node.plan())
            continue
        if cls in ("ReusedExchangeExec", "ReusedSubqueryExec"):
            continue
        if cls == "ShuffleExchangeExec":
            part = node.outputPartitioning().getClass().getSimpleName()
            if part.startswith("HashPartitioning"):
                key = "exchange_hash"
            elif part.startswith("RangePartitioning"):
                key = "exchange_range"
            else:
                key = "exchange_single"
            counts[key] = counts.get(key, 0) + 1
        elif cls in _EXEC_KEYS:
            key = _EXEC_KEYS[cls]
            counts[key] = counts.get(key, 0) + 1
            if cls == "InMemoryTableScanExec":
                continue  # never enter the cached relation's definition
        children = node.children()
        for i in range(children.size()):
            stack.append(children.apply(i))
        subqueries = node.subqueries()
        for i in range(subqueries.size()):
            stack.append(subqueries.apply(i))
    return counts
