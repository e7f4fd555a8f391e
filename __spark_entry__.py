"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship E2 signing pipeline on sf0.001;
``queries()`` exposes every implemented operator from SURVEY.md §2 (plus the
LLM-pipeline extensions); ``oracle_sql()`` gives the DuckDB-equivalent SQL
for each SQL-expressible query (omitted for genuinely non-SQL-expressible
ops, which get the weaker rows-only check).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from aws_localstack_stream_processing_spark.plans import all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the E2 signing pipeline (orders → transactions →
    content-hash dedup → key assignment → vectorized signing) on sf0.001."""
    qs = all_queries()
    return qs["ref_sign_pipeline"].fn(spark, "/root/testdata/sf0.001")


def _scoped(fn: Callable[[SparkSession, str], DataFrame]):
    """Per-query cache scope: drop whatever the previous query persisted
    before building the next plan, so a long sweep over the whole registry
    doesn't accrue executor storage (each query's own persist() calls still
    serve it within its lifetime)."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        spark.catalog.clearCache()
        return fn(spark, sf_dir)

    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _scoped(qd.fn) for name, qd in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {name: qd.oracle for name, qd in all_queries().items() if qd.oracle}
