"""The verification driver's contract surface (__spark_entry__.py):
entry() must be idempotent with a stable schema, queries()/oracle_sql()
must stay key-consistent, and the self-balancing registry order must be
deterministic for a fixed set of CORRECTNESS files."""

from __future__ import annotations

import importlib


def _entry_module():
    return importlib.import_module("__spark_entry__")


def test_entry_runs_twice_stable_schema(spark):
    mod = _entry_module()
    df1 = mod.entry(spark)
    df2 = mod.entry(spark)
    assert df1.schema == df2.schema
    n1, n2 = df1.count(), df2.count()
    assert n1 == n2 >= 0


def test_queries_and_oracles_key_consistent(spark):
    mod = _entry_module()
    qs = mod.queries()
    oracles = mod.oracle_sql()
    assert set(oracles) <= set(qs)
    # every oracle is a non-empty SELECT-producing SQL string
    for name, sql in oracles.items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name
    # the documented no-oracle set is exactly the approx sketches
    assert set(qs) - set(oracles) == {"sql_approx_distinct", "sql_approx_percentile"}


def test_registry_order_deterministic():
    from aws_localstack_stream_processing_spark.plans.registry import all_queries

    assert list(all_queries()) == list(all_queries())
