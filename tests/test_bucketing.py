"""Bucketed co-located join: pre-bucketing both sides on the join key must
eliminate the shuffle (no Exchange in the physical plan) — the layout
strategy for repeated large-large joins at 100 TB."""

from __future__ import annotations

import pytest

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    # managed tables land in the session's warehouse dir; DROP TABLE at
    # teardown removes the files
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    for name, df, key in [
        ("b_orders", orders, "o_orderkey"),
        ("b_lineitem", lineitem, "l_orderkey"),
    ]:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.mode("overwrite")
            .bucketBy(8, key)
            .sortBy(key)
            .format("parquet")
            .saveAsTable(name)
        )
    yield spark
    for name in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_join_has_no_shuffle(bucketed):
    spark = bucketed
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", None)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.sql(
            """
            SELECT o.o_orderkey, COUNT(*) AS n
            FROM b_orders o JOIN b_lineitem l ON o.o_orderkey = l.l_orderkey
            GROUP BY o.o_orderkey
            """
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        # and it still returns the right answer
        li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        od = spark.read.parquet(f"{SF_DIR}/orders.parquet")
        expected = li.join(od, li.l_orderkey == od.o_orderkey).count()
        assert j.selectExpr("sum(n)").collect()[0][0] == expected
    finally:
        if old is not None:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
