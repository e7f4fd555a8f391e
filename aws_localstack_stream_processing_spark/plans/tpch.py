"""Standard OLAP coverage (TPC-H-style) — the general query surface Catalyst
provides built-in (SURVEY §2.3-§2.5: full join family, multi-way joins,
grouped aggregates, top-k). Constants adapted to the driver's synthetic data
ranges (shipdate 1995-2001).

All money aggregates use exact decimal addends (order-independent) and emit
DOUBLE, so results are identical under any partitioning / AQE re-plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .dialect import dec_avg, dec_sum, tbl, ts_str, views
from .registry import query


def _q1_sql(d: str) -> str:
    return f"""
SELECT l_returnflag, l_linestatus,
       {dec_sum('l_quantity')} AS sum_qty,
       {dec_sum('l_extendedprice')} AS sum_base_price,
       {dec_sum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
       {dec_sum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
       {dec_avg('l_quantity')} AS avg_qty,
       {dec_avg('l_extendedprice')} AS avg_price,
       {dec_avg('l_discount')} AS avg_disc,
       CAST(COUNT(*) AS BIGINT) AS count_order
FROM {tbl('lineitem', d)}
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@query("tpch_q1_pricing_summary", oracle=_q1_sql("duck"), tags=("sql", "agg"))
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary: scan-filter-aggregate with 8 aggregates.
    The filter pushes to the parquet scan; the agg is partial+final hash
    aggregate — the canonical 100 TB-friendly shape."""
    views(spark, sf_dir, "lineitem")
    return spark.sql(_q1_sql("spark"))


def _q3_sql(d: str) -> str:
    # Order by the exact DECIMAL revenue (order-independent), cast on output.
    return f"""
SELECT l_orderkey,
       CAST(revenue_dec AS DOUBLE) AS revenue,
       orderdate, o_orderpriority
FROM (
  SELECT l.l_orderkey,
         SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,6))) AS revenue_dec,
         {ts_str('o.o_orderdate', d)} AS orderdate,
         o.o_orderpriority
  FROM {tbl('customer', d)} c
  JOIN {tbl('orders', d)} o ON c.c_custkey = o.o_custkey
  JOIN {tbl('lineitem', d)} l ON l.l_orderkey = o.o_orderkey
  WHERE c.c_mktsegment = 'BUILDING'
    AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
    AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
  GROUP BY l.l_orderkey, {ts_str('o.o_orderdate', d)}, o.o_orderpriority
) t
ORDER BY revenue_dec DESC, l_orderkey
LIMIT 10
"""


@query("tpch_q3_shipping_priority", oracle=_q3_sql("duck"), tags=("sql", "join", "topk"))
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: 3-way join + grouped agg + top-10. customer is the small
    side (broadcast); lineitem⋈orders shuffles on the join key."""
    views(spark, sf_dir, "customer", "orders", "lineitem")
    return spark.sql(_q3_sql("spark"))


def _q5_sql(d: str) -> str:
    return f"""
SELECT n.n_name,
       {dec_sum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
FROM {tbl('customer', d)} c
JOIN {tbl('orders', d)} o ON c.c_custkey = o.o_custkey
JOIN {tbl('lineitem', d)} l ON l.l_orderkey = o.o_orderkey
JOIN {tbl('supplier', d)} s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN {tbl('nation', d)} n ON s.s_nationkey = n.n_nationkey
JOIN {tbl('region', d)} r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n.n_name
"""


@query("tpch_q5_local_supplier_volume", oracle=_q5_sql("duck"), tags=("sql", "join"))
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: 6-way join with a correlated equi-predicate
    (c_nationkey = s_nationkey). region/nation/supplier broadcast; Catalyst
    reorders the join tree."""
    views(spark, sf_dir, "customer", "orders", "lineitem", "supplier", "nation", "region")
    return spark.sql(_q5_sql("spark"))


def _q6_sql(d: str) -> str:
    return f"""
SELECT {dec_sum('l_extendedprice * l_discount')} AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM {tbl('lineitem', d)}
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@query("tpch_q6_forecast_revenue", oracle=_q6_sql("duck"), tags=("sql", "agg"))
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan-filter-aggregate; every predicate pushes to the
    parquet reader (min/max row-group skipping at scale)."""
    views(spark, sf_dir, "lineitem")
    return spark.sql(_q6_sql("spark"))


def _q10_sql(d: str) -> str:
    return f"""
SELECT c.c_custkey, c.c_name,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
       c.c_acctbal, n.n_name
FROM {tbl('customer', d)} c
JOIN {tbl('orders', d)} o ON c.c_custkey = o.o_custkey
JOIN {tbl('lineitem', d)} l ON l.l_orderkey = o.o_orderkey
JOIN {tbl('nation', d)} n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,6))) DESC, c.c_custkey
LIMIT 20
"""


@query("tpch_q10_returned_items", oracle=_q10_sql("duck"), tags=("sql", "join", "topk"))
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: returned-item revenue ranking (join + agg + top-20,
    deterministic tie-break on the exact decimal revenue)."""
    views(spark, sf_dir, "customer", "orders", "lineitem", "nation")
    return spark.sql(_q10_sql("spark"))
