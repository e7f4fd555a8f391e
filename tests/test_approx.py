"""Accuracy bounds for sketch-based (non-oracle) operators: approximate
answers must land within the sketch's published error bound of the exact
answer — the correctness check the DuckDB hash-compare can't express."""

from __future__ import annotations

from .conftest import SF_DIR


def test_approx_distinct_within_bound(spark):
    from aws_localstack_stream_processing_spark.plans import all_queries

    qd = all_queries()["sql_approx_distinct"]
    approx = {
        r.event_type: (r.approx_users, r.approx_events)
        for r in qd.fn(spark, SF_DIR).collect()
    }
    exact = {
        r.event_type: (r.nu, r.ne)
        for r in spark.sql(
            """
            SELECT event_type, COUNT(DISTINCT user_id) AS nu,
                   COUNT(DISTINCT event_id) AS ne
            FROM slsp_events GROUP BY event_type
            """
        ).collect()
    }
    assert set(approx) == set(exact)
    for et, (au, ae) in approx.items():
        eu, ee = exact[et]
        # HLL++ default rsd is 5%; allow 3 sigma
        assert abs(au - eu) <= max(3, 0.15 * eu), (et, au, eu)
        assert abs(ae - ee) <= max(3, 0.15 * ee), (et, ae, ee)


def test_approx_percentile_rank_error_bound(spark):
    """approx_percentile(accuracy=10000) guarantees rank error <= n/10000;
    verify the returned value's true rank is within that bound of the
    target rank for every group and quantile."""
    from aws_localstack_stream_processing_spark.plans import all_queries

    qd = all_queries()["sql_approx_percentile"]
    rows = qd.fn(spark, SF_DIR).collect()
    exact = {
        r.o_orderpriority: r
        for r in spark.sql(
            """
            SELECT o_orderpriority,
                   sort_array(collect_list(o_totalprice)) AS vals
            FROM slsp_orders GROUP BY o_orderpriority
            """
        ).collect()
    }
    for r in rows:
        vals = exact[r.o_orderpriority].vals
        n = len(vals)
        tol = max(1.0, n / 10000)
        for q, v in ((0.5, r.p50), (0.9, r.p90), (0.99, r.p99)):
            # rank of the returned value in the exact sorted list
            lo = sum(1 for x in vals if x < v)
            hi = sum(1 for x in vals if x <= v)
            target = q * (n - 1)
            assert lo - tol <= target <= hi + tol, (
                r.o_orderpriority, q, v, lo, hi, target, n
            )
