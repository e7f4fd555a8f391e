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
