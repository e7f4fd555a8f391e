"""LiveCache retirement semantics (r13, OPTIMIZATION_r13.md).

``DataFrame.unpersist`` uncaches by plan match, not by object identity —
and for WithCTE plans the uncache matcher normalizes CTE ids while the
substitution path does not, so retiring a stale tracked entry built from
the same SQL over the same data silently uncached the LIVE call's entry
too (a ``sameResult`` guard reads false on the renumbered ids and cannot
see the collision). From a query's third call in one session the
persisted diamond silently double-scanned again. The guard therefore
keys retirement on the caller-supplied input identity (sf_dir at the
query sites): a stale entry is released only when its key matches no
live entry's.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_localstack_stream_processing_spark.plans.cachelife import LiveCache


def _frame(spark, n):
    return spark.range(n).withColumn("v", F.col("id") * 2)


def test_same_key_retirement_keeps_live_entry_cached(spark):
    lc = LiveCache(keep=2)
    frames = []
    for _ in range(3):
        df = _frame(spark, 10).persist()
        lc.track(df, key="sfX")
        frames.append(df)
    # the third call retired the first; same input key => the retirement
    # must NOT unpersist (same-plan unpersist would uncache the live
    # entry too — the pre-fix behavior)
    assert frames[2].storageLevel.useMemory or frames[2].storageLevel.useDisk
    assert frames[0].storageLevel.useMemory or frames[0].storageLevel.useDisk
    assert frames[2].count() == 10
    lc.clear()


def test_distinct_key_retirement_still_unpersists(spark):
    lc = LiveCache(keep=1)
    a = _frame(spark, 11).persist()
    a.count()  # materialize so the uncache below is observable
    lc.track(a, key="sfA")
    b = _frame(spark, 12).persist()
    lc.track(b, key="sfB")  # retires a: different key => released
    assert not (a.storageLevel.useMemory or a.storageLevel.useDisk)
    assert b.storageLevel.useMemory or b.storageLevel.useDisk
    lc.clear()
    assert not (b.storageLevel.useMemory or b.storageLevel.useDisk)


def test_order_independent_fingerprint_after_repeated_calls(spark):
    """The regression as observed: repeated calls of a LiveCache-managed
    query followed by clearCache + a fresh call must still plan its
    persisted diamond as InMemoryTableScan reads (pre-fix the retirement
    uncached the fresh entry and the plan fell back to parquet scans)."""
    from aws_localstack_stream_processing_spark.plans import all_queries

    from .conftest import SF_DIR

    fn = all_queries()["profile_mutual_information"].fn
    for _ in range(3):
        fn(spark, SF_DIR).collect()
    spark.catalog.clearCache()
    df = fn(spark, SF_DIR)
    txt = spark._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "InMemoryTableScan" in txt
    spark.catalog.clearCache()
