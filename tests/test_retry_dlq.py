"""Record-level retry / poison-message semantics (T3): 3 receives then DLQ,
transient failures recover, nothing lost, nothing double-processed."""

from __future__ import annotations

from pyspark.sql import functions as F

from .conftest import SF_DIR


def test_retry_then_dlq(spark, tmp_path):
    from aws_localstack_stream_processing_spark.streaming.retry import RetryingProcessor

    ev = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("event_id", "event_type", "value")
        .withColumn("k", F.col("event_id").cast("string"))
    )

    # poison: always fails; transient: fails on the first receive only
    def attempt(df):
        poison = F.col("event_id") % 97 == 0
        transient = (F.col("event_id") % 89 == 0) & (F.col("receive_count") == 1)
        return df.withColumn("ok", ~(poison | transient))

    proc = RetryingProcessor(str(tmp_path), "k", attempt, max_receives=3)
    half1 = ev.filter(F.col("event_id") % 2 == 0)
    half2 = ev.filter(F.col("event_id") % 2 == 1)
    proc.process_batch(half1, 0)
    proc.process_batch(half2, 1)
    proc.drain(spark)

    ok = spark.read.parquet(proc.ok_path)
    dlq = spark.read.parquet(proc.dlq_path)

    n = ev.count()
    n_poison = ev.filter(F.col("event_id") % 97 == 0).count()
    # completeness: ok + dlq exactly partition the input
    assert ok.count() + dlq.count() == n
    assert dlq.count() == n_poison
    # poison records burned all receives; every DLQ row is a poison id
    assert dlq.agg(F.min("receive_count")).collect()[0][0] == 3
    assert dlq.filter(F.col("event_id") % 97 != 0).count() == 0
    # transient records recovered on redelivery (receive_count == 2)
    transients = ok.filter(
        (F.col("event_id") % 89 == 0) & (F.col("event_id") % 97 != 0)
    )
    assert transients.count() == ev.filter(
        (F.col("event_id") % 89 == 0) & (F.col("event_id") % 97 != 0)
    ).count()
    assert transients.agg(F.max("receive_count")).collect()[0][0] == 2
    # exactly-once: no key processed into ok twice
    assert ok.select("k").distinct().count() == ok.count()
