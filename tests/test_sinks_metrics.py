"""Keyed-sink convergence (put-if-absent without checkpoint help) and the
StreamingQueryListener metrics pipeline."""

from __future__ import annotations

from pyspark.sql import functions as F

from .conftest import SF_DIR


def test_keyed_sink_converges_without_checkpoint(spark, tmp_path):
    """Re-delivering overlapping batches — with NO shared checkpoint —
    leaves exactly one row per key (DynamoDB-put convergence, S8/T2)."""
    from aws_localstack_stream_processing_spark.streaming.sinks import KeyedParquetSink

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    keyed = ev.select(
        F.sha2(F.concat_ws("|", "event_id", "event_type"), 256).alias("k"),
        "event_id",
        "value",
    )
    sink = KeyedParquetSink(str(tmp_path / "kv"), "k")
    first_half = keyed.filter(F.col("event_id") % 2 == 0)
    overlap = keyed.filter(F.col("event_id") % 3 == 0)  # overlaps both halves
    sink.upsert_batch(first_half, 0)
    sink.upsert_batch(overlap, 1)
    sink.upsert_batch(keyed, 2)  # full redelivery
    sink.upsert_batch(keyed, 3)  # and again
    out = sink.read(spark)
    assert out.count() == keyed.count()
    assert out.select("k").distinct().count() == keyed.count()


def test_streaming_metrics_listener(spark):
    """Per-batch telemetry lands in the metrics table and the reference's
    minute-rollup shape applies to it."""
    from aws_localstack_stream_processing_spark.streaming.metrics import (
        MetricsListener,
        metrics_df,
    )
    from aws_localstack_stream_processing_spark.streaming.source import events_stream

    listener = MetricsListener()
    spark.streams.addListener(listener)
    try:
        q = (
            events_stream(spark, SF_DIR)
            .groupBy("event_type")
            .count()
            .writeStream.format("memory")
            .queryName("metrics_probe")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # listener delivery is asynchronous; give the bus a moment
        import time

        for _ in range(20):
            if listener.rows:
                break
            time.sleep(0.25)
    finally:
        spark.streams.removeListener(listener)

    assert listener.rows, "no progress events captured"
    mdf = metrics_df(spark, listener)
    total_rows = mdf.agg(F.sum("num_input_rows")).collect()[0][0]
    n_events = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    assert total_rows == n_events
    # the reference's A1 rollup shape applies directly to engine telemetry
    rollup = mdf.groupBy("query_id").agg(
        F.sum("num_input_rows").alias("rows"),
        F.avg("process_ms").alias("avg_ms"),
    )
    assert rollup.count() >= 1
