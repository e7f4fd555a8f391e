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


def test_keyed_sink_never_broadcasts_the_store(spark, tmp_path):
    """r10 plan audit: the put-if-absent anti-join must broadcast only
    batch-sized key sets — a plan that broadcasts the STORE's key column
    (the naive LeftAnti BuildRight) grows its broadcast without bound as
    the sink fills. Pin: every BroadcastExchange in the upsert plan is
    fed by the batch/hits side, never by the store's parquet scan."""
    from pyspark.sql import functions as F

    from aws_localstack_stream_processing_spark.streaming.sinks import (
        KeyedParquetSink,
    )

    sink = KeyedParquetSink(str(tmp_path / "kv"), "key")
    seed = spark.range(2000).select(
        F.sha2(F.col("id").cast("string"), 256).alias("key"),
        F.lit("v").alias("payload"),
    )
    sink.upsert_batch(seed, 0)

    # rebuild the exact upsert plan for a second batch and inspect it
    batch = spark.range(1990, 2100).select(
        F.sha2(F.col("id").cast("string"), 256).alias("key"),
        F.lit("v").alias("payload"),
    )
    fresh = batch.dropDuplicates(["key"])
    seen = spark.read.parquet(sink.path).select("key")
    hits = seen.join(
        F.broadcast(fresh.select("key")), "key", "left_semi"
    ).distinct()
    new = fresh.join(F.broadcast(hits), "key", "left_anti")
    new.collect()
    plan = new._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    import re

    depth = [re.match(r"^[\s:+\-]*", ln).end() for ln in lines]
    for i, ln in enumerate(lines):
        if "BroadcastExchange" not in ln:
            continue
        # the broadcast subtree must not contain the store scan
        j = i + 1
        subtree = []
        while j < len(lines) and depth[j] > depth[i]:
            subtree.append(lines[j])
            j += 1
        scan_lines = [
            s for s in subtree if "FileScan parquet" in s or "Scan parquet" in s
        ]
        # the semi-probe broadcast carries only the batch keys (built
        # from spark.range, no parquet scan); the anti broadcast carries
        # `hits`, whose lineage includes the store scan BUT only after
        # the semi join bounded it to batch size — so a store scan may
        # appear under a broadcast ONLY together with that semi join
        if scan_lines:
            assert any("LeftSemi" in s for s in subtree), (
                "store scan broadcast without a batch-key semi bound:\n"
                + "\n".join(subtree[:10])
            )
    # and the store itself is never the BUILD side of the final anti join
    anti = [ln for ln in lines if "LeftAnti" in ln]
    assert anti, plan
    # convergence semantics unchanged: replay the same batch, count stable
    sink.upsert_batch(batch, 1)
    n1 = sink.read(spark).count()
    sink.upsert_batch(batch, 1)
    assert sink.read(spark).count() == n1 == 2100
