"""Streaming sources.

The reference ingests via Firehose DirectPut and consumes S3-event/SQS
notifications (SURVEY §2.1 S1/S5/S6). Spark's file-stream source subsumes
the S3→SQS→Lambda hop: new files under a path become micro-batch work items,
checkpointed exactly-once — no queue, no visibility timeouts.

For the correctness harness the driver's ``events`` parquet is treated as an
append-only stream (one file = one micro-batch; ``maxFilesPerTrigger``
reproduces the reference's batch-size knob, app.ts:46).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import apply_runtime_confs


def events_stream(
    spark: SparkSession,
    sf_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """The ``events`` table as an unbounded file stream (SURVEY §1.1 #1)."""
    apply_runtime_confs(spark)
    base = sf_dir.rstrip("/")
    batch = spark.read.parquet(f"{base}/events.parquet")
    # the file source requires a directory; pathGlobFilter selects the table
    # (the prefix filter of the reference's S3 notification, app.ts:437)
    reader = spark.readStream.schema(batch.schema).option(
        "pathGlobFilter", "events.parquet"
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(base)
    # ts arrives as a raw nanosecond LongType, TIMESTAMP_NTZ, or TIMESTAMP
    # depending on the writer. Watermarks require TIMESTAMP (not NTZ), so
    # normalize; the session timezone is pinned to UTC, which makes the
    # NTZ -> TIMESTAMP reinterpretation deterministic.
    ts_type = dict(batch.dtypes)["ts"]
    if ts_type == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
    elif ts_type != "timestamp":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def lake_stream(spark: SparkSession, lake_dir: str, schema) -> DataFrame:
    """File-stream over a partitioned lake directory — the replay source
    (SURVEY §2.6 T8): re-running a batch query over ``raw/`` IS replay."""
    apply_runtime_confs(spark)
    return spark.readStream.schema(schema).parquet(lake_dir)
