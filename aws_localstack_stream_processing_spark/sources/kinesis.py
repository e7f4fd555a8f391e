"""Kinesis streaming-source factory.

The reference's front door is a Kinesis Data Firehose DirectPut stream
(app.ts:401-427). On a real cluster this engine reads the same traffic with
the Spark Kinesis connector (``spark-sql-kinesis`` / Kinesis Data Streams);
in this container no connector jar is bundled, so :func:`kinesis_stream`
raises a clear error unless the format is actually registered, and the
option-building logic is factored out for unit testing.

The micro-batch knobs map 1:1 to the reference's buffering config
(SURVEY §2.6 T1): Firehose 60 s / 128 MB buffer → trigger interval +
``maxFetchRate``; SQS batch of 10 → ``maxRecordsPerFetch``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def kinesis_options(
    stream_name: str,
    region: str = "us-east-1",
    endpoint: str | None = None,
    starting_position: str = "TRIM_HORIZON",
    max_records_per_fetch: int | None = None,
) -> dict[str, str]:
    """Build the option map for the Kinesis source (connector-agnostic
    subset shared by the open-source Spark Kinesis connectors)."""
    if not stream_name:
        raise ValueError("stream_name is required")
    if starting_position not in {"TRIM_HORIZON", "LATEST"}:
        raise ValueError(f"invalid starting_position: {starting_position}")
    opts = {
        "streamName": stream_name,
        "region": region,
        "startingPosition": starting_position,
        "endpointUrl": endpoint or f"https://kinesis.{region}.amazonaws.com",
    }
    if max_records_per_fetch is not None:
        if max_records_per_fetch <= 0:
            raise ValueError("max_records_per_fetch must be positive")
        opts["maxRecordsPerFetch"] = str(max_records_per_fetch)
    return opts


def kinesis_available(spark: SparkSession) -> bool:
    """True when a Kinesis streaming source is registered on the session's
    classpath."""
    try:
        spark.readStream.format("kinesis").option("streamName", "probe").schema(
            "data binary"
        )
        # DataSource resolution happens at load(); probe the registry instead
        jvm = spark._jvm
        jvm.org.apache.spark.sql.execution.datasources.DataSource.lookupDataSource(
            "kinesis", spark._jsparkSession.sessionState().conf()
        )
        return True
    except Exception:
        return False


def kinesis_stream(
    spark: SparkSession, stream_name: str, **kwargs
) -> DataFrame:
    """``readStream.format("kinesis")`` with the reference's load shape.

    Raises :class:`RuntimeError` when no connector is on the classpath —
    callers in this repo use the file-stream source instead
    (:mod:`..streaming.source`), which carries identical downstream
    semantics."""
    if not kinesis_available(spark):
        raise RuntimeError(
            "no Kinesis connector on the classpath; add the spark-sql-kinesis "
            "connector jar, or use streaming.source.events_stream for the "
            "file-backed equivalent"
        )
    reader = spark.readStream.format("kinesis")
    for k, v in kinesis_options(stream_name, **kwargs).items():
        reader = reader.option(k, v)
    return reader.load()
