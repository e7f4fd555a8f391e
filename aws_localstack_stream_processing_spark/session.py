"""SparkSession factory tuned for this engine.

Local test mode is ``local[32]`` (single JVM); the configs below are chosen
so the same logical plans scale to a multi-executor cluster:

- AQE on (runtime re-plan, skew-join splitting, partition coalescing)
- shuffle partitions sized to cores locally (cluster: set to 2-3x total cores)
- Arrow enabled for the Pandas-UDF slow path
- UTC session timezone (determinism; DuckDB oracle timestamps are UTC-naive)
- ``nanosAsLong`` so parquet TIMESTAMP(NANOS) columns (the ``events`` table)
  are readable; :mod:`catalog` converts them to microsecond timestamps.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Configs that are safe (and required) to apply to an externally-created
# session at runtime — e.g. the verification driver's session.
RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Scan-split sizing: the default 4 MiB openCostInBytes floors maxSplitBytes
    # (min(maxPartitionBytes, max(openCost, bytes/parallelism))), so a ~10 MiB
    # test table scans as ~3 tasks on 32 cores. Lowering the floor lets
    # bytes/parallelism govern at small scale; at 100 TB the 128 MiB
    # maxPartitionBytes term governs instead, so this is scale-neutral.
    "spark.sql.files.openCostInBytes": "131072",
}


def apply_runtime_confs(spark: SparkSession) -> SparkSession:
    """Apply determinism/perf confs that are runtime-settable.

    Called by :func:`catalog.load_table` so that queries behave identically
    under any session (ours or the driver's).
    """
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static conf on this build — session factory sets it instead
    return spark


def get_spark(
    app_name: str = "aws-localstack-stream-processing-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    shuffle = shuffle_partitions or int(
        os.environ.get("SPARK_SHUFFLE_PARTITIONS", str(max(cpus, 8)))
    )
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.filterPushdown", "true")
        # small dims (region/nation/supplier/keyrings) should always broadcast
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return apply_runtime_confs(spark)
