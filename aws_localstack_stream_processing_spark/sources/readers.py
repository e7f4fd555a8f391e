"""Schema-enforced batch readers.

The reference's ingest path accepts arbitrary JSON and isolates per-record
failures (partitioner/index.js:43-80): a bad record goes to the error output
without failing the batch. Spark's PERMISSIVE mode + a corrupt-record column
reproduces that contract declaratively — the split is two filters over one
scan, not a try/catch per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from ..session import apply_runtime_confs

CORRUPT_COL = "_corrupt_record"


def read_json_with_dlq(
    spark: SparkSession, path: str, schema: StructType
) -> tuple[DataFrame, DataFrame]:
    """Read JSON-lines with an explicit schema; return (ok, dead_letter).

    ``ok`` rows parsed cleanly; ``dead_letter`` carries the raw text of every
    record that failed the schema (the reference's ``ProcessingFailed`` path,
    errorOutputPrefix app.ts:412). One scan; Catalyst shares it across both
    filters.
    """
    apply_runtime_confs(spark)
    full = StructType(
        list(schema.fields) + [StructField(CORRUPT_COL, StringType(), True)]
    )
    df = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
        .cache()  # the split below reads it twice; tiny vs re-scan
    )
    ok = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    dlq = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_record")
    )
    return ok, dlq


def read_csv_strict(
    spark: SparkSession, path: str, schema: StructType, **options: str
) -> DataFrame:
    """CSV with enforced schema, header, FAILFAST — for control tables
    (key rings, band definitions) where silent coercion is unacceptable."""
    apply_runtime_confs(spark)
    return (
        spark.read.schema(schema)
        .option("header", "true")
        .option("mode", "FAILFAST")
        .options(**options)
        .csv(path)
    )


def read_lake(
    spark: SparkSession, lake_dir: str, partition: str | None = None
) -> DataFrame:
    """Read back the partitioned lake (streaming/jobs.py:run_ingest_stream
    layout). A partition filter prunes at the file index — no data files
    outside the selected bucket are opened (the reference's raw/ prefix
    notification filter, app.ts:437, done by the planner instead)."""
    apply_runtime_confs(spark)
    df = spark.read.parquet(lake_dir)
    if partition is not None:
        df = df.filter(F.col("partition") == partition)
    return df
