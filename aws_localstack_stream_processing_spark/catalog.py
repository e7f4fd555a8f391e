"""Test-table catalog.

Loads the driver's parquet tables (TESTDATA.md) with schema normalization:
the ``events`` table stores ``ts`` as parquet TIMESTAMP(NANOS), which Spark's
vectorized reader rejects; with ``spark.sql.legacy.parquet.nanosAsLong`` the
column arrives as a nanosecond LongType which we convert to a microsecond
TimestampType via integer division (bit-exact with DuckDB's ns→µs truncation
— float division would lose precision at ~1.7e18 ns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import apply_runtime_confs

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# parquet TIMESTAMP(NANOS) columns per table (read as long, converted here)
_NANOS_TS_COLS: dict[str, list[str]] = {"events": ["ts"]}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    apply_runtime_confs(spark)
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
    for col in _NANOS_TS_COLS.get(name, []):
        if col in df.columns and dict(df.dtypes)[col] == "bigint":
            df = df.withColumn(col, F.expr(f"timestamp_micros({col} DIV 1000)"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view (for the SQL API surface)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
