"""Keyed idempotent sinks (SURVEY §2.1 S8, §2.6 T2).

The reference's signature store is a DynamoDB put keyed by content hash
(signer/index.js:229-242): re-delivery overwrites the same item, so the
store converges no matter how many times a record arrives. This module
gives the engine that semantics over a parquet-backed keyed table: the
``foreachBatch`` upserter anti-joins each batch against the existing keys
and appends only unseen ones — convergent even when the *checkpoint* is
lost (a strictly stronger property than checkpoint-based exactly-once,
which this composes with).

At warehouse scale the anti-join is a broadcast of the batch's keys against
the key column of the sink (or a MERGE on a Delta/Iceberg table — same
logical contract, swap the implementation here).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


class KeyedParquetSink:
    """Append-only parquet table that behaves like a keyed KV store."""

    def __init__(self, path: str, key_col: str):
        self.path = path
        self.key_col = key_col

    def exists(self, spark: SparkSession) -> bool:
        return os.path.isdir(self.path) and any(
            f.endswith(".parquet") for f in os.listdir(self.path)
        )

    def upsert_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """foreachBatch hook: put-if-absent per key.

        Within-batch duplicates collapse first (last write wins is
        irrelevant here: same key ⇒ same payload, PK = content hash);
        cross-batch and cross-run duplicates drop via anti-join on the
        sink's key set.
        """
        spark = batch_df.sparkSession
        fresh = batch_df.dropDuplicates([self.key_col])
        if self.exists(spark):
            seen = spark.read.parquet(self.path).select(self.key_col)
            fresh = fresh.join(seen, self.key_col, "left_anti")
        fresh.write.mode("append").parquet(self.path)

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.path)
