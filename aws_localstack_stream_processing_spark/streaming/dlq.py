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
    """Reusable foreachBatch writer: split on validity, land both sides.

    Idempotence: foreachBatch is at-least-once (a crash between the writes
    and the checkpoint commit replays the whole micro-batch), so each
    invocation OVERWRITES a ``batch_id=<id>`` subdirectory instead of
    blind-appending — a replayed batch rewrites the same files and readers
    of the base path see each record exactly once. ``batch_id`` stays
    visible to readers as a discovered partition column.
    """

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        marked = with_validity(batch_df, json_col)
        for pred, path in ((F.col("result") == "Ok", ok_path),
                           (F.col("result") != "Ok", err_path)):
            marked.filter(pred).drop("result").write.mode("overwrite").parquet(
                f"{path}/batch_id={batch_id}"
            )

    return handle
