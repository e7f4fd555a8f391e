"""Idempotence pins for the streaming CDC→SCD2 merge (VERDICT r9 #4).

The oracle already proves one clean run equals the batch recompute; these
tests pin the fault-tolerance matrix: a replayed micro-batch is a no-op,
a full at-least-once replay over an already-populated history table
(checkpoint lost entirely — strictly worse than any real restart) still
converges to the same table, and a checkpointed RESUME merges only the
new slices with batch numbering continued.
"""

from __future__ import annotations

import tempfile

import pytest

from aws_localstack_stream_processing_spark.plans import all_queries
from aws_localstack_stream_processing_spark.streaming.sinks import (
    Scd2ParquetSink,
)
from aws_localstack_stream_processing_spark.streaming.source import (
    staged_cdc_slices,
)

from .conftest import SF_DIR, normalize


def _history_rows(spark, sink: Scd2ParquetSink):
    df = sink.read(spark).select(
        "user_id", "attr", "version_n", "valid_from_s", "valid_to_s",
        "is_current",
    )
    return normalize([tuple(r) for r in df.collect()], df.columns)[1]


def _slice(spark, src: str, k: int):
    return spark.read.parquet(f"{src}/f{k}.parquet")


def test_replayed_batch_is_noop(spark):
    """Exactly-once under redelivery: merging the SAME micro-batch twice
    (the restart-after-commit-before-checkpoint window) leaves the
    history table byte-identical — the merge is a deterministic function
    of (history ∪ batch) and exact duplicates dedup away."""
    src = staged_cdc_slices(SF_DIR)
    sink = Scd2ParquetSink(tempfile.mkdtemp(prefix="slsp_scd2_noop_") + "/h")
    sink.merge_batch(_slice(spark, src, 0), 0)
    sink.merge_batch(_slice(spark, src, 1), 1)
    after_two = _history_rows(spark, sink)
    sink.merge_batch(_slice(spark, src, 1), 1)  # redelivered batch
    assert _history_rows(spark, sink) == after_two
    sink.merge_batch(_slice(spark, src, 0), 0)  # even out-of-order replay
    assert _history_rows(spark, sink) == after_two


def test_full_replay_converges(spark):
    """Checkpoint lost entirely after partial progress: merge 3 slices,
    then replay ALL 6 from scratch over the populated table — the final
    history equals a clean end-to-end run's (and hence the batch
    recompute the oracle pins). This is convergence under at-least-once
    delivery without ANY checkpoint help, the KeyedParquetSink discipline
    extended to history."""
    src = staged_cdc_slices(SF_DIR)
    sink = Scd2ParquetSink(tempfile.mkdtemp(prefix="slsp_scd2_replay_") + "/h")
    for k in range(3):  # partial progress, checkpoint then "lost"
        sink.merge_batch(_slice(spark, src, k), k)
    for k in range(6):  # full replay, batches 0-2 now pure redelivery
        sink.merge_batch(_slice(spark, src, k), 100 + k)
    replayed = _history_rows(spark, sink)

    clean = all_queries()["stream_cdc_scd2"].fn(spark, SF_DIR)
    clean_rows = normalize(
        [tuple(r) for r in clean.collect()], clean.columns
    )[1]
    assert replayed == clean_rows and len(replayed) > 0


def test_merge_touches_only_affected_buckets(spark):
    """The MERGE's scale claim: a batch whose users map to a strict
    subset of buckets must leave every other bucket's files untouched
    (dynamic partition overwrite = partition-pruned copy-on-write).
    Synthetic changelog so users span every bucket regardless of SF
    (the staged cohort's user_ids are multiples of 20 and land in only
    two of the eight buckets)."""
    import glob
    import os

    schema = "user_id BIGINT, attr STRING, ts_s BIGINT, event_id BIGINT"
    n_b = Scd2ParquetSink.N_BUCKETS
    seed = spark.createDataFrame(
        [(u, "signup", 1000 + u, u) for u in range(1, 2 * n_b + 1)], schema
    )
    sink = Scd2ParquetSink(tempfile.mkdtemp(prefix="slsp_scd2_bkt_") + "/h")
    sink.merge_batch(seed, 0)
    before = {
        p: os.stat(p).st_mtime_ns
        for p in glob.glob(os.path.join(sink.path, "bucket=*", "*.parquet"))
    }
    assert len({p.split("bucket=")[1].split(os.sep)[0] for p in before}) == n_b
    touched_bucket = 3 % n_b
    sink.merge_batch(
        spark.createDataFrame([(3, "error", 2000, 999)], schema), 1
    )
    after = {
        p: os.stat(p).st_mtime_ns
        for p in glob.glob(os.path.join(sink.path, "bucket=*", "*.parquet"))
    }
    untouched = {
        p: t
        for p, t in before.items()
        if f"bucket={touched_bucket}" + os.sep not in p
    }
    assert untouched and all(after.get(p) == t for p, t in untouched.items())
    # and the touched bucket gained user 3's second version
    rows = sink.read(spark).filter("user_id = 3").orderBy("version_n")
    assert [(r.attr, bool(r.is_current)) for r in rows.collect()] == [
        ("signup", False),
        ("error", True),
    ]


def test_checkpoint_resume_continues_exactly_once(spark):
    """The third cell of the fault matrix (replayed batch, lost
    checkpoint, and now RESUME): a stream stopped after 3 of 6 slices
    and restarted with the SAME checkpoint must merge only the new
    slices — batch ids continue where the checkpoint left off, no slice
    is re-delivered to the sink — and the final history equals the
    clean run's."""
    import os
    import shutil

    from aws_localstack_stream_processing_spark.streaming.statestore import (
        apply_state_store,
    )

    src = staged_cdc_slices(SF_DIR)
    work = tempfile.mkdtemp(prefix="slsp_scd2_resume_")
    part_src = os.path.join(work, "src")
    os.makedirs(part_src)
    ckpt = os.path.join(work, "ckpt")

    class RecordingSink(Scd2ParquetSink):
        def __init__(self, path):
            super().__init__(path)
            self.batch_ids = []

        def merge_batch(self, batch_df, batch_id):
            self.batch_ids.append(batch_id)
            super().merge_batch(batch_df, batch_id)

    sink = RecordingSink(os.path.join(work, "history"))
    schema = spark.read.parquet(f"{src}/f0.parquet").schema

    def run_stream():
        apply_state_store(spark)
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(part_src)
            .writeStream.foreachBatch(sink.merge_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    for k in range(3):
        p = os.path.join(part_src, f"f{k}.parquet")
        shutil.copy2(f"{src}/f{k}.parquet", p)  # copy2 keeps mtime order
    run_stream()
    first = list(sink.batch_ids)
    assert first == [0, 1, 2]
    for k in range(3, 6):
        shutil.copy2(f"{src}/f{k}.parquet", os.path.join(part_src, f"f{k}.parquet"))
    run_stream()
    resumed = sink.batch_ids[len(first):]
    # checkpoint-driven resume: ONLY the new slices, numbered onward
    assert resumed == [3, 4, 5], (first, resumed)

    clean = all_queries()["stream_cdc_scd2"].fn(spark, SF_DIR)
    clean_rows = normalize(
        [tuple(r) for r in clean.collect()], clean.columns
    )[1]
    assert _history_rows(spark, sink) == clean_rows


def test_merge_plan_single_user_exchange(spark):
    """The MERGE plan's scale shape, lint-style (the registry lint never
    sees foreachBatch jobs): dedup, run-collapse, and reversioning must
    all ride ONE user_id hash exchange — no global (unpartitioned)
    window, no extra shuffle between the window passes."""
    schema = "user_id BIGINT, attr STRING, ts_s BIGINT, event_id BIGINT"
    from pyspark.sql import functions as F

    cand = (
        spark.createDataFrame(
            [(u, "signup", 1000 + u, u) for u in range(1, 9)], schema
        ).withColumn(
            "bucket",
            F.pmod("user_id", F.lit(Scd2ParquetSink.N_BUCKETS)).cast("int"),
        )
    )
    plan = (
        Scd2ParquetSink.merge_plan(cand)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # exactly one exchange, and it hash-partitions on user_id
    exchanges = [
        ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln
    ]
    assert len(exchanges) == 1, plan
    assert "user_id" in exchanges[0]
    assert "SinglePartition" not in plan
    # no window runs without a PARTITION BY (the single-partition trap)
    for ln in plan.splitlines():
        stripped = ln.strip(" :+-*(0123456789)")
        if stripped.startswith("Window "):
            assert "user_id" in ln, f"unpartitioned window: {ln}"
