"""End-to-end exactly-once across the composed E1+E2 pipeline
(VERDICT r7 #8): firehose_sim source → manifest-committed lake →
manifest_lake source → kv_upsert sink, with an injected crash in the
window the commit protocol claims to survive — AFTER the upstream
manifest publish, DURING the downstream sink commit (files renamed into
the batch dir, marker not yet written). After a restart from the same
checkpoint, the sink's final state must equal an uninterrupted single
run's state — the reference's end-to-end guarantee (README.md:118-122:
at-least-once delivery + idempotent keyed writes = effectively-once).

Each stage was fault-tested in isolation in earlier rounds
(test_kv_sink.py, test_manifest_source.py); this composes them.
"""

from __future__ import annotations

import pytest

import os

from pyspark.sql import functions as F
from pyspark.sql.utils import StreamingQueryException

from aws_localstack_stream_processing_spark.sources.firehose_datasource import (
    register_firehose_source,
)
from aws_localstack_stream_processing_spark.sources.kv_sink_datasource import (
    _FAILPOINT_BEFORE_MARKER,
    committed_batches,
    read_kv_table,
    register_kv_sink,
)
from aws_localstack_stream_processing_spark.sources.manifest_datasource import (
    register_manifest_source,
)
from aws_localstack_stream_processing_spark.streaming.jobs import (
    run_ingest_stream_manifest,
)

from .conftest import SF_DIR

# skip-by-default (VERDICT r13 #1): multi-minute suite; run with --runslow
pytestmark = pytest.mark.slow

EVENTS = f"{SF_DIR}/events.parquet"


def _ingest_to_lake(spark, work: str) -> str:
    """Stage A (E1): firehose_sim micro-batches land in a
    manifest-committed lake."""
    register_firehose_source(spark)
    lake = f"{work}/lake"
    src = (
        spark.readStream.format("firehose_sim")
        .option("path", EVENTS)
        .option("numPartitions", 4)
        .load()
        .select(F.col("recordId").alias("key"), "data")
    )
    run_ingest_stream_manifest(spark, src, lake, f"{work}/ckpt_a")
    return lake


def _run_sink(spark, lake: str, store: str, ckpt: str) -> None:
    """Stage B (E2): consume the lake purely from its manifest, upsert
    into the keyed store."""
    df = (
        spark.readStream.format("manifest_lake")
        .option("path", lake)
        .option("numPartitions", "4")
        .load()
    )
    q = (
        df.writeStream.format("kv_upsert")
        .option("path", store)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_e2e_exactly_once_crash_between_manifest_and_sink_commit(
    spark, tmp_path
):
    register_manifest_source(spark)
    register_kv_sink(spark)
    work = str(tmp_path)
    lake = _ingest_to_lake(spark, work)

    # uninterrupted reference run into its own store
    ref_store = f"{work}/store_ref"
    _run_sink(spark, lake, ref_store, f"{work}/ckpt_ref")
    ref = {r.key: r.data for r in read_kv_table(spark, ref_store, "key").collect()}
    assert len(ref) == spark.read.parquet(EVENTS).count()

    # faulted run: plant the one-shot failpoint so the sink commit dies
    # after its renames, before its marker — manifest already published
    crash_store = f"{work}/store_crash"
    os.makedirs(crash_store, exist_ok=True)
    with open(os.path.join(crash_store, _FAILPOINT_BEFORE_MARKER), "w") as f:
        f.write("crash once")
    try:
        _run_sink(spark, lake, crash_store, f"{work}/ckpt_b")
        raise AssertionError("injected failpoint did not fire")
    except StreamingQueryException:
        pass
    # the failpoint was claimed (single-shot) and the partial batch is
    # invisible: no marker means no committed batch
    assert not os.path.exists(
        os.path.join(crash_store, _FAILPOINT_BEFORE_MARKER)
    )
    partial = committed_batches(crash_store)
    crashed_view = (
        {r.key for r in read_kv_table(spark, crash_store, "key").collect()}
        if partial
        else set()
    )
    assert len(crashed_view) < len(ref)  # the kill actually lost work

    # restart from the SAME checkpoint: Spark replays the unfinished batch
    # with the same id; the sink converges to exactly the single-run state
    _run_sink(spark, lake, crash_store, f"{work}/ckpt_b")
    got = {
        r.key: r.data for r in read_kv_table(spark, crash_store, "key").collect()
    }
    assert got == ref
    assert [os.path.basename(b) for b in committed_batches(crash_store)] == [
        os.path.basename(b) for b in committed_batches(ref_store)
    ]
