"""Alarm action sink: emission == transitions, and replay idempotency —
the engine-side contract of the reference's alarm→SNS wiring
(app.ts:547-601).

The sf0.001 test stream is too sparse to breach the 3-consecutive-period
rule in both directions, so these tests stream a CRAFTED event log with a
known alarm timeline (raise at h3, resolve at h5, raise again at h8); the
registered ``stream_alarm_actions`` query runs the same sink against the
driver tables at driver SF, where the oracle checks values."""

from __future__ import annotations

import datetime
import tempfile

import pytest
from pyspark.sql import functions as F

from aws_localstack_stream_processing_spark.streaming.alarms import (
    AlarmActionSink,
    alarm_actions_view,
    emitted_actions,
)

_TEST_THRESHOLD = 1
# events per hour for key 'a': breach (n>1) pattern 1,1,1,1,0,1,1,1 →
# states OK,OK,ALARM,ALARM,OK,OK,OK,ALARM → transitions h3:ALARM,
# h5:OK, h8:ALARM (both directions exercised)
_HOURLY = [2, 2, 2, 2, 1, 2, 2, 2]


@pytest.fixture(scope="module")
def src_dir(tmp_path_factory, spark):
    d = str(tmp_path_factory.mktemp("alarm_src"))
    base = datetime.datetime(2024, 3, 1, 0, 0, 0)
    rows = []
    eid = 0
    for hour, n in enumerate(_HOURLY):
        for i in range(n):
            rows.append(
                (eid, base + datetime.timedelta(hours=hour, minutes=i), 1, "a", 1.0, "{}")
            )
            eid += 1
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/ev")
    import os, shutil

    part = [f for f in os.listdir(f"{d}/ev") if f.endswith(".parquet")][0]
    shutil.move(f"{d}/ev/{part}", f"{d}/events.parquet")
    return d


def _run_stream(spark, src, store):
    from aws_localstack_stream_processing_spark.streaming.source import (
        events_stream,
    )

    ev = events_stream(spark, src)
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("h"), "event_type"
    ).agg(F.count("*").alias("n"))
    sink = AlarmActionSink(store, _TEST_THRESHOLD)
    q = (
        hourly.writeStream.foreachBatch(sink.process_batch)
        .outputMode("complete")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="alarm_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


@pytest.fixture(scope="module")
def store(tmp_path_factory, spark, src_dir):
    path = str(tmp_path_factory.mktemp("alarm_store"))
    _run_stream(spark, src_dir, path)
    return path


def test_known_timeline_transitions(spark, store):
    """The crafted log must produce exactly the expected alarm history."""
    got = [
        (r.hour, r.action)
        for r in alarm_actions_view(spark, store).orderBy("hour").collect()
    ]
    assert got == [
        ("2024-03-01 02:00:00", "ALARM"),
        ("2024-03-01 04:00:00", "OK"),
        ("2024-03-01 07:00:00", "ALARM"),
    ]


def test_first_run_emits_exactly_the_transitions(spark, store):
    """From an empty store the diff IS the full state table, so every
    transition the view derives must be present in the action log at its
    (key, period) slot."""
    view = {
        (r.event_type, r.hour, r.action)
        for r in alarm_actions_view(spark, store).collect()
    }
    log = {
        (r.event_type, r.hour, r.state)
        for r in emitted_actions(spark, store).collect()
    }
    assert view and view <= log


def test_replay_is_idempotent(spark, src_dir, store):
    """Re-running the whole stream against the SAME store (fresh
    checkpoint — the at-least-once case) must not change the read view
    and must not page any new action: the replayed batch diffs to empty,
    so the action log's per-slot latest batch is unchanged."""
    before_view = sorted(map(tuple, alarm_actions_view(spark, store).collect()))
    before_log = {
        (r.slot, r.last_batch)
        for r in emitted_actions(spark, store).collect()
    }
    _run_stream(spark, src_dir, store)  # replay
    after_view = sorted(map(tuple, alarm_actions_view(spark, store).collect()))
    after_log = {
        (r.slot, r.last_batch)
        for r in emitted_actions(spark, store).collect()
    }
    assert after_view == before_view
    assert after_log == before_log  # no slot re-paged by the replay
