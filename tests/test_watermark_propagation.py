"""Pins the watermark-propagation rule through a stream-stream interval
join into a downstream windowed aggregate (the semantics
``stream_chained_join_agg``'s oracle encodes — r8).

Discriminating micro-case: day-D matches sit in the join's output; later
pusher events advance both sides' watermarks by a controlled offset past
day D's window end. Three candidate emission rules give different
verdicts by construction:

- raw combined wm (min of sides − delay):        emits when offset ≥ 1 h
- per-side min(lwm, rwm − 2h):                   emits when offset ≥ 2.5 h
- combined wm − 2h (the join's upper range bound): emits when offset ≥ 3 h

Measured on Spark 4.1.2: offsets 2.0 h and 2.75 h do NOT emit, 3.1 h and
3.5 h DO — only the third rule survives. The aggregate must hold windows
open an extra 2 hours because a future right row can still join a left
row up to 2 h older than the right watermark (SPARK-42376 simulation).
"""

from __future__ import annotations

import os
import shutil
import time
from datetime import datetime, timedelta

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

D = datetime(2024, 1, 5)


def _build(base: str, push_offset_h: float) -> tuple[str, str]:
    shutil.rmtree(base, ignore_errors=True)
    left, right = f"{base}/L", f"{base}/R"
    os.makedirs(left)
    os.makedirs(right)
    # batch0: three day-D events (ids ≡ 0 mod 3, % 5 != 0 → acks on time)
    evs0 = [
        (3, D + timedelta(hours=1)),
        (6, D + timedelta(hours=12)),
        (9, D + timedelta(hours=23)),
    ]
    push = [
        (8, D + timedelta(days=1, hours=push_offset_h)),
        (11, D + timedelta(days=1, hours=push_offset_h)),
    ]
    batches = {0: evs0, 1: [], 2: push, 3: [], 4: [], 5: []}
    mtime = time.time() - 3600
    for k in range(6):
        rows = batches[k]
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array([r[0] for r in rows], pa.int64()),
                    "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                }
            ),
            f"{left}/f{k}.parquet",
        )
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array([r[0] for r in rows], pa.int64()),
                    "rts": pa.array(
                        [r[1] + timedelta(minutes=30) for r in rows],
                        pa.timestamp("us"),
                    ),
                }
            ),
            f"{right}/f{k}.parquet",
        )
        for p in (f"{left}/f{k}.parquet", f"{right}/f{k}.parquet"):
            os.utime(p, (mtime + 10 * k, mtime + 10 * k))
    return left, right


def _run(spark, left_dir: str, right_dir: str) -> list:
    from aws_localstack_stream_processing_spark.plans.streaming_surface import (
        _to_memory,
    )
    from aws_localstack_stream_processing_spark.session import (
        apply_runtime_confs,
    )

    apply_runtime_confs(spark)
    ls = spark.read.parquet(f"{left_dir}/f0.parquet").schema
    rs = spark.read.parquet(f"{right_dir}/f0.parquet").schema
    lev = (
        spark.readStream.schema(ls)
        .option("maxFilesPerTrigger", "1")
        .parquet(left_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "1 hour")
    )
    rev = (
        spark.readStream.schema(rs)
        .option("maxFilesPerTrigger", "1")
        .parquet(right_dir)
        .withColumn("rts", F.col("rts").cast("timestamp"))
        .withColumnRenamed("event_id", "rid")
        .withWatermark("rts", "1 hour")
    )
    joined = lev.join(
        rev,
        (F.col("event_id") == F.col("rid"))
        & (F.col("rts") >= F.col("ts"))
        & (F.col("rts") <= F.col("ts") + F.expr("INTERVAL 2 HOURS")),
        "inner",
    )
    agg = (
        joined.groupBy(F.window("ts", "1 day").alias("w"))
        .agg(F.count("*").cast("bigint").alias("n"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd").alias("day"), "n"
        )
    )
    return sorted((r.day, r.n) for r in _to_memory(agg, "append").collect())


@pytest.mark.parametrize(
    "offset_h,expect_emitted",
    [
        (2.0, False),  # falsifies the raw-combined-wm rule (would emit ≥1h)
        (2.75, False),  # falsifies per-side min(lwm, rwm−2h) (would emit ≥2.5h)
        (3.5, True),  # combined wm − 2h: emits at ≥3h — the pinned rule
    ],
)
def test_join_agg_window_emission_threshold(
    spark, tmp_path, offset_h, expect_emitted
):
    left, right = _build(str(tmp_path / f"cj_{offset_h}"), offset_h)
    rows = _run(spark, left, right)
    assert (("2024-01-05", 3) in rows) == expect_emitted, (offset_h, rows)
