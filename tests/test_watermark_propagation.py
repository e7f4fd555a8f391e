"""Pins the watermark-propagation rule through a stream-stream interval
join into a downstream windowed aggregate (the semantics
``stream_chained_join_agg``'s oracle encodes — r8), generalized in r9
from a point observation at upper = 2 h to a parametrized LAW over
upper ∈ {0, 30 min, 2 h} and both join argument orders.

Discriminating micro-case: day-D matches sit in the join's output; later
pusher events advance both sides' watermarks by a controlled offset past
day D's window end. With a 1 h watermark delay, a right-side event-time
lag ``rlag`` (so right wm never binds), and the join's upper range bound
``U`` (rts ∈ [ts, ts + U]), the candidate emission rules predict
different offset thresholds:

- raw combined wm (min of sides − delay):     emits when offset > 1 h
  (U-independent)
- per-side min(lwm, rwm − U):                 emits when offset > 1 h +
  U − rlag
- combined wm − U (the pinned rule):          emits when offset > 1 h + U

Measured on Spark 4.1.2 (r8, U = 2 h): offsets 2.0 h and 2.75 h do NOT
emit, 3.1 h and 3.5 h DO — only the third rule survives: the aggregate
holds windows open an extra U because a future right row can still join
a left row up to U older than the right watermark (SPARK-42376
simulation). The r9 sweep asserts the same `1 h + U` threshold at
U = 30 min (offset 1.25 h silent — falsifying the U-independent raw
rule again at a different U — and 2.25 h emitting) and at U = 0 (where
all rules coincide: the law degrades continuously, no spurious extra
holding), and that swapping the join's argument order changes nothing —
the combined watermark is a MIN over sides, so the rule is symmetric.
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


def _build(base: str, push_offset_h: float, rlag_min: int) -> tuple[str, str]:
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
                        [r[1] + timedelta(minutes=rlag_min) for r in rows],
                        pa.timestamp("us"),
                    ),
                }
            ),
            f"{right}/f{k}.parquet",
        )
        for p in (f"{left}/f{k}.parquet", f"{right}/f{k}.parquet"):
            os.utime(p, (mtime + 10 * k, mtime + 10 * k))
    return left, right


def _run(
    spark, left_dir: str, right_dir: str, upper_min: int, order: str
) -> list:
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
    cond = (
        (F.col("event_id") == F.col("rid"))
        & (F.col("rts") >= F.col("ts"))
        & (F.col("rts") <= F.col("ts") + F.expr(f"INTERVAL {upper_min} MINUTES"))
    )
    joined = lev.join(rev, cond, "inner") if order == "lr" else rev.join(
        lev, cond, "inner"
    )
    agg = (
        joined.groupBy(F.window("ts", "1 day").alias("w"))
        .agg(F.count("*").cast("bigint").alias("n"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd").alias("day"), "n"
        )
    )
    return sorted((r.day, r.n) for r in _to_memory(agg, "append").collect())


# threshold per the pinned rule: offset > 1 h (delay) + U. Each U keeps a
# no-emit point 15 min under its threshold and an emit point ≥ 30 min
# over (the r8 measurement showed a 6 min emit margin suffices, so these
# margins are conservative). rlag = right event-time lag; must be ≤ U for
# the rows to match at all, and rlag < U + 1 h keeps the LEFT wm binding.
_CASES = [
    # U=2h, rlag=30min (the r8 trilogy, now one instance of the law)
    (120, 30, 2.0, False, "lr"),  # falsifies raw combined wm (emits >1h)
    (120, 30, 2.75, False, "lr"),  # falsifies per-side min(lwm, rwm−U)
    (120, 30, 3.5, True, "lr"),
    # U=30min: raw rule again predicts >1h — 1.25h silent falsifies it at
    # a second U; threshold moves to 1.5h exactly as combined−U predicts
    (30, 30, 1.25, False, "lr"),
    (30, 30, 2.25, True, "lr"),
    # U=0 (equality join on time): all candidate rules coincide at 1h —
    # the law's boundary case, no spurious extra holding
    (0, 0, 0.75, False, "lr"),
    (0, 0, 1.75, True, "lr"),
    # join argument order must not matter (combined wm is a MIN over
    # sides): repeat the sharpest falsifier and an emit point reversed
    (120, 30, 2.75, False, "rl"),
    (120, 30, 3.5, True, "rl"),
    (30, 30, 1.25, False, "rl"),
    (30, 30, 2.25, True, "rl"),
]


@pytest.mark.parametrize("upper_min,rlag_min,offset_h,expect_emitted,order", _CASES)
def test_join_agg_window_emission_threshold(
    spark, tmp_path, upper_min, rlag_min, offset_h, expect_emitted, order
):
    left, right = _build(
        str(tmp_path / f"cj_{upper_min}_{offset_h}_{order}"), offset_h, rlag_min
    )
    rows = _run(spark, left, right, upper_min, order)
    assert (("2024-01-05", 3) in rows) == expect_emitted, (
        upper_min, offset_h, order, rows,
    )


def test_triple_chain_oracle_terms_are_load_bearing():
    """The triple chain's composed oracle (``_triple_chain_sql``) must be
    FALSIFIABLE on the shipped staging — each candidate rule the r8/r9
    sweeps rejected has to produce a DIFFERENT answer here, else the
    query pins nothing. DuckDB-only (no streaming run): substitute the
    rejected rule into the closed form and require a divergence.

    - propagated wm = combined − 2h vs RAW combined: the 22:00 window
      offset parks every batch watermark inside (wend, wend+2h), so the
      raw rule emits the tail window the real engine holds back;
    - the ack late filter: dropping it admits the delayed id%7 acks the
      engine filtered (divergence checked at sf0.01-scale counts in the
      query docstring; at sf0.001 the filtered pairs can all fall in
      already-closed windows, so here we assert the raw-wm divergence
      and that duplicates/delayed acks exist for the stages to act on).
    """
    import duckdb

    from aws_localstack_stream_processing_spark.plans.streaming_surface import (
        _triple_chain_sql,
    )

    from .conftest import SF_DIR

    base_sql = _triple_chain_sql("duck")
    raw_sql = base_sql.replace(
        "JOIN wmd ON wmd.wm - INTERVAL 2 HOUR >= w.wend", "JOIN wmd ON wmd.wm >= w.wend"
    )
    assert raw_sql != base_sql  # the substitution found its target
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF_DIR}/events.parquet')"
    )
    base = con.execute(base_sql).fetchall()
    raw = con.execute(raw_sql).fetchall()
    assert base and raw != base, "raw-wm rule not falsifiable on this staging"
    # the dedup and delayed-ack stages have real work at this SF
    dup, delayed = con.execute(
        """
        SELECT COUNT(*) FILTER (WHERE event_id % 5 = 0
                                AND least((day(ts)-1)//5, 5) <= 4),
               COUNT(*) FILTER (WHERE event_id % 7 = 0)
        FROM events"""
    ).fetchone()
    assert dup > 0 and delayed > 0
