"""The DirectPut connector (Spark 4 Python DataSource): envelope shape,
batch/stream parity, and row-group-pruned partition planning."""

from __future__ import annotations

import base64
import json

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from aws_localstack_stream_processing_spark.sources.firehose_datasource import (
    _read_rows,
    _split,
    register_firehose_source,
)

from .conftest import SF_DIR

EVENTS = f"{SF_DIR}/events.parquet"


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(
    start=st.integers(0, 10_000_000),
    length=st.integers(0, 1_000_000),
    n=st.integers(1, 64),
)
def test_split_partition_algebra(start, length, n):
    """Offset-range planning must tile [start, end) exactly for ANY
    checkpointed range: contiguous, non-overlapping, fully covering —
    the property that makes replay exactly-once."""
    end = start + length
    parts = _split(start, end, n)
    if length == 0:
        assert parts == []
        return
    assert parts[0].start == start and parts[-1].end == end
    for a, b in zip(parts, parts[1:]):
        assert a.end == b.start
    assert all(p.end > p.start for p in parts)
    assert len(parts) <= min(n, length)
    sizes = [p.end - p.start for p in parts]
    assert max(sizes) - min(sizes) <= 1 or max(sizes) == -(-length // len(parts))


def test_split_covers_range_exactly():
    parts = _split(0, 1000, 8)
    assert [p.start for p in parts][0] == 0 and parts[-1].end == 1000
    covered = sum(p.end - p.start for p in parts)
    assert covered == 1000
    for a, b in zip(parts, parts[1:]):
        assert a.end == b.start  # contiguous, no overlap
    assert _split(5, 5, 4) == []  # empty range → no partitions
    assert len(_split(0, 3, 8)) == 3  # never more partitions than rows


def test_batch_read_roundtrip(spark):
    register_firehose_source(spark)
    df = (
        spark.read.format("firehose_sim")
        .option("path", EVENTS)
        .option("numPartitions", 4)
        .load()
    )
    src = pq.read_table(EVENTS)
    assert df.count() == src.num_rows
    row = df.orderBy("recordId").first()
    payload = json.loads(base64.b64decode(row.data))
    first = src.slice(0, 1).to_pylist()[0]
    assert payload["id"] == first["event_id"]
    assert payload["event_type"] == first["event_type"]
    assert payload["value"] == first["value"]
    assert row.arrival == first["ts"]


def test_stream_equals_batch(spark):
    register_firehose_source(spark)
    batch = (
        spark.read.format("firehose_sim").option("path", EVENTS).load()
    )
    q = (
        spark.readStream.format("firehose_sim")
        .option("path", EVENTS)
        .load()
        .writeStream.format("memory")
        .queryName("fh_parity")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = spark.table("fh_parity")
    assert streamed.count() == batch.count()
    assert (
        streamed.exceptAll(batch).count() == 0
        and batch.exceptAll(streamed).count() == 0
    )


def test_read_prunes_to_overlapping_row_groups(tmp_path):
    # 100 rows in 4 row groups of 25; a [30, 55) range must touch only
    # groups 1-2, and the emitted sequence numbers must match the range
    path = str(tmp_path / "log.parquet")
    table = pa.table(
        {
            "event_id": list(range(100)),
            "ts": [None] * 100,
            "user_id": [1] * 100,
            "event_type": ["click"] * 100,
            "value": [float(i) for i in range(100)],
        }
    )
    pq.write_table(table, path, row_group_size=25)
    rows = [r for b in _read_rows(path, 30, 55) for r in b.to_pylist()]
    assert len(rows) == 25
    assert rows[0]["recordId"] == "rec-000000000030"
    assert rows[-1]["recordId"] == "rec-000000000054"
    ids = [json.loads(base64.b64decode(r["data"]))["id"] for r in rows]
    assert ids == list(range(30, 55))
    assert list(_read_rows(path, 100, 100)) == []


@settings(max_examples=80, deadline=None)
@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
            min_size=0,
            max_size=120,
        ),
        min_size=1,
        max_size=40,
    )
)
def test_vectorized_base64_matches_stdlib(texts):
    """The bulk numpy base64 must be byte-identical to per-row
    base64.b64encode for arbitrary utf-8 payloads (incl. empty strings and
    mixed lengths, which exercise the per-length-class packing)."""
    import pandas as pd

    from aws_localstack_stream_processing_spark.sources.firehose_datasource import (
        _b64_series,
    )

    s = pd.Series(texts)
    got = _b64_series(s).tolist()
    want = [base64.b64encode(t.encode("utf-8")).decode("ascii") for t in texts]
    assert got == want


def _mini_log_table(ids, values):
    return pa.table(
        {
            "event_id": ids,
            "ts": [None] * len(ids),
            "user_id": [1] * len(ids),
            "event_type": ["click"] * len(ids),
            "value": values,
        }
    )


def test_nan_value_serializes_as_json_null(tmp_path):
    path = str(tmp_path / "log.parquet")
    pq.write_table(_mini_log_table([1, 2], [3.5, None]), path)
    rows = [r for b in _read_rows(path, 0, 2) for r in b.to_pylist()]
    payloads = [json.loads(base64.b64decode(r["data"])) for r in rows]
    assert payloads[0]["value"] == 3.5
    assert payloads[1]["value"] is None  # NOT the invalid literal `nan`
    # and the raw text must be valid JSON null, not `"value":nan`
    assert b'"value":null' in base64.b64decode(rows[1]["data"])


def test_multi_file_log_plans_and_reads_across_files(tmp_path):
    """A put log is a DIRECTORY of objects (one per partition/hour in the
    reference, app.ts:400-411): global sequence numbers must span the
    sorted file list, ranges must open only overlapping files, and
    row-group pruning must still apply within each file."""
    from aws_localstack_stream_processing_spark.sources.firehose_datasource import (
        _num_rows,
        _plan_files,
    )

    log = tmp_path / "putlog"
    log.mkdir()
    sizes = [40, 25, 35]
    off = 0
    for i, n in enumerate(sizes):
        pq.write_table(
            _mini_log_table(list(range(off, off + n)), [float(x) for x in range(n)]),
            str(log / f"obj-{i}.parquet"),
            row_group_size=10,
        )
        off += n
    plan = _plan_files(str(log))
    assert [(p[1], p[2]) for p in plan] == [(0, 40), (40, 25), (65, 35)]
    assert _num_rows(str(log)) == 100
    # a range spanning the file-1/file-2 boundary
    rows = [r for b in _read_rows(str(log), 35, 72) for r in b.to_pylist()]
    assert len(rows) == 37
    assert rows[0]["recordId"] == "rec-000000000035"
    assert rows[-1]["recordId"] == "rec-000000000071"
    ids = [json.loads(base64.b64decode(r["data"]))["id"] for r in rows]
    assert ids == list(range(35, 72))  # event_id seeded == global seq
    # a range entirely inside the last file touches only that file
    rows = [r for b in _read_rows(str(log), 70, 80) for r in b.to_pylist()]
    assert [json.loads(base64.b64decode(r["data"]))["id"] for r in rows] == list(
        range(70, 80)
    )


def test_multi_file_log_stream_equals_batch(spark, tmp_path):
    log = tmp_path / "putlog"
    log.mkdir()
    off = 0
    for i, n in enumerate([30, 30, 17]):
        pq.write_table(
            _mini_log_table(list(range(off, off + n)), [float(x) for x in range(n)]),
            str(log / f"obj-{i}.parquet"),
        )
        off += n
    register_firehose_source(spark)
    batch = spark.read.format("firehose_sim").option("path", str(log)).load()
    assert batch.count() == 77
    q = (
        spark.readStream.format("firehose_sim")
        .option("path", str(log))
        .load()
        .writeStream.format("memory")
        .queryName("fh_multi")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = spark.table("fh_multi")
    assert streamed.count() == 77
    assert streamed.exceptAll(batch).count() == 0
    assert batch.exceptAll(streamed).count() == 0


@pytest.mark.parametrize("n", [1, 3, 8])
def test_partition_counts_respected(spark, n):
    register_firehose_source(spark)
    df = (
        spark.read.format("firehose_sim")
        .option("path", EVENTS)
        .option("numPartitions", n)
        .load()
    )
    assert df.rdd.getNumPartitions() == n
    assert df.count() == pq.ParquetFile(EVENTS).metadata.num_rows


def test_checkpoint_restart_resumes_growing_log(spark, tmp_path):
    """T8 replayability, restart edition: after a checkpointed run over a
    2-object log, a NEW object lands (the reference's one-object-per-
    partition/hour growth, app.ts:400-411) and the restarted query must
    deliver exactly the new rows — offsets resume from the checkpointed
    sequence number, no duplicates, no gaps."""
    log = tmp_path / "putlog"
    log.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out = tmp_path / "out"
    register_firehose_source(spark)

    def run_once():
        q = (
            spark.readStream.format("firehose_sim")
            .option("path", str(log))
            .load()
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    pq.write_table(_mini_log_table(list(range(0, 30)), [1.0] * 30), str(log / "obj-0.parquet"))
    pq.write_table(_mini_log_table(list(range(30, 50)), [2.0] * 20), str(log / "obj-1.parquet"))
    run_once()
    first = spark.read.parquet(str(out))
    assert first.count() == 50

    pq.write_table(_mini_log_table(list(range(50, 65)), [3.0] * 15), str(log / "obj-2.parquet"))
    run_once()
    ids = sorted(
        json.loads(base64.b64decode(r["data"]))["id"]
        for r in spark.read.parquet(str(out)).collect()
    )
    assert ids == list(range(65))  # every id exactly once, incl. the new 15


def test_prefix_fingerprint_append_stable_insert_detected(tmp_path):
    """Sequence-number stability contract: appending a file that sorts
    after the consumed prefix leaves the prefix fingerprint unchanged;
    a file sorting INTO the prefix changes it (the silent dup/drop case
    the checkpoint guard must catch)."""
    from aws_localstack_stream_processing_spark.sources.firehose_datasource import (
        _plan_files,
        _prefix_fingerprint,
    )

    log = tmp_path / "putlog"
    log.mkdir()
    pq.write_table(_mini_log_table([0, 1], [1.0, 1.0]), str(log / "obj-0.parquet"))
    pq.write_table(_mini_log_table([2, 3], [1.0, 1.0]), str(log / "obj-1.parquet"))
    consumed = 4
    fp0 = _prefix_fingerprint(_plan_files(str(log)), consumed)
    # lexicographic append: fingerprint of the consumed prefix is stable
    pq.write_table(_mini_log_table([4, 5], [1.0, 1.0]), str(log / "obj-2.parquet"))
    assert _prefix_fingerprint(_plan_files(str(log)), consumed) == fp0
    # mid-list insertion: 'obj-0a' sorts between obj-0 and obj-1
    pq.write_table(_mini_log_table([9], [1.0]), str(log / "obj-0a.parquet"))
    assert _prefix_fingerprint(_plan_files(str(log)), consumed) != fp0


def test_checkpoint_restart_rejects_midlist_insertion(spark, tmp_path):
    """A restart after an out-of-order object landed below the consumed
    watermark must fail LOUDLY (exactly-once guard), not silently
    re-address rows."""
    log = tmp_path / "putlog"
    log.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out = tmp_path / "out"
    register_firehose_source(spark)

    def run_once():
        q = (
            spark.readStream.format("firehose_sim")
            .option("path", str(log))
            .load()
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    pq.write_table(_mini_log_table(list(range(10)), [1.0] * 10), str(log / "obj-1.parquet"))
    run_once()
    assert spark.read.parquet(str(out)).count() == 10
    # a new object that sorts BEFORE the consumed one — the corruption case
    pq.write_table(_mini_log_table(list(range(10, 15)), [2.0] * 5), str(log / "obj-0.parquet"))
    with pytest.raises(Exception, match="BELOW the consumed watermark"):
        run_once()
