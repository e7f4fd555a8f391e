"""The reference's five challenge invariants (README.md:15-20), asserted
end-to-end against the engine's pipelines — the correctness oracle the
reference itself defines:

1. every record is signed exactly once (no double-signing);
2. a key is never used concurrently;
3. one key per processing batch;
4. keys rotate in least-recently-used order;
5. batch size is configurable and respected.
"""

from __future__ import annotations

from .conftest import SF_DIR

BATCH = 100


def _assignments(spark):
    from aws_localstack_stream_processing_spark.catalog import load_table
    from aws_localstack_stream_processing_spark.plans.streaming_surface import (
        _to_memory,
    )
    from aws_localstack_stream_processing_spark.streaming.keyring import (
        lru_keyring_assign,
    )
    from aws_localstack_stream_processing_spark.streaming.source import events_stream

    key_ids = sorted(
        r.s_suppkey
        for r in load_table(spark, SF_DIR, "supplier").select("s_suppkey").collect()
    )
    ev = events_stream(spark, SF_DIR)
    sunk = _to_memory(lru_keyring_assign(ev, key_ids, batch_size=BATCH), "append")
    rows = sorted(
        ((r.batch_id, r.key_id, r.n_records) for r in sunk.collect())
    )
    return key_ids, rows


def test_invariants_1_and_5_signed_once_batch_size(spark, tmp_path):
    """#1: replaying the signing pipeline adds nothing and the sink is
    unique per content hash. #5: every processing batch holds <= BATCH
    records and all but the final batch are full."""
    from aws_localstack_stream_processing_spark.streaming.jobs import (
        run_signing_stream,
    )

    sink, ckpt = f"{tmp_path}/sink", f"{tmp_path}/ckpt"
    run_signing_stream(spark, SF_DIR, sink, ckpt)
    df = spark.read.parquet(sink)
    n_events = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    assert df.count() == n_events  # every record signed
    assert df.select("tx_hash").distinct().count() == n_events  # exactly once

    key_ids, rows = _assignments(spark)
    sizes = [n for _, _, n in rows]
    assert sum(sizes) == n_events
    assert all(n <= BATCH for n in sizes)
    assert all(n == BATCH for n in sizes[:-1])  # only the tail may be short


def test_invariants_2_3_4_key_rotation(spark):
    """#3: each batch carries exactly one key. #4: the seeded ring rotates
    in strict LRU (round-robin) order. #2: within any window of |ring|
    consecutive batches no key repeats — the serialized ring never hands a
    key out again before every other key was used (no concurrent use)."""
    key_ids, rows = _assignments(spark)
    batch_ids = [b for b, _, _ in rows]
    keys = [k for _, k, _ in rows]
    n = len(key_ids)

    assert batch_ids == list(range(len(rows)))  # one key per batch, dense ids
    # LRU with a rank-seeded ring degenerates to exact round-robin
    assert keys == [key_ids[i % n] for i in range(len(keys))]
    # no key reused inside any n-batch window
    for i in range(len(keys) - n + 1):
        window = keys[i : i + n]
        assert len(set(window)) == n, f"key reuse within window at {i}"


def test_sharded_rings_disjoint_and_complete(spark):
    """O4 at scale: with G rings, every key belongs to exactly one ring
    (no key can ever be used by two assignment lines — the lock-free
    replacement for FOR UPDATE SKIP LOCKED), every ring only hands out its
    own keys, rotation within each ring is still round-robin over the
    ring's key subset, and no record is lost in the sharding."""
    from aws_localstack_stream_processing_spark.catalog import load_table
    from aws_localstack_stream_processing_spark.plans.streaming_surface import (
        _to_memory,
    )
    from aws_localstack_stream_processing_spark.streaming.keyring import (
        lru_keyring_assign,
        ring_of_key,
    )
    from aws_localstack_stream_processing_spark.streaming.source import events_stream

    G = 4
    key_ids = sorted(
        r.s_suppkey
        for r in load_table(spark, SF_DIR, "supplier").select("s_suppkey").collect()
    )
    ev = events_stream(spark, SF_DIR)
    sunk = _to_memory(
        lru_keyring_assign(ev, key_ids, batch_size=BATCH, n_rings=G), "append"
    )
    rows = [(r.ring_id, r.batch_id, r.key_id, r.n_records) for r in sunk.collect()]

    # disjointness: a key only ever appears in its owning ring
    used_in = {}
    for ring_id, _, key_id, _ in rows:
        used_in.setdefault(key_id, set()).add(ring_id)
    assert all(len(rings) == 1 for rings in used_in.values())
    assert all(
        rings == {ring_of_key(k, G)} for k, rings in used_in.items()
    )

    # completeness: the sharding loses no records
    n_events = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    assert sum(n for _, _, _, n in rows) == n_events

    # per-ring rotation is round-robin over the ring's own keys
    for g in range(G):
        ring_keys = [k for k in key_ids if ring_of_key(k, G) == g]
        seq = [k for ring_id, b, k, _ in sorted(rows) if ring_id == g]
        assert seq == [ring_keys[i % len(ring_keys)] for i in range(len(seq))]


def test_lindley_closed_form_equals_recursion():
    """The SLO backtest's window construction rests on the Lindley
    identity q(t) = cum(t) - min_{u<=t} cum(u) (with cum(0)=0) being
    exactly the recursion q(t) = max(0, q(t-1) + a(t) - c). Pin the
    identity itself with hypothesis so the SQL's correctness reduces to
    the (oracle-checked) window arithmetic."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(
        arrivals=st.lists(st.integers(min_value=0, max_value=50), max_size=60),
        c=st.integers(min_value=1, max_value=20),
    )
    def check(arrivals, c):
        q_rec, cum, prefix_min, q_closed = 0, 0, 0, []
        expected = []
        for a in arrivals:
            q_rec = max(0, q_rec + a - c)
            expected.append(q_rec)
            cum += a - c
            prefix_min = min(prefix_min, cum)
            q_closed.append(cum - min(0, prefix_min))
        assert q_closed == expected

    check()
