"""Keyring ring-rebalance runbook, G→2G (r13, VERDICT r12 #8).

The G-way sharded LRU ring is the one stateful operator with topology
baked into its state key (``ring_id = event_id % G``, ownership
``key_id % G``); at 100 TB G must grow. This pins the operator story,
mirroring the state-store provider migration runbook
(``test_rocksdb_state.py``):

1. WHY the guard exists: restarting an existing checkpoint with a larger
   G actually runs — and actually breaks mutual exclusion (a moved key
   rotated by two rings at once), observed live with the guard bypassed.
2. FAIL LOUDLY: ``guard_ring_topology`` raises on the ring-count change.
3. RECIPE: drain → fresh checkpoint at G'=2G → full replay from the
   lake converges to a valid G'-ring rotation — disjoint + complete key
   ownership, no record lost.
"""

from __future__ import annotations

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F

from aws_localstack_stream_processing_spark.streaming.keyring import (
    guard_ring_topology,
    lru_keyring_assign,
    ring_of_key,
)

G = 2
G2 = 4
KEY_IDS = list(range(8))
BATCH = 10
N_SLICES = 3
ROWS_PER_SLICE = 60


def _add_slices(spark, tmp_path, src, lo, hi):
    for k in range(lo, hi):
        tmp = str(tmp_path / f"stage{k}")
        (
            spark.range(k * ROWS_PER_SLICE, (k + 1) * ROWS_PER_SLICE)
            .select(F.col("id").alias("event_id"))
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(tmp)
        )
        shutil.move(
            glob.glob(f"{tmp}/part-*.parquet")[0], f"{src}/f{k}.parquet"
        )
        shutil.rmtree(tmp)


def _run(spark, src, ckpt, out_dir, n_rings):
    ev = (
        spark.readStream.schema("event_id BIGINT")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        lru_keyring_assign(ev, KEY_IDS, batch_size=BATCH, n_rings=n_rings)
        .writeStream.foreachBatch(
            lambda b, i: b.write.mode("append").parquet(out_dir)
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        [
            (r.ring_id, r.batch_id, r.key_id, r.n_records)
            for r in spark.read.parquet(out_dir).collect()
        ]
        if os.path.isdir(out_dir)
        else []
    )


def _assert_valid_rotation(rows, n_rings, n_events):
    used_in = {}
    for ring_id, _, key_id, _ in rows:
        used_in.setdefault(key_id, set()).add(ring_id)
    # disjoint: every used key is rotated by exactly its owning ring
    assert used_in and all(
        rings == {ring_of_key(k, n_rings)} for k, rings in used_in.items()
    )
    # complete: no record lost in the sharding
    assert sum(n for _, _, _, n in rows) == n_events


def test_reshard_runbook_guard_breakage_and_replay(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    ckpt = str(tmp_path / "ckpt_g2")

    # phase 1: G=2 stream over 3 slices, topology recorded
    guard_ring_topology(ckpt, G)
    _add_slices(spark, tmp_path, src, 0, N_SLICES)
    rows = _run(spark, src, ckpt, str(tmp_path / "out1"), G)
    _assert_valid_rotation(rows, G, N_SLICES * ROWS_PER_SLICE)

    # same-G restart over new data is an ordinary restart: guard silent
    guard_ring_topology(ckpt, G)
    _add_slices(spark, tmp_path, src, N_SLICES, 2 * N_SLICES)
    rows = _run(spark, src, ckpt, str(tmp_path / "out1"), G)
    _assert_valid_rotation(rows, G, 2 * N_SLICES * ROWS_PER_SLICE)

    # phase 2 — WHY: bypass the guard, restart the SAME checkpoint at
    # G'=4. Rings 0..1 restore old-topology key lists, rings 2..3 seed
    # fresh — a moved key (key_id % 4 in {2,3}) is rotated by two rings
    # at once: the mutual-exclusion contract is silently broken.
    _add_slices(spark, tmp_path, src, 2 * N_SLICES, 3 * N_SLICES)
    rows = _run(spark, src, ckpt, str(tmp_path / "out1"), G2)
    used_in = {}
    for ring_id, _, key_id, _ in rows:
        used_in.setdefault(key_id, set()).add(ring_id)
    violations = {
        k: rings
        for k, rings in used_in.items()
        if rings != {ring_of_key(k, G2)}
    }
    assert violations, (
        "expected the bypassed in-place reshard to break key ownership; "
        "if Spark starts refusing this restart, the guard can be retired"
    )

    # phase 3 — FAIL LOUDLY: the guard blocks exactly this restart
    with pytest.raises(RuntimeError, match="reshard blocked"):
        guard_ring_topology(ckpt, G2)

    # phase 4 — RECIPE: drain, FRESH checkpoint at G'=4, replay the full
    # source from the lake; converges to a valid 4-ring rotation
    ckpt2 = str(tmp_path / "ckpt_g4")
    guard_ring_topology(ckpt2, G2)
    rows = _run(spark, src, ckpt2, str(tmp_path / "out2"), G2)
    _assert_valid_rotation(rows, G2, 3 * N_SLICES * ROWS_PER_SLICE)
    # every ring that handed out keys only ever used its own subset —
    # and with 9 slices every new ring was exercised
    assert {r for r, _, _, _ in rows} == set(range(G2))
    shutil.rmtree(str(tmp_path), ignore_errors=True)
