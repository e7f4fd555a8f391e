"""Stateful LRU key ring — the genuinely custom operator (SURVEY §2.5 O2,
§2.6 T7; hardest-piece #1 in §7 Phase 3).

Reference semantics (signer/index.js:151-214, README.md:15-20):
- one key per processing batch;
- least-recently-used key selected (ORDER BY last_used_at ASC LIMIT 1);
- selecting a key updates its last_used_at → repeated selection round-robins
  the ring;
- no concurrent use of a key (Aurora FOR UPDATE SKIP LOCKED).

Spark re-expression: the ring lives in the Structured Streaming state store
(checkpointed — Aurora replaced by state), updated by a single
``applyInPandasWithState`` group. A single group serializes key assignment
exactly like the reference's single keyring table; horizontal scale comes
from sharding into G independent rings (``ring_id = hash(...) % G``) —
partition affinity guarantees no two tasks share a ring, which replaces
FOR UPDATE SKIP LOCKED with no locks at all (SURVEY §2.5 O4).
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "batch_id long, key_id long, n_records long"
STATE_SCHEMA = "state_json string"


def _assign_batches(
    pdf: pd.DataFrame, st: dict, key_ids: list[int], batch_size: int
) -> list[tuple[int, int, int]]:
    """Chunk rows (ordered by event_id) into processing batches and assign
    each the current LRU key. ``last_used`` is a logical clock so rotation
    is deterministic; ties break on key_id (stable for the seeded ring)."""
    out = []
    n = len(pdf)
    pos = 0
    ring = st["ring"]  # list of [key_id, last_used]
    while pos < n:
        take = min(batch_size, n - pos)
        i = min(range(len(ring)), key=lambda j: (ring[j][1], ring[j][0]))
        key_id = ring[i][0]
        st["clock"] += 1
        ring[i][1] = len(key_ids) + st["clock"]
        out.append((st["batches"], key_id, take))
        st["batches"] += 1
        pos += take
    return out


def lru_keyring_assign(
    events: DataFrame, key_ids: list[int], batch_size: int = 100
) -> DataFrame:
    """Streaming stateful operator: (batch_id, key_id, n_records) per
    processing batch, LRU rotation persisted across micro-batches."""

    def fn(key, pdfs, state: GroupState):
        if state.exists:
            st = json.loads(state.get[0])
        else:
            # seed: every key "last used" at its rank → LRU order = rank order
            st = {
                "ring": [[kid, rank] for rank, kid in enumerate(sorted(key_ids))],
                "clock": 0,
                "batches": 0,
            }
        rows = pd.concat(list(pdfs)) if pdfs else pd.DataFrame({"event_id": []})
        rows = rows.sort_values("event_id")
        out = _assign_batches(rows, st, key_ids, batch_size)
        state.update((json.dumps(st),))
        yield pd.DataFrame(out, columns=["batch_id", "key_id", "n_records"])

    return (
        events.select("event_id")
        .withColumn("ring_id", F.lit(0))  # shard key: hash(...) % G at scale
        .groupBy("ring_id")
        .applyInPandasWithState(
            fn,
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )
