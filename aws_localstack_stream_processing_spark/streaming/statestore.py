"""State-store provider selection for streaming queries.

A 100 TB deployment does not run stateful streaming on the default
HDFS-backed provider (state lives on the executor JVM heap, bounded by
executor memory and GC); it runs ``RocksDBStateStoreProvider`` — native
off-heap state with changelog checkpointing, the store the reference's
Aurora-backed keyed state maps onto (reference `signer/index.js:151-214`
keeps signer state in a relational store precisely because Lambda has no
durable local state; Spark's RocksDB store is the engine-native
equivalent). Spark 4 bundles it (``rocksdbjni`` on the classpath), so the
engine exposes it as a first-class switch:

``SPARK_GRAFT_STATE_STORE=rocksdb``  → RocksDBStateStoreProvider
``SPARK_GRAFT_STATE_STORE=hdfs``     → HDFSBackedStateStoreProvider
unset/empty                           → leave the session's setting alone
                                        (Spark default = HDFS-backed)

The conf is captured per streaming query AT START, so ``apply`` is called
at every ``writeStream...start()`` site in the package — session-wide
mutation just before start is the supported per-query injection point.
Every stateful streaming pin (watermark trilogy, both chains, the triple
chain, the LRU ring, kv/alarm sinks) runs green under both providers —
``tests/test_rocksdb_state.py`` pins that equivalence plus the RocksDB
state-metric curves.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_CONF = "spark.sql.streaming.stateStore.providerClass"
_PREFIX = "org.apache.spark.sql.execution.streaming.state."
PROVIDERS = {
    "rocksdb": _PREFIX + "RocksDBStateStoreProvider",
    "hdfs": _PREFIX + "HDFSBackedStateStoreProvider",
}


def state_store_choice() -> str:
    """The env-selected provider key ('' when unset → Spark default)."""
    return os.environ.get("SPARK_GRAFT_STATE_STORE", "").strip().lower()


def checkpoint_provider(checkpoint_location: str) -> str | None:
    """The state-store provider class an EXISTING streaming checkpoint was
    written under, read from its offset log (each ``offsets/<N>`` entry's
    second line is the OffsetSeqMetadata JSON, whose ``conf`` map pins the
    checkpoint-scoped session confs — provider class among them).

    Why this matters (VERDICT r10 #5): Spark does NOT fail a restart whose
    session conf names a different provider — it silently RESTORES the
    checkpointed provider and keeps running on the old store (pinned in
    ``tests/test_rocksdb_state.py``), so an operator who flipped
    ``SPARK_GRAFT_STATE_STORE=rocksdb`` and restarted in place would
    believe they migrated while every byte of state still lives on the
    JVM heap. Returns None when no offset entry exists yet (a fresh
    checkpoint) or the log is unreadable.
    """
    import glob
    import json

    entries = [
        (int(os.path.basename(f)), f)
        for f in glob.glob(os.path.join(checkpoint_location, "offsets", "*"))
        if os.path.basename(f).isdigit()
    ]
    if not entries:
        return None
    try:
        with open(max(entries)[1]) as fh:
            lines = fh.read().splitlines()
        meta = json.loads(lines[1])
        return (meta.get("conf") or {}).get(_CONF)
    except (OSError, ValueError, IndexError):
        return None


def apply_state_store(
    spark: SparkSession, checkpoint_location: str | None = None
) -> None:
    """Point the session at the env-selected state-store provider.

    No-op when ``SPARK_GRAFT_STATE_STORE`` is unset, so ordinary runs keep
    whatever the session (or a test fixture) configured. Unknown values
    raise rather than silently running on the wrong store — a state-store
    A/B that quietly tested the default proves nothing.

    Migration guard (VERDICT r10 #5): when ``checkpoint_location`` is
    given and already holds committed batches written under a DIFFERENT
    provider, raise instead of starting — Spark itself would silently
    restore the old provider from the checkpoint (no corruption, but no
    migration either, and no error). The supported migration is the
    replay runbook (PLANS.md round-11): drain the stream at a batch
    boundary, start a FRESH checkpoint under the new provider, rebuild
    state by replaying from the lake (T8 — the lake is the replayable
    source of record, ``streaming/source.py``).
    """
    choice = state_store_choice()
    if not choice:
        return
    try:
        target = PROVIDERS[choice]
    except KeyError:
        raise ValueError(
            f"SPARK_GRAFT_STATE_STORE={choice!r}: expected one of "
            f"{sorted(PROVIDERS)} or unset"
        ) from None
    if checkpoint_location:
        recorded = checkpoint_provider(checkpoint_location)
        if recorded and recorded != target:
            raise RuntimeError(
                f"state-store migration blocked: checkpoint "
                f"{checkpoint_location} was written under {recorded}, but "
                f"SPARK_GRAFT_STATE_STORE={choice!r} selects {target}. "
                f"Spark cannot change provider mid-checkpoint (a restart "
                f"would silently keep {recorded}). Runbook: drain the "
                f"stream, start a FRESH checkpoint under the new provider, "
                f"and replay from the lake (PLANS.md round-11, T8)."
            )
    spark.conf.set(_CONF, target)


def rocksdb_available(spark: SparkSession) -> bool:
    """True when the bundled RocksDB JNI native library actually loads in
    this environment (jar-on-classpath alone doesn't prove the .so
    extracts and links on this libc)."""
    try:
        jvm = spark.sparkContext._jvm
        jvm.org.rocksdb.RocksDB.loadLibrary()
        return True
    except Exception:
        return False
