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


def apply_state_store(spark: SparkSession) -> None:
    """Point the session at the env-selected state-store provider.

    No-op when ``SPARK_GRAFT_STATE_STORE`` is unset, so ordinary runs keep
    whatever the session (or a test fixture) configured. Unknown values
    raise rather than silently running on the wrong store — a state-store
    A/B that quietly tested the default proves nothing.
    """
    choice = state_store_choice()
    if not choice:
        return
    try:
        spark.conf.set(_CONF, PROVIDERS[choice])
    except KeyError:
        raise ValueError(
            f"SPARK_GRAFT_STATE_STORE={choice!r}: expected one of "
            f"{sorted(PROVIDERS)} or unset"
        ) from None


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
