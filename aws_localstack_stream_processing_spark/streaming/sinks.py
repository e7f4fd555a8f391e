"""Keyed idempotent sinks (SURVEY §2.1 S8, §2.6 T2).

The reference's signature store is a DynamoDB put keyed by content hash
(signer/index.js:229-242): re-delivery overwrites the same item, so the
store converges no matter how many times a record arrives. This module
gives the engine that semantics over a parquet-backed keyed table: the
``foreachBatch`` upserter anti-joins each batch against the existing keys
and appends only unseen ones — convergent even when the *checkpoint* is
lost (a strictly stronger property than checkpoint-based exactly-once,
which this composes with).

At warehouse scale the anti-join is a broadcast of the batch's keys against
the key column of the sink (or a MERGE on a Delta/Iceberg table — same
logical contract, swap the implementation here).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


class KeyedParquetSink:
    """Append-only parquet table that behaves like a keyed KV store.

    Contract: ``key_col`` is a non-null content hash (the reference's
    DynamoDB PK, signer/index.js:229-242) — a NULL key has no bucket
    (``xxhash64(NULL)`` is NULL) and would bypass the probe.

    Layout: hash-bucketed by key — every row lands in partition
    ``__bucket = pmod(xxhash64(key), N_BUCKETS)``. The put-if-absent
    probe then reads ONLY the buckets the batch's keys can live in
    (hive partition pruning), so per-batch probe cost is
    O(store/N_BUCKETS × affected buckets), not O(store) — the same
    layout lever ``Scd2ParquetSink`` uses for its MERGE, applied to the
    read side. At 100 TB this is the difference between a full store
    scan per micro-batch and a bounded bucket probe; N_BUCKETS scales
    with store size exactly like Delta/Iceberg bucket counts.
    """

    N_BUCKETS = 16
    BUCKET_COL = "__bucket"

    def __init__(self, path: str, key_col: str):
        self.path = path
        self.key_col = key_col

    def exists(self, spark: SparkSession) -> bool:
        return os.path.isdir(self.path) and any(
            f.startswith(f"{self.BUCKET_COL}=") for f in os.listdir(self.path)
        )

    def _bucket_expr(self):
        from pyspark.sql import functions as F

        return F.pmod(
            F.xxhash64(F.col(self.key_col)), F.lit(self.N_BUCKETS)
        ).cast("int")

    @staticmethod
    def probe_plan(seen: DataFrame, fresh: DataFrame, key_col: str) -> DataFrame:
        """The put-if-absent probe's pure plan (plan-lintable, like
        ``Scd2ParquetSink.merge_plan``): given the store's key column
        (already bucket-pruned) and the deduped batch, return the
        batch rows whose keys are NOT in the store.

        Broadcast direction matters at scale (r10, found by the plan
        audit that fixed the SCD2 merge): the naive
        ``fresh LEFT ANTI store`` plans as ``BroadcastHashJoin LeftAnti
        BuildRight`` — Spark can only build the RIGHT side of an anti
        join, so every micro-batch would broadcast the STORE's whole
        key column, which grows without bound. Instead: two joins that
        only ever broadcast batch-sized sets — the store is probed with
        a semi join against the BROADCAST batch keys (the Bloom-filter
        shape — one store scan, no store shuffle, no store broadcast;
        ≤|batch| rows survive), then the batch anti-joins that tiny hit
        set. Plan shape pinned in ``tests/test_sinks_metrics.py``.
        """
        from pyspark.sql import functions as F

        hits = seen.join(
            F.broadcast(fresh.select(key_col)), key_col, "left_semi"
        ).distinct()
        return fresh.join(F.broadcast(hits), key_col, "left_anti")

    def upsert_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """foreachBatch hook: put-if-absent per key.

        Within-batch duplicates collapse first (last write wins is
        irrelevant here: same key ⇒ same payload, PK = content hash);
        cross-batch and cross-run duplicates drop via the bucket-pruned
        probe (:meth:`probe_plan`) — affected buckets are a bounded
        driver collect (≤ N_BUCKETS values), the store read prunes to
        those hive partitions, and only batch-sized key sets ever ride
        a broadcast.
        """
        from pyspark.sql import functions as F

        spark = batch_df.sparkSession
        fresh = batch_df.dropDuplicates([self.key_col]).withColumn(
            self.BUCKET_COL, self._bucket_expr()
        )
        if self.exists(spark):
            buckets = [
                r[0]
                for r in fresh.select(self.BUCKET_COL).distinct().collect()
            ]
            seen = (
                spark.read.parquet(self.path)
                .filter(F.col(self.BUCKET_COL).isin(buckets))
                .select(self.key_col)
            )
            fresh = self.probe_plan(seen, fresh, self.key_col)
        fresh.write.mode("append").partitionBy(self.BUCKET_COL).parquet(
            self.path
        )

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.path).drop(self.BUCKET_COL)

    def compact(
        self, spark: SparkSession, max_files_per_bucket: int = 8
    ) -> list[int]:
        """Bucket-local small-file compaction.

        An append-only bucketed store accrues one file per (batch,
        bucket); after B batches every probe of a bucket opens ~B tiny
        files — the classic streaming-sink small-files problem (at
        100 TB: footer reads and NameNode/listing pressure dominate).
        Rewrite each bucket whose file count exceeds the threshold into
        a single file, bucket-locally: rows only move WITHIN their
        bucket (one exchange keyed on the bucket column routes each
        bucket to one task — the same job shape as a Delta OPTIMIZE
        over selected partitions), and untouched buckets are not
        rewritten (dynamic partition overwrite). The put-if-absent
        contract is unchanged — same keys, same buckets, fewer files.

        Bucket file counts come from a driver-side directory listing
        (bounded: N_BUCKETS entries); at warehouse scale that listing
        is the table manifest. Returns the compacted bucket ids.

        Crash tolerance: the rewrite rides Spark's dynamic-partition-
        overwrite committer (stage, then swap per partition); a crash
        mid-commit can leave an affected bucket with the old files
        removed — plain-parquet overwrite has no metadata transaction.
        Compaction is safe to re-run (idempotent given the same
        inputs), but a production deployment puts this behind a
        metadata-commit table format (Delta/Iceberg OPTIMIZE) or the
        manifest pattern ``sources/manifest_datasource.py``
        demonstrates, where readers only see marker-committed files.
        """
        import glob

        from pyspark.sql import functions as F

        todo = [
            b
            for b in range(self.N_BUCKETS)
            if len(
                glob.glob(
                    os.path.join(
                        self.path, f"{self.BUCKET_COL}={b}", "*.parquet"
                    )
                )
            )
            > max_files_per_bucket
        ]
        if not todo:
            return []
        merged = (
            spark.read.parquet(self.path)
            .filter(F.col(self.BUCKET_COL).isin(todo))
            .repartition(F.col(self.BUCKET_COL))
        )
        # cut lineage from self.path BEFORE overwriting it (Spark forbids
        # read-and-overwrite of the same path in one job — the same
        # discipline as Scd2ParquetSink.merge_batch)
        out = merged.localCheckpoint(eager=True)
        prev_mode = spark.conf.get(
            "spark.sql.sources.partitionOverwriteMode"
        )
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            out.write.mode("overwrite").partitionBy(self.BUCKET_COL).parquet(
                self.path
            )
        finally:
            spark.conf.set(
                "spark.sql.sources.partitionOverwriteMode", prev_mode
            )
        return todo


class Scd2ParquetSink:
    """Streaming CDC → type-2 history MERGE (SURVEY §2.1 S8 extended).

    The reference's keyed sink keeps only the LATEST value per key
    (DynamoDB put, signer/index.js:229-242); this sink is that write path
    upgraded to history-keeping: each micro-batch of change records is
    merged into a bucket-partitioned parquet SCD2 table (one row per
    (user, attribute-run) with ``valid_from_s``/``valid_to_s``/
    ``is_current`` — the exact semantics ``lake_scd2_build`` pins in
    batch), maintained incrementally instead of rebuilt from the full
    changelog.

    MERGE algorithm per batch (copy-on-write over AFFECTED BUCKETS only —
    the plain-parquet rendition of a Delta/Iceberg MERGE):
      1. affected buckets = distinct ``pmod(user_id, N_BUCKETS)`` in the
         batch (bounded driver collect: ≤ N_BUCKETS values);
      2. the existing history rows of those buckets are read back as
         change records — a version row IS its opening change
         ``(user_id, attr, valid_from_s, event_id)``;
      3. union with the batch's change records, absorb at-least-once
         redelivery by exact-key dedup on ``(user_id, ts_s, event_id)``;
      4. run-collapse (LAG) drops consecutive same-value records, then
         ROW_NUMBER/LEAD rebuild version numbers and validity intervals —
         every window partitions on ``user_id``, one hash exchange;
      5. dynamic-partition-overwrite writes ONLY the affected buckets.

    Correctness contract: exact under per-key in-order delivery of NEW
    change records plus arbitrary exact-duplicate redelivery — what a
    binlog/stream-shard CDC source provides per key. A genuinely novel
    out-of-order record (older than an already-merged one) can land
    between a version row and a record the collapse dropped, whose
    reappearance the changes-only history cannot reconstruct; that case
    needs the full-changelog rebuild (``lake_scd2_build``) or raw-event
    retention — documented, not silently wrong, and the staged harness
    never ships one.

    Idempotence: the merge is a deterministic function of
    (existing history ∪ batch records), and redelivered batches dedup to
    a no-op — so a restart that replays a committed batch, or a full
    replay over a populated table with a fresh checkpoint, converges to
    the same table (pinned in ``tests/test_cdc_scd2.py``).

    Scale: each batch touches |affected buckets| partitions, reads back
    only those buckets' history (at 100 TB: partition-pruned scan), and
    shuffles once on ``user_id``. Bucket count trades write amplification
    against small files exactly like Delta MERGE file sizing; the
    ``localCheckpoint`` materializes the merge result before the
    overwrite job deletes the files it was derived from (Spark forbids
    read-and-overwrite of the same path in one job)."""

    N_BUCKETS = 8

    def __init__(self, path: str):
        self.path = path

    def exists(self) -> bool:
        import glob

        return bool(glob.glob(os.path.join(self.path, "bucket=*")))

    @staticmethod
    def merge_plan(cand: DataFrame) -> DataFrame:
        """The MERGE's pure plan: change records (columns ``user_id,
        attr, ts_s, event_id, bucket`` — new candidates already unioned
        with the affected buckets' read-back history) → rebuilt version
        rows. Exposed separately from :meth:`merge_batch` so its shape
        is plan-lintable like every registered query: exact-duplicate
        dedup, LAG run-collapse, and ROW_NUMBER/LEAD reversioning ALL
        partition on ``user_id`` — one hash exchange end to end, no
        global window (pinned in ``tests/test_cdc_scd2.py``).

        The dedup is LAG-based rather than ``dropDuplicates``: exact
        copies share the full ``(user_id, ts_s, event_id)`` key, so in
        the user-partitioned (ts_s, event_id) ordering every copy is
        ADJACENT to another and a lag-equality filter removes all but
        one (k identical rows: each of rows 2..k sees an identical
        predecessor — lag reads the pre-filter sequence). A
        ``dropDuplicates`` would shuffle on the 3-column key and the
        windows would shuffle AGAIN on user_id; the lag form rides the
        windows' own exchange (plan-pinned: exactly one
        hashpartitioning — found when the shape test caught the
        two-exchange version)."""
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        w = Window.partitionBy("user_id").orderBy("ts_s", "event_id")
        deduped = (
            cand.withColumn(
                "same_key",
                F.lag("ts_s").over(w).eqNullSafe(F.col("ts_s"))
                & F.lag("event_id").over(w).eqNullSafe(F.col("event_id")),
            )
            .filter(~F.col("same_key"))
            .drop("same_key")
        )
        collapsed = (
            deduped.withColumn("prev_attr", F.lag("attr").over(w))
            .filter(
                F.col("prev_attr").isNull()
                | (F.col("prev_attr") != F.col("attr"))
            )
            .drop("prev_attr")
        )
        return collapsed.select(
            "user_id",
            "attr",
            F.row_number().over(w).cast("bigint").alias("version_n"),
            F.col("ts_s").alias("valid_from_s"),
            F.lead("ts_s").over(w).alias("valid_to_s"),
            "event_id",
            "bucket",
        ).withColumn("is_current", F.col("valid_to_s").isNull())

    def merge_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F

        spark = batch_df.sparkSession
        cand = batch_df.select(
            "user_id", "attr", "ts_s", "event_id"
        ).withColumn(
            "bucket", F.pmod("user_id", F.lit(self.N_BUCKETS)).cast("int")
        )
        buckets = [
            r.bucket for r in cand.select("bucket").distinct().collect()
        ]
        if not buckets:
            return
        if self.exists():
            old = (
                spark.read.parquet(self.path)
                .filter(F.col("bucket").isin(buckets))
                .select(
                    "user_id",
                    "attr",
                    F.col("valid_from_s").alias("ts_s"),
                    "event_id",
                    "bucket",
                )
            )
            cand = cand.unionByName(old)
        versioned = self.merge_plan(cand)
        # cut lineage from self.path BEFORE overwriting it
        out = versioned.localCheckpoint(eager=True)
        prev_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            out.write.mode("overwrite").partitionBy("bucket").parquet(
                self.path
            )
        finally:
            spark.conf.set(
                "spark.sql.sources.partitionOverwriteMode", prev_mode
            )

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.path)
