"""Reference-surface queries — one per operator group in SURVEY.md §2.

Each docstring cites the reference implementation (file:line under
/root/reference) whose *semantics* the query re-expresses Spark-first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import hashing
from .dialect import (
    b64_decode,
    b64_encode,
    dec_sum,
    intdiv,
    json_get,
    s,
    tbl,
    ts_str,
    views,
)
from .registry import query

# ---------------------------------------------------------------------------
# Ingest path: P1 base64-decode, P2 json-parse, P3 key-extraction fallback,
# P5 djb2, P6 modulo partition assignment (partitioner/index.js:17-23,40-83).
# ---------------------------------------------------------------------------


def _ingest_sql(d: str) -> str:
    # payload: ~10% of records omit `id` to exercise the whole-payload-hash
    # fallback (partitioner/index.js:49-51)
    payload = (
        f"CASE WHEN event_id % 10 = 7 "
        f"THEN concat('{{\"event_type\":\"', event_type, '\"}}') "
        f"ELSE concat('{{\"id\":', {s('event_id', d)}, "
        f"',\"event_type\":\"', event_type, '\"}}') END"
    )
    return f"""
WITH raw AS (
  SELECT event_id, {b64_encode(payload, d)} AS data FROM {tbl('events', d)}
), decoded AS (
  SELECT event_id, {b64_decode('data', d)} AS payload FROM raw
), keyed AS (
  SELECT event_id,
         COALESCE({json_get('payload', 'id', d)}, payload) AS rec_key
  FROM decoded
), assigned AS (
  SELECT rec_key,
         concat('partition_', {s(f"{hashing.djb2_js('rec_key', d)} % 5", d)}) AS partition
  FROM keyed
)
SELECT partition,
       CAST(COUNT(*) AS BIGINT) AS n_records,
       CAST(COUNT(DISTINCT rec_key) AS BIGINT) AS n_keys
FROM assigned
GROUP BY partition
"""


@query("ref_ingest_partition_assign", oracle=_ingest_sql("duck"), tags=("reference", "ingest"))
def ref_ingest_partition_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1 ingest path: decode → parse → key-extract → djb2 → partition_N.

    Reference: partitioner/index.js:40-83 (P1-P6, U1). The djb2 fold runs as
    a higher-order ``aggregate`` expression — JVM-side, no Python UDF. At
    scale the physical analogue is ``repartition(N, key)``; here we emit the
    logical partition label and its cardinality profile.
    """
    views(spark, sf_dir, "events")
    return spark.sql(_ingest_sql("spark"))


# ---------------------------------------------------------------------------
# Content-hash dedup: P4 canonical serialize, P7 sha256, O3/J3 exactly-once
# (signer/index.js:133-137,229-242; README.md:118-122).
# ---------------------------------------------------------------------------


def _content_hash_sql(d: str) -> str:
    canon = (
        f"concat_ws('|', {s('event_id', d)}, event_type, "
        f"{s('value', d)}, {s('user_id', d)})"
    )
    return f"""
WITH base AS (
  SELECT * FROM {tbl('events', d)}
  UNION ALL
  SELECT * FROM {tbl('events', d)} WHERE event_id % 5 = 0  -- simulated redelivery
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_delivered,
       CAST(COUNT(DISTINCT {hashing.sha256_hex(canon, d)}) AS BIGINT) AS n_signed
FROM base
GROUP BY event_type
"""


@query("ref_content_hash_dedup", oracle=_content_hash_sql("duck"), tags=("reference", "dedup"))
def ref_content_hash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once by content hash: at-least-once delivery (20% duplicated)
    collapses to one signature per sha256(canonical record).

    Reference: signer/index.js:133-137 (hash), 229-242 (PK overwrite).
    """
    views(spark, sf_dir, "events")
    return spark.sql(_content_hash_sql("spark"))


# ---------------------------------------------------------------------------
# Validity gate / DLQ split: F3 per-record try-parse, S4 error output
# (partitioner/index.js:43-80; app.ts:412).
# ---------------------------------------------------------------------------


def _validity_sql(d: str) -> str:
    if d == "spark":
        valid = "get_json_object(props_c, '$.k') IS NOT NULL"
    else:
        # CASE, not AND: DuckDB does not short-circuit AND, so
        # json_extract_string can hard-error on a malformed payload
        # before json_valid masks it (bit at sf0.1, not sf0.01 —
        # evaluation order is data-dependent)
        valid = (
            "(CASE WHEN json_valid(props_c) "
            "THEN json_extract_string(props_c, '$.k') END) IS NOT NULL"
        )
    return f"""
WITH base AS (
  SELECT event_id, event_type,
         CASE WHEN event_id % 97 = 0 THEN substr(props, 1, 3) ELSE props END AS props_c
  FROM {tbl('events', d)}
)
SELECT CASE WHEN {valid} THEN 'Ok' ELSE 'ProcessingFailed' END AS result,
       CAST(COUNT(*) AS BIGINT) AS n_records,
       CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types
FROM base
GROUP BY 1
"""


@query("ref_validity_split_dlq", oracle=_validity_sql("duck"), tags=("reference", "dlq"))
def ref_validity_split_dlq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-record validity gate: ~1% of payloads corrupted, split Ok vs
    ProcessingFailed (the DLQ path). Invariant |Ok| + |Failed| = |input|.

    Reference: partitioner/index.js:43-80; errorOutputPrefix app.ts:412.
    """
    views(spark, sf_dir, "events")
    return spark.sql(_validity_sql("spark"))


# ---------------------------------------------------------------------------
# Lookup joins: J1 key-ring lookup, J2 secret broadcast lookup
# (signer/index.js:82-122,151-193).
# ---------------------------------------------------------------------------


def _keyring_join_sql(d: str) -> str:
    addr = hashing.sha256_hex(f"concat('addr_', {s('a.s_suppkey', d)})", d)
    # Key ranks via an inequality self-join over the ~G-row ring (same
    # idiom as _lru_rotation_sql) — no partition-less window anywhere,
    # and the dim build stays trivially broadcastable.
    return f"""
WITH keys AS (
  SELECT a.s_suppkey AS key_id,
         CAST(COUNT(b.s_suppkey) AS BIGINT) AS key_rank,
         substr({addr}, 1, 40) AS address
  FROM {tbl('supplier', d)} a
  LEFT JOIN {tbl('supplier', d)} b ON b.s_suppkey < a.s_suppkey
  GROUP BY a.s_suppkey
), n AS (SELECT COUNT(*) AS n_keys FROM {tbl('supplier', d)})
SELECT k.key_id, k.address,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       {dec_sum('e.value')} AS sum_value
FROM {tbl('events', d)} e
CROSS JOIN n
JOIN keys k ON k.key_rank = e.event_id % n.n_keys
GROUP BY k.key_id, k.address
"""


@query("ref_keyring_lookup_join", oracle=_keyring_join_sql("duck"), tags=("reference", "join"))
def ref_keyring_lookup_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-ring + secret lookup as a broadcast equi-join: every event is
    routed to a key (supplier stands in for the 100-key ring) and joined to
    its derived address. Catalyst broadcasts the dim side automatically.

    Reference: signer/index.js:151-193 (J1), 82-122 (J2).
    """
    views(spark, sf_dir, "events", "supplier")
    return spark.sql(_keyring_join_sql("spark"))


# ---------------------------------------------------------------------------
# Windowed metric aggregations: A1 tumbling SUM, A2 tumbling AVG
# (app.ts:452-502).
# ---------------------------------------------------------------------------


def _minute_sum_sql(d: str) -> str:
    return f"""
SELECT {ts_str("date_trunc('minute', ts)", d)} AS minute,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       {dec_sum('value')} AS sum_value
FROM {tbl('events', d)}
GROUP BY 1, 2
"""


@query("ref_minute_sum", oracle=_minute_sum_sql("duck"), tags=("reference", "agg", "window"))
def ref_minute_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-minute tumbling SUM metrics (CloudWatch Sum analogue).

    Reference: app.ts:452-460,467-470,483-502. The decimal-addend sum makes
    the aggregate order-independent, so the plan is a plain partial+final
    hash aggregate at any scale.
    """
    views(spark, sf_dir, "events")
    return spark.sql(_minute_sum_sql("spark"))


def _minute_avg_sql(d: str) -> str:
    return f"""
SELECT {ts_str("date_trunc('minute', ts)", d)} AS minute,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ({dec_sum('value')} / COUNT(*)) AS avg_value
FROM {tbl('events', d)}
GROUP BY 1, 2
"""


@query("ref_minute_avg", oracle=_minute_avg_sql("duck"), tags=("reference", "agg", "window"))
def ref_minute_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-minute tumbling AVG metrics (CloudWatch Average analogue).

    Reference: app.ts:462-465,473-481.
    """
    views(spark, sf_dir, "events")
    return spark.sql(_minute_avg_sql("spark"))


# ---------------------------------------------------------------------------
# Threshold alarm over windowed agg: A3 (app.ts:547-588) — alarm fires when
# the metric exceeds the threshold for k consecutive evaluation periods.
# ---------------------------------------------------------------------------

_ALARM_THRESHOLD = 3  # events per (type, hour); ~2.8 expected at sf0.01


def _alarm_sql(d: str) -> str:
    return f"""
WITH per_hour AS (
  SELECT event_type, date_trunc('hour', ts) AS h, COUNT(*) AS n
  FROM {tbl('events', d)}
  GROUP BY 1, 2
), seq AS (
  SELECT event_type, h, n,
         LAG(n, 1) OVER (PARTITION BY event_type ORDER BY h) AS n_prev1,
         LAG(n, 2) OVER (PARTITION BY event_type ORDER BY h) AS n_prev2
  FROM per_hour
)
SELECT event_type, {ts_str('h', d)} AS hour, CAST(n AS BIGINT) AS n
FROM seq
WHERE n > {_ALARM_THRESHOLD} AND n_prev1 > {_ALARM_THRESHOLD} AND n_prev2 > {_ALARM_THRESHOLD}
"""


@query("ref_alarm_threshold", oracle=_alarm_sql("duck"), tags=("reference", "agg", "window"))
def ref_alarm_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold alarm: hours where the event count exceeded the threshold
    for 3 consecutive evaluation periods (window-over-window).

    Reference: app.ts:547-588 (evaluationPeriods semantics).
    """
    views(spark, sf_dir, "events")
    return spark.sql(_alarm_sql("spark"))


# ---------------------------------------------------------------------------
# LRU top-1 selection: A4/O1 (signer/index.js:164-170) — ORDER BY ASC LIMIT 1
# per group, deterministic tie-break.
# ---------------------------------------------------------------------------


def _lru_top1_sql(d: str) -> str:
    return f"""
SELECT event_type, event_id, {ts_str('ts', d)} AS first_ts
FROM (
  SELECT event_type, event_id, ts,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS rn
  FROM {tbl('events', d)}
) t
WHERE rn = 1
"""


@query("ref_lru_top1", oracle=_lru_top1_sql("duck"), tags=("reference", "topk"))
def ref_lru_top1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Least-recently-used selection: the earliest record per group
    (ORDER BY last_used_at ASC LIMIT 1 generalized to arg-min per group).

    Reference: signer/index.js:164-170. Physical plan: partial top-1 per
    partition then merge — no full sort at scale.
    """
    views(spark, sf_dir, "events")
    return spark.sql(_lru_top1_sql("spark"))


# ---------------------------------------------------------------------------
# Chunking: A5 (scripts/seed-keys.ts:68-81) — 1000 records per output chunk.
# ---------------------------------------------------------------------------


# Bucket width for two-phase global row numbering. Phase 1 computes
# ROW_NUMBER partitioned by an event_id range bucket (scale-safe: every
# window has a partition key); phase 2 turns per-bucket counts into
# global offsets with a tiny inequality self-join over one-row-per-bucket
# aggregates — no partition-less WindowExec anywhere in the plan. At
# 100 TB the width is a knob: pick it so bucket_count ~ 10^3..10^4 rows,
# which keeps the offset join trivially broadcastable.
_RN_BUCKET = 256


def _numbered_cte(d: str) -> str:
    """CTE chain ending in ``numbered(event_id, rn)`` — the global 0-based
    rank of event_id — built from partition-local row numbers plus a
    prefix-sum of per-bucket counts (two narrow passes, no global sort)."""
    return f"""
bucketed AS (
  SELECT event_id, {intdiv('event_id', str(_RN_BUCKET), d)} AS bkt
  FROM {tbl('events', d)}
),
local_rn AS (
  SELECT event_id, bkt,
         ROW_NUMBER() OVER (PARTITION BY bkt ORDER BY event_id) - 1 AS lrn
  FROM bucketed
),
bucket_counts AS (
  SELECT bkt, CAST(COUNT(*) AS BIGINT) AS cnt FROM bucketed GROUP BY bkt
),
offsets AS (
  SELECT a.bkt,
         CAST(COALESCE(SUM(CASE WHEN b.bkt < a.bkt THEN b.cnt END), 0)
              AS BIGINT) AS off
  FROM bucket_counts a LEFT JOIN bucket_counts b ON b.bkt < a.bkt
  GROUP BY a.bkt
),
numbered AS (
  SELECT l.event_id, CAST(o.off + l.lrn AS BIGINT) AS rn
  FROM local_rn l JOIN offsets o ON l.bkt = o.bkt
)"""


def _chunking_sql(d: str) -> str:
    return f"""
WITH {_numbered_cte(d)}
SELECT {intdiv('rn', '1000', d)} AS chunk,
       CAST(COUNT(*) AS BIGINT) AS n,
       MIN(event_id) AS min_id,
       MAX(event_id) AS max_id
FROM numbered
GROUP BY 1
"""


@query("ref_chunking", oracle=_chunking_sql("duck"), tags=("reference",))
def ref_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size chunking (1000 records/file) — seed-keys.ts:68-81. The
    batch analogue of ``write.option("maxRecordsPerFile", 1000)``.

    Global row numbers come from the two-phase scheme in
    :func:`_numbered_cte` (bucket-partitioned windows + offset join), so
    the plan contains no single-partition window and survives a 100×
    scale-up.
    """
    views(spark, sf_dir, "events")
    return spark.sql(_chunking_sql("spark"))


# ---------------------------------------------------------------------------
# Top-k: O1 (signer/index.js:167-168) — TakeOrderedAndProject.
# ---------------------------------------------------------------------------


def _topk_sql(d: str) -> str:
    return f"""
SELECT o_orderkey, o_custkey, o_totalprice
FROM {tbl('orders', d)}
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
"""


@query("ref_topk_orders", oracle=_topk_sql("duck"), tags=("reference", "topk"))
def ref_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT top-k. Spark executes as TakeOrderedAndProject
    (per-partition heap + driver merge — no global sort at scale).

    Reference: signer/index.js:167-168.
    """
    views(spark, sf_dir, "orders")
    return spark.sql(_topk_sql("spark"))


# ---------------------------------------------------------------------------
# LRU rotation, batch analogue of the stateful key ring: O2
# (signer/index.js:151-214; README.md:19).
# ---------------------------------------------------------------------------


def _lru_rotation_sql(d: str) -> str:
    return f"""
WITH {_numbered_cte(d)},
batched AS (
  SELECT event_id, {intdiv('rn', '100', d)} AS batch_id FROM numbered
), keys AS (
  SELECT a.s_suppkey AS key_id,
         CAST(COUNT(b.s_suppkey) AS BIGINT) AS key_rank
  FROM {tbl('supplier', d)} a
  LEFT JOIN {tbl('supplier', d)} b ON b.s_suppkey < a.s_suppkey
  GROUP BY a.s_suppkey
), n AS (SELECT COUNT(*) AS n_keys FROM {tbl('supplier', d)}),
batches AS (
  SELECT batch_id, COUNT(*) AS n_records FROM batched GROUP BY batch_id
)
SELECT b.batch_id, k.key_id, CAST(b.n_records AS BIGINT) AS n_records
FROM batches b
CROSS JOIN n
JOIN keys k ON k.key_rank = b.batch_id % n.n_keys
"""


@query("ref_lru_rotation", oracle=_lru_rotation_sql("duck"), tags=("reference", "stateful"))
def ref_lru_rotation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch analogue of the stateful LRU key ring: sequential batches of 100
    records round-robin over the key ring in rank order — with all keys
    seeded at distinct timestamps, true LRU selection degenerates to exactly
    this rotation. (The streaming stateful version lives in
    ``streaming.keyring``.)

    Batch ids derive from :func:`_numbered_cte`'s two-phase numbering and
    the key ranks from an inequality self-join over the ~G-row key ring,
    so no window in the plan runs single-partition.

    Reference: signer/index.js:151-214; README.md:19 ("one key per batch",
    LRU order).
    """
    views(spark, sf_dir, "events", "supplier")
    return spark.sql(_lru_rotation_sql("spark"))


# ---------------------------------------------------------------------------
# Set operations (engine surface; reference has none — SURVEY §2.5).
# ---------------------------------------------------------------------------


def _set_ops_sql(d: str) -> str:
    cust, orders = tbl("customer", d), tbl("orders", d)
    with_orders = (
        f"SELECT c_custkey FROM {cust} c WHERE EXISTS "
        f"(SELECT 1 FROM {orders} o WHERE o.o_custkey = c.c_custkey)"
    )
    high_bal = f"SELECT c_custkey FROM {cust} WHERE c_acctbal > 5000"
    no_orders = (
        f"SELECT c_custkey FROM {cust} c WHERE NOT EXISTS "
        f"(SELECT 1 FROM {orders} o WHERE o.o_custkey = c.c_custkey)"
    )
    return f"""
SELECT 'active_not_high_balance' AS op, c_custkey FROM (({with_orders}) EXCEPT ({high_bal})) t1
UNION ALL
SELECT 'active_and_high_balance' AS op, c_custkey FROM (({with_orders}) INTERSECT ({high_bal})) t2
UNION ALL
SELECT 'inactive' AS op, c_custkey FROM ({no_orders}) t3
"""


@query("ref_set_ops", oracle=_set_ops_sql("duck"), tags=("reference", "setops"))
def ref_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT / INTERSECT / UNION ALL plus semi/anti-join predicates
    (EXISTS / NOT EXISTS) over customer–orders."""
    views(spark, sf_dir, "customer", "orders")
    return spark.sql(_set_ops_sql("spark"))


# ---------------------------------------------------------------------------
# Redaction: P11/U5 (signer/index.js:51-63).
# ---------------------------------------------------------------------------


def _redact_sql(d: str) -> str:
    return f"""
SELECT event_id, event_type,
       '[REDACTED]' AS props,
       '[REDACTED]' AS user_ref,
       value
FROM {tbl('events', d)}
ORDER BY event_id
LIMIT 100
"""


@query("ref_redact", oracle=_redact_sql("duck"), tags=("reference", "projection"))
def ref_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column redaction/masking before logging (signer/index.js:51-63)."""
    views(spark, sf_dir, "events")
    return spark.sql(_redact_sql("spark"))
