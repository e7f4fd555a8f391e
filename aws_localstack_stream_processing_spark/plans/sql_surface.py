"""Engine SQL surface beyond the reference's own operators: window functions,
rollup, pivot, sessionization, distributed keygen (mapInPandas) and the
vectorized signing UDF path (pandas_udf) — SURVEY §2.7, §7 Phase 1/3.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dialect import dec_sum, intdiv, s, tbl, ts_str, views
from .registry import query

# ---------------------------------------------------------------------------
# Seed keygen — S9/U3 (scripts/seed-keys.ts:32-90). Spark side is a real
# distributed mapInPandas generator; the fake key derivation is deterministic
# sha256 so the DuckDB oracle can replicate it in SQL.
# ---------------------------------------------------------------------------

_N_KEYS = 2048

_KEYGEN_ORACLE = f"""
SELECT key_id,
       concat('0x', substr(sha256(concat('addr_', CAST(key_id AS VARCHAR))), 1, 40)) AS address,
       sha256(concat('pub_', CAST(key_id AS VARCHAR))) AS public_key_fp,
       key_id // 1000 AS key_file
FROM generate_series(0, {_N_KEYS - 1}) t(key_id)
"""


@query("ref_seed_keygen", oracle=_KEYGEN_ORACLE, tags=("reference", "udf", "source"))
def ref_seed_keygen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed key-pair generation: range → mapInPandas (UDTF-like,
    1 row in → 1 keypair out), chunked 1000/file like seed-keys.ts:68-81.
    This driver-checked surface emits deterministic sha256 fingerprints
    (key material is random by nature, so real keys can't be
    oracle-hashed); the REAL RSA-2048 generator behind the identical
    plumbing is :func:`seed_rsa_keypairs`, invariant-tested in
    tests/test_crypto.py.

    Reference: scripts/seed-keys.ts:16-30 (keygen), 68-81 (chunking).
    """

    def gen(batches):
        import hashlib

        for pdf in batches:
            ids = pdf["id"].astype("int64")
            yield pd.DataFrame(
                {
                    "key_id": ids,
                    "address": [
                        "0x" + hashlib.sha256(f"addr_{i}".encode()).hexdigest()[:40]
                        for i in ids
                    ],
                    "public_key_fp": [
                        hashlib.sha256(f"pub_{i}".encode()).hexdigest() for i in ids
                    ],
                    "key_file": ids // 1000,
                }
            )

    return (
        spark.range(_N_KEYS)
        .repartition(8)  # distribute keygen across executors
        .mapInPandas(
            gen,
            "key_id bigint, address string, public_key_fp string, key_file bigint",
        )
    )


def seed_rsa_keypairs(
    spark: SparkSession, n_keys: int, partitions: int = 8
) -> DataFrame:
    """Real RSA-2048 key-pair generation on executors: the same range →
    mapInPandas → 1000-per-file plumbing as :func:`ref_seed_keygen`, with
    the sha256 stand-in swapped for ``cryptography``'s RSA generator
    (reference scripts/seed-keys.ts:16-30 generates RSA-2048 PEM pairs).

    Emits PKCS8 private / SubjectPublicKeyInfo public PEMs plus a sha256
    fingerprint of the public DER. Key material is random, so this
    builder is verified by invariants (PEM parses, fingerprint matches,
    private signs / public verifies — tests/test_crypto.py) rather than
    by the driver's value-hash oracle. Keygen is CPU-bound at ~30 ms/key:
    at N keys the job is embarrassingly parallel across ``partitions``
    tasks, the shape that matters on a real cluster.

    Raises NotImplementedError if ``cryptography`` is unavailable.
    """
    try:
        from cryptography.hazmat.primitives.asymmetric import rsa  # noqa: F401
    except ImportError as exc:  # pragma: no cover - env-dependent
        raise NotImplementedError(
            "seed_rsa_keypairs requires the 'cryptography' package"
        ) from exc

    def gen(batches):
        import hashlib

        from cryptography.hazmat.primitives import serialization
        from cryptography.hazmat.primitives.asymmetric import rsa

        for pdf in batches:
            cols: dict[str, list] = {
                "key_id": [],
                "private_pem": [],
                "public_pem": [],
                "public_key_fp": [],
                "key_file": [],
            }
            for i in pdf["id"].astype("int64"):
                priv = rsa.generate_private_key(
                    public_exponent=65537, key_size=2048
                )
                pub = priv.public_key()
                pub_der = pub.public_bytes(
                    serialization.Encoding.DER,
                    serialization.PublicFormat.SubjectPublicKeyInfo,
                )
                cols["key_id"].append(int(i))
                cols["private_pem"].append(
                    priv.private_bytes(
                        serialization.Encoding.PEM,
                        serialization.PrivateFormat.PKCS8,
                        serialization.NoEncryption(),
                    ).decode()
                )
                cols["public_pem"].append(
                    pub.public_bytes(
                        serialization.Encoding.PEM,
                        serialization.PublicFormat.SubjectPublicKeyInfo,
                    ).decode()
                )
                cols["public_key_fp"].append(hashlib.sha256(pub_der).hexdigest())
                cols["key_file"].append(int(i) // 1000)
            yield pd.DataFrame(cols)

    return (
        spark.range(n_keys)
        .repartition(partitions)
        .mapInPandas(
            gen,
            "key_id bigint, private_pem string, public_pem string,"
            " public_key_fp string, key_file bigint",
        )
    )


# ---------------------------------------------------------------------------
# Signing pipeline — the E2 flagship (signer/index.js:262-334): canonical
# serialize → content hash → dedup → key assignment → vectorized sign UDF.
# ---------------------------------------------------------------------------


def _sign_tx_sql(d: str) -> str:
    """Transaction building + hash + dedup + key assignment (shared shape)."""
    to_addr = (
        f"concat('0x', substr("
        f"{'sha2' if d == 'spark' else 'sha256'}(concat('cust_', {s('o_custkey', d)})"
        f"{', 256' if d == 'spark' else ''}), 1, 40))"
    )
    return f"""
WITH txs AS (
  SELECT o_orderkey AS nonce,
         {to_addr} AS to_addr,
         CAST(round(o_totalprice * 1e9, 0) AS BIGINT) AS value_wei
  FROM {tbl('orders', d)}
  UNION ALL
  SELECT o_orderkey AS nonce,
         {to_addr} AS to_addr,
         CAST(round(o_totalprice * 1e9, 0) AS BIGINT) AS value_wei
  FROM {tbl('orders', d)} WHERE o_orderkey % 7 = 0  -- simulated redelivery
), hashed AS (
  SELECT DISTINCT nonce, to_addr, value_wei,
         {'sha2' if d == 'spark' else 'sha256'}(concat_ws('|', {s('nonce', d)}, to_addr, {s('value_wei', d)}){', 256' if d == 'spark' else ''}) AS tx_hash
  FROM txs
)
SELECT nonce, to_addr, value_wei, tx_hash, nonce % 100 AS key_id FROM hashed
"""


_SIGN_ORACLE = f"""
WITH assigned AS ({_sign_tx_sql('duck')})
SELECT tx_hash, key_id, to_addr, value_wei,
       sha256(concat(tx_hash, '|', sha256(concat('key_', CAST(key_id AS VARCHAR))))) AS signature
FROM assigned
"""


def _sign_series(tx_hash: pd.Series, key_id: pd.Series) -> pd.Series:
    """Vectorized signing (U2): keyed sha256(tx_hash | privkey) — the
    construction the DuckDB oracle can replicate byte-for-byte (DuckDB 1.0
    sha256 hashes VARCHAR only, so RFC-2104's binary inner digest is not
    oracle-renderable; see functions/crypto.py). The REAL crypto paths are
    :func:`ref_sign_ecdsa` (secp256k1 sign+verify round-trip, oracle-checked
    via verification counts) and the JVM HMAC expression
    ``crypto.hmac_sha256_hex`` (stdlib-hmac-verified in tests). Key
    derivation is memoized per batch: the ring is ~100 keys, so each Arrow
    batch derives each key once, not once per row."""
    import hashlib

    privs = {
        int(k): hashlib.sha256(f"key_{int(k)}".encode()).hexdigest()
        for k in key_id.unique()
    }
    return pd.Series(
        [
            hashlib.sha256(f"{h}|{privs[int(k)]}".encode()).hexdigest()
            for h, k in zip(tx_hash, key_id)
        ]
    )


@query("ref_sign_pipeline", oracle=_SIGN_ORACLE, tags=("reference", "udf", "pipeline"))
def ref_sign_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 end-to-end batch pipeline: orders → transactions (B3 fixture shape)
    → sha256 content hash → exactly-once dedup → modulo key assignment →
    vectorized signing pandas_udf.

    Reference: signer/index.js:262-334; README.md:15-20 invariants.
    """
    views(spark, sf_dir, "orders")
    assigned = spark.sql(_sign_tx_sql("spark"))
    sign_udf = F.pandas_udf(_sign_series, "string")
    return assigned.select(
        "tx_hash",
        "key_id",
        "to_addr",
        "value_wei",
        sign_udf(F.col("tx_hash"), F.col("key_id")).alias("signature"),
    )


# ---------------------------------------------------------------------------
# Real ECDSA signing — secp256k1 with RFC-6979 deterministic nonces
# (signer/index.js:292-295 signs via ethers.js ECDSA). The oracle checks the
# per-key verification counts: the hash-match is green only if every
# signature the engine produced round-trips through public-key verification.
# ---------------------------------------------------------------------------

_ECDSA_STRIDE = 20  # sign every 20th tx — bounds per-row crypto cost

_ECDSA_ORACLE = f"""
WITH assigned AS ({_sign_tx_sql('duck')})
SELECT key_id,
       CAST(COUNT(*) AS BIGINT) AS n_txs,
       CAST(COUNT(*) AS BIGINT) AS n_valid
FROM assigned WHERE nonce % {_ECDSA_STRIDE} = 0
GROUP BY key_id
"""


@query("ref_sign_ecdsa", oracle=_ECDSA_ORACLE, tags=("reference", "udf", "crypto"))
def ref_sign_ecdsa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real asymmetric signing: per-key secp256k1 private keys (derived
    deterministically from the key ring id), RFC-6979 deterministic ECDSA
    over each transaction hash, then public-key verification of every
    signature — all inside one Arrow-batched ``mapInPandas``. The result
    aggregates (n_txs, n_valid) per key; the oracle asserts n_valid ==
    n_txs, so a forged/garbage signature anywhere breaks the hash match.

    Reference: signer/index.js:292-295 (ECDSA via ethers.js),
    scripts/seed-keys.ts:16-30 (keypair seeding). Import-gated: raises
    NotImplementedError if the ``cryptography`` package is unavailable.
    """
    views(spark, sf_dir, "orders")
    assigned = spark.sql(_sign_tx_sql("spark")).filter(
        F.col("nonce") % _ECDSA_STRIDE == 0
    )

    def sign_verify(batches):
        try:
            from cryptography.hazmat.primitives import hashes
            from cryptography.hazmat.primitives.asymmetric import ec
        except ImportError as exc:  # pragma: no cover - present in CI image
            raise NotImplementedError(
                "ref_sign_ecdsa requires the 'cryptography' package"
            ) from exc
        import hashlib

        from cryptography.exceptions import InvalidSignature

        n_order = int(
            "FFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFE"
            "BAAEDCE6AF48A03BBFD25E8CD0364141",
            16,
        )
        sign_algo = ec.ECDSA(hashes.SHA256(), deterministic_signing=True)
        verify_algo = ec.ECDSA(hashes.SHA256())
        keys: dict[int, tuple] = {}

        def keypair(kid: int):
            if kid not in keys:
                scalar = (
                    int.from_bytes(
                        hashlib.sha256(f"key_{kid}".encode()).digest(), "big"
                    )
                    % (n_order - 1)
                    + 1
                )
                priv = ec.derive_private_key(scalar, ec.SECP256K1())
                keys[kid] = (priv, priv.public_key())
            return keys[kid]

        for pdf in batches:
            valids = []
            for h, kid in zip(pdf["tx_hash"], pdf["key_id"]):
                priv, pub = keypair(int(kid))
                sig = priv.sign(h.encode(), sign_algo)
                try:
                    pub.verify(sig, h.encode(), verify_algo)
                    valids.append(True)
                except InvalidSignature:
                    valids.append(False)
            yield pd.DataFrame({"key_id": pdf["key_id"], "valid": valids})

    per_row = assigned.select("tx_hash", "key_id").mapInPandas(
        sign_verify, "key_id bigint, valid boolean"
    )
    return per_row.groupBy("key_id").agg(
        F.count("*").cast("bigint").alias("n_txs"),
        F.sum(F.col("valid").cast("int")).cast("bigint").alias("n_valid"),
    )


# ---------------------------------------------------------------------------
# Window functions (O2 batch analogue needs row_number/lag; SURVEY §7 Phase 1).
# ---------------------------------------------------------------------------


def _window_sql(d: str) -> str:
    order = "ORDER BY l_shipdate, l_orderkey, l_linenumber"
    return f"""
SELECT l_suppkey, l_orderkey, l_linenumber,
       CAST(ROW_NUMBER() OVER (PARTITION BY l_suppkey {order}) AS BIGINT) AS rn,
       CAST(SUM(CAST(l_quantity AS DECIMAL(28,6)))
            OVER (PARTITION BY l_suppkey {order}
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty,
       CAST(RANK() OVER (PARTITION BY l_suppkey ORDER BY l_extendedprice DESC) AS BIGINT) AS price_rank,
       {ts_str('LAG(l_shipdate) OVER (PARTITION BY l_suppkey ' + order + ')', d)} AS prev_ship
FROM {tbl('lineitem', d)}
WHERE l_suppkey < 10
"""


@query("sql_window_functions", oracle=_window_sql("duck"), tags=("sql", "window"))
def sql_window_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window functions: row_number, frame-bounded running sum,
    rank, lag — per-supplier, deterministic total ordering."""
    views(spark, sf_dir, "lineitem")
    return spark.sql(_window_sql("spark"))


def _rollup_sql(d: str) -> str:
    return f"""
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       {dec_sum('l_quantity')} AS sum_qty,
       CAST(COUNT(*) AS BIGINT) AS n
FROM {tbl('lineitem', d)}
GROUP BY ROLLUP(l_returnflag, l_linestatus)
"""


@query("sql_rollup", oracle=_rollup_sql("duck"), tags=("sql", "agg"))
def sql_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ROLLUP hierarchy totals (grouping-sets family)."""
    views(spark, sf_dir, "lineitem")
    return spark.sql(_rollup_sql("spark"))


def _pivot_sql(d: str) -> str:
    def branch(status: str) -> str:
        return (
            f"CAST(SUM(CASE WHEN l_linestatus = '{status}' "
            f"THEN CAST(l_quantity AS DECIMAL(28,6)) "
            f"ELSE CAST(0 AS DECIMAL(28,6)) END) AS DOUBLE)"
        )

    return f"""
SELECT l_returnflag,
       {branch('O')} AS qty_open,
       {branch('F')} AS qty_filled,
       CAST(COUNT(*) AS BIGINT) AS n
FROM {tbl('lineitem', d)}
GROUP BY l_returnflag
"""


@query("sql_pivot", oracle=_pivot_sql("duck"), tags=("sql", "agg"))
def sql_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide aggregate) via conditional aggregation — the portable
    form of ``df.groupBy(...).pivot(...)``."""
    views(spark, sf_dir, "lineitem")
    return spark.sql(_pivot_sql("spark"))


def _sessionize_sql(d: str) -> str:
    order = "PARTITION BY user_id ORDER BY ts, event_id"
    return f"""
WITH seq AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN LAG(ts) OVER ({order}) IS NULL
                   OR ts - LAG(ts) OVER ({order}) > INTERVAL 1 HOUR
              THEN 1 ELSE 0 END AS new_sess
  FROM {tbl('events', d)}
), sess AS (
  SELECT user_id, event_id, value,
         SUM(new_sess) OVER ({order}
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM seq
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       {dec_sum('value')} AS sum_value
FROM sess
GROUP BY user_id, session_id
"""


@query("sql_sessionize", oracle=_sessionize_sql("duck"), tags=("sql", "window", "sessionization"))
def sql_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: lag-gap detection + running-sum session ids (the batch
    analogue of streaming ``session_window``; T6 extension surface)."""
    views(spark, sf_dir, "events")
    return spark.sql(_sessionize_sql("spark"))


def _distinct_sql(d: str) -> str:
    return f"""
SELECT event_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(COUNT(DISTINCT {intdiv('event_id', '100', d)}) AS BIGINT) AS n_id_buckets,
       CAST(COUNT(*) AS BIGINT) AS n
FROM {tbl('events', d)}
GROUP BY event_type
"""


@query("sql_distinct_agg", oracle=_distinct_sql("duck"), tags=("sql", "agg"))
def sql_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column DISTINCT aggregation (expand + two-phase agg in Spark)."""
    views(spark, sf_dir, "events")
    return spark.sql(_distinct_sql("spark"))


def _grouping_sets_sql(d: str) -> str:
    return f"""
SELECT o_orderstatus, o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS total
FROM {tbl('orders', d)}
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), (o_orderstatus, o_orderpriority), ())
"""


@query("sql_grouping_sets", oracle=_grouping_sets_sql("duck"), tags=("sql", "agg"))
def sql_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS: four aggregation granularities in one pass (Spark
    expands to a single Expand + hash aggregate — one scan, one shuffle)."""
    views(spark, sf_dir, "orders")
    return spark.sql(_grouping_sets_sql("spark"))


def _cube_sql(d: str) -> str:
    return f"""
SELECT o_orderstatus, o_orderpriority, year(o_orderdate) AS o_year,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM {tbl('orders', d)}
GROUP BY CUBE (o_orderstatus, o_orderpriority, year(o_orderdate))
"""


@query("sql_cube", oracle=_cube_sql("duck"), tags=("sql", "agg"))
def sql_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over three dimensions: all 8 grouping combinations from one
    scan via Expand — the OLAP rollup lattice."""
    views(spark, sf_dir, "orders")
    return spark.sql(_cube_sql("spark"))


def _approx_distinct_oracle(d: str) -> str:
    return f"""
SELECT event_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
       CAST(COUNT(DISTINCT event_id) AS BIGINT) AS exact_events,
       TRUE AS users_within_bound,
       TRUE AS events_within_bound
FROM {tbl('events', d)}
GROUP BY event_type
"""


@query(
    "sql_approx_distinct",
    oracle=_approx_distinct_oracle("duck"),
    tags=("sql", "agg", "approx"),
)
def sql_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct-count sketch per event type, shipped as a
    sketch-accuracy AUDIT (VERDICT r7 #3): the output carries the exact
    distinct anchor plus a deterministic ``within_bound`` verdict — the
    sketch estimate stays inside 15 % (3x the default 5 % rsd, integer
    arithmetic ``|approx-exact|*20 <= 3*exact`` so no FP tie can diverge)
    — which a SQL oracle CAN hash-match (exact counts + literal TRUE).
    The sketch itself (engine-specific bits) never leaves the plan. At
    100 TB the production operator is the mergeable constant-memory
    sketch; the exact-distinct anchor is the audit harness you run on a
    sampled partition, exactly as expressed here. Sketch error bounds
    are additionally bound-tested in tests/test_approx.py."""
    views(spark, sf_dir, "events")
    return spark.sql(
        f"""
SELECT event_type,
       exact_users, exact_events,
       abs(approx_users - exact_users) * 20 <= 3 * exact_users
           AS users_within_bound,
       abs(approx_events - exact_events) * 20 <= 3 * exact_events
           AS events_within_bound
FROM (
  SELECT event_type,
         approx_count_distinct(user_id) AS approx_users,
         approx_count_distinct(event_id) AS approx_events,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
         CAST(COUNT(DISTINCT event_id) AS BIGINT) AS exact_events
  FROM {tbl('events', 'spark')}
  GROUP BY event_type
) s
"""
    )


def _unpivot_sql(d: str) -> str:
    # wide per-type aggregate -> long (metric, value) via stack/UNION ALL —
    # identical row product in both engines
    wide = f"""
  SELECT event_type,
         CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total_value,
         CAST(COUNT(*) AS DOUBLE) AS n_events,
         CAST(COUNT(DISTINCT user_id) AS DOUBLE) AS n_users
  FROM {tbl('events', d)} GROUP BY event_type
"""
    if d == "spark":
        return f"""
SELECT event_type, metric, val
FROM ({wide}) w
LATERAL VIEW stack(3,
  'total_value', total_value,
  'n_events', n_events,
  'n_users', n_users) AS metric, val
"""
    return f"""
WITH w AS ({wide})
SELECT event_type, 'total_value' AS metric, total_value AS val FROM w
UNION ALL
SELECT event_type, 'n_events', n_events FROM w
UNION ALL
SELECT event_type, 'n_users', n_users FROM w
"""


@query("sql_unpivot", oracle=_unpivot_sql("duck"), tags=("sql", "reshape"))
def sql_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshape (unpivot/melt) via stack — the inverse of
    sql_pivot; generates rows without a shuffle or join."""
    views(spark, sf_dir, "events")
    return spark.sql(_unpivot_sql("spark"))


def _frames_sql(d: str) -> str:
    rows_w = "PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 3 PRECEDING AND CURRENT ROW"
    range_w = "PARTITION BY user_id ORDER BY epoch_s RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW"
    # floor() before the DuckDB cast: epoch() is DOUBLE and CAST rounds
    # there (Spark truncates) — an unfloored +1 s shift would move rows
    # across the RANGE-frame boundary
    epoch = (
        "CAST(unix_timestamp(ts) AS BIGINT)"
        if d == "spark"
        else "CAST(floor(epoch(ts)) AS BIGINT)"
    )
    return f"""
WITH base AS (
  SELECT user_id, event_id, ts, {epoch} AS epoch_s,
         CAST(value AS DECIMAL(28,6)) AS dval
  FROM {tbl('events', d)}
)
SELECT user_id, event_id,
       CAST(SUM(dval) OVER ({rows_w}) AS DOUBLE) AS moving_sum_4,
       CAST(COUNT(*) OVER ({range_w}) AS BIGINT) AS n_last_hour
FROM base
"""


@query("sql_window_frames", oracle=_frames_sql("duck"), tags=("sql", "window"))
def sql_window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit window frame specs: a ROWS frame (last 4 rows moving sum,
    exact decimal) and a numeric RANGE frame (sliding 1-hour count over
    epoch seconds) — one sort per user partition serves both frames."""
    views(spark, sf_dir, "events")
    return spark.sql(_frames_sql("spark"))


def _bag_set_ops_sql(d: str) -> str:
    # multiset semantics: duplicates preserved/subtracted by multiplicity
    a = f"SELECT o_custkey FROM {tbl('orders', d)} WHERE o_orderstatus = 'F'"
    b = f"SELECT o_custkey FROM {tbl('orders', d)} WHERE o_orderpriority = '1-URGENT'"
    return f"""
SELECT 'except_all' AS op, o_custkey, CAST(COUNT(*) AS BIGINT) AS n
FROM (({a}) EXCEPT ALL ({b})) t1 GROUP BY o_custkey
UNION ALL
SELECT 'intersect_all', o_custkey, CAST(COUNT(*) AS BIGINT)
FROM (({a}) INTERSECT ALL ({b})) t2 GROUP BY o_custkey
"""


@query("sql_bag_set_ops", oracle=_bag_set_ops_sql("duck"), tags=("sql", "setops"))
def sql_bag_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset EXCEPT ALL / INTERSECT ALL — duplicate-preserving set
    algebra (complements ref_set_ops' distinct variants); Spark plans these
    as a counted anti/semi aggregation, one shuffle each."""
    views(spark, sf_dir, "orders")
    return spark.sql(_bag_set_ops_sql("spark"))


def _lateral_sql(d: str) -> str:
    return f"""
SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
FROM {tbl('customer', d)} c,
LATERAL (
  SELECT o.o_orderkey, o.o_totalprice
  FROM {tbl('orders', d)} o
  WHERE o.o_custkey = c.c_custkey
  ORDER BY o.o_totalprice DESC, o.o_orderkey
  LIMIT 2
) t
WHERE c.c_acctbal > 9000
"""


@query("sql_lateral_topn", oracle=_lateral_sql("duck"), tags=("sql", "join", "subquery"))
def sql_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery: top-2 orders per qualifying customer.
    Catalyst rewrites the per-row LIMIT into a ranked window over one
    orders shuffle — no nested-loop re-execution per customer."""
    views(spark, sf_dir, "customer", "orders")
    return spark.sql(_lateral_sql("spark"))


def _from_json_sql(d: str) -> str:
    # JSON built from events (10% corrupt), parsed with a typed schema;
    # corrupt rows yield NULL fields (PERMISSIVE) and are counted
    payload = (
        "CASE WHEN event_id % 10 = 3 THEN substr(j, 1, 5) ELSE j END"
    )
    if d == "spark":
        parse = (
            "from_json(payload, 'id BIGINT, et STRING, v DOUBLE') AS p"
        )
        fields = "p.id AS id, p.et AS et, p.v AS v"
    else:
        parse = "payload AS p"
        fields = (
            "CASE WHEN json_valid(p) THEN CAST(json_extract_string(p, '$.id') AS BIGINT) END AS id, "
            "CASE WHEN json_valid(p) THEN json_extract_string(p, '$.et') END AS et, "
            "CASE WHEN json_valid(p) THEN CAST(json_extract_string(p, '$.v') AS DOUBLE) END AS v"
        )
    return f"""
WITH built AS (
  SELECT event_id,
         concat('{{"id":', {s('event_id', d)}, ',"et":"', event_type,
                '","v":', {s('value', d)}, '}}') AS j
  FROM {tbl('events', d)}
), corrupted AS (
  SELECT event_id, {payload} AS payload FROM built
), parsed AS (
  SELECT event_id, {parse} FROM corrupted
), flat AS (
  SELECT event_id, {fields} FROM parsed
)
SELECT et,
       CAST(COUNT(*) AS BIGINT) AS n_parsed,
       CAST(SUM(CAST(v AS DECIMAL(28,6))) AS DOUBLE) AS sum_v
FROM flat WHERE id IS NOT NULL
GROUP BY et
"""


@query("sql_from_json_struct", oracle=_from_json_sql("duck"), tags=("sql", "json"))
def sql_from_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed JSON parsing: from_json with an explicit struct schema in
    PERMISSIVE mode — corrupt records become NULL structs (per-record
    failure isolation, F3/P2) and drop out of the typed aggregate."""
    views(spark, sf_dir, "events")
    return spark.sql(_from_json_sql("spark"))


def _scalar_fn_sql(d: str) -> str:
    # Per-dialect spellings of the few functions whose names differ; every
    # output value is bit-identical across engines (string ops are exact;
    # math ops are single IEEE operations; ints are cast to BIGINT).
    fmt = "format_string" if d == "spark" else "printf"
    strpos = "instr" if d == "spark" else "strpos"
    if d == "spark":
        pmod7 = "pmod(o_orderkey - 3, 7)"
        ddiff = "datediff(o_orderdate, TIMESTAMP '1995-01-01 00:00:00')"
        sha = "sha2(o_orderpriority, 256)"
    else:
        pmod7 = "((o_orderkey - 3) % 7 + 7) % 7"
        ddiff = "date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate)"
        sha = "sha256(o_orderpriority)"
    return f"""
SELECT o_orderkey,
       lower(o_orderpriority)                                   AS pri_lower,
       upper(o_orderstatus)                                     AS st_upper,
       left(o_orderpriority, 3)                                 AS pri_left,
       substr(o_orderpriority, 3, 4)                            AS pri_sub,
       replace(o_orderpriority, '-', '_')                       AS pri_repl,
       lpad(o_orderstatus, 4, '*')                              AS st_pad,
       reverse(o_orderpriority)                                 AS pri_rev,
       repeat(o_orderstatus, 3)                                 AS st_rep,
       concat_ws('|', o_orderstatus, o_orderpriority)           AS st_pri,
       CAST({strpos}(o_orderpriority, '-') AS BIGINT)           AS dash_pos,
       CAST(ascii(o_orderpriority) AS BIGINT)                   AS pri_ascii,
       CAST(length(o_orderpriority) AS BIGINT)                  AS pri_len,
       {fmt}('%06d', o_orderkey)                                AS key_pad,
       CAST(abs(o_totalprice - 250000.0) AS DOUBLE)             AS bal_abs,
       CAST({pmod7} AS BIGINT)                                  AS key_pmod,
       pow(2.0, o_orderkey % 16)                                AS key_pow,
       CAST(floor(o_totalprice / 1000.0) AS BIGINT)             AS price_floor,
       CAST(ceil(o_totalprice / 1000.0) AS BIGINT)              AS price_ceil,
       CAST(sign(o_totalprice - 250000.0) AS BIGINT)            AS price_sign,
       greatest(o_totalprice, 250000.0)                         AS price_hi,
       least(o_totalprice, 250000.0)                            AS price_lo,
       CAST(o_orderkey & 255 AS BIGINT)                         AS key_band,
       CAST(o_orderkey | 4096 AS BIGINT)                        AS key_bor,
       CAST(year(o_orderdate) AS BIGINT)                        AS o_year,
       CAST(quarter(o_orderdate) AS BIGINT)                     AS o_quarter,
       CAST(dayofyear(o_orderdate) AS BIGINT)                   AS o_doy,
       {ts_str('o_orderdate', d)}                               AS o_date_str,
       {ts_str('o_orderdate + INTERVAL 7 DAY', d)}              AS o_date_p7,
       CAST({ddiff} AS BIGINT)                                  AS days_since,
       {sha}                                                    AS pri_sha,
       md5(o_orderstatus)                                       AS st_md5
FROM {tbl('orders', d)}
"""


@query("sql_scalar_fn_surface", oracle=_scalar_fn_sql("duck"), tags=("sql", "functions"))
def sql_scalar_fn_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2.8 scalar-function footprint in one row-level query: string
    ops (lower/upper/left/substr/replace/lpad/reverse/repeat/concat_ws/
    instr/ascii/length/format_string), math (abs/pmod/pow/floor/ceil/sign/
    greatest/least, bit and/or), datetime (year/quarter/dayofyear/
    date_format/interval add/datediff), hashing (sha2/md5). Everything is a
    built-in JVM expression inside one WholeStageCodegen projection over the
    scan — no Python, no shuffle; at 100 TB this is a pure map stage.

    Reference parity: §2.8 lists the reference's scalar calls
    (partitioner/index.js:17-23,46-57; signer/index.js:133-137,237;
    app.ts:400) — each maps to one of these builtins."""
    views(spark, sf_dir, "orders")
    return spark.sql(_scalar_fn_sql("spark"))


def _recursive_sql(d: str) -> str:
    # Halving is an exact IEEE operation, so `remaining` is bit-identical
    # across engines at every depth; depth is bounded (~4) by the data range.
    return f"""
WITH RECURSIVE pay (o_orderkey, installment, remaining) AS (
  SELECT o_orderkey, CAST(0 AS BIGINT) AS installment, o_totalprice AS remaining
  FROM {tbl('orders', d)}
  WHERE o_orderkey % 100 = 0
  UNION ALL
  SELECT o_orderkey, installment + 1, remaining / 2.0
  FROM pay
  WHERE remaining >= 50000.0
)
SELECT o_orderkey, installment, remaining
FROM pay
"""


@query("sql_recursive_cte", oracle=_recursive_sql("duck"), tags=("sql", "recursive"))
def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (iterative row generation inside the engine): each
    seed order fans out into an installment schedule until the halved
    remainder drops below the floor. Spark 4 executes WITH RECURSIVE as
    iterated UNION ALL steps — each step is a distributed map over the
    previous frontier, so the recursion parallelizes per row and needs no
    driver-side loop (contrast dedup_cc_clusters, which iterates in the
    driver for pre-4.x compatibility). Depth is data-bounded, not
    plan-bounded."""
    views(spark, sf_dir, "orders")
    return spark.sql(_recursive_sql("spark"))


def _array_fn_sql(d: str) -> str:
    # Array-function surface; Spark arrays are 0-indexed, DuckDB lists
    # 1-indexed, and a few nulls/absence conventions differ (array_position
    # yields 0 for missing in Spark, NULL in DuckDB) — normalized here so the
    # emitted values are identical.
    from ..functions.text import words

    w = words("text", d)
    if d == "spark":
        first3 = f"array_join(slice({w}, 1, 3), ' ')"
        pos_the = f"array_position({w}, 'the')"
        sorted_first = f"sort_array({w})[0]"
        rev_first = f"reverse({w})[0]"
        with_tail = f"size(concat({w}, array('endmarker')))"
        flat2 = f"size(flatten(array({w}, {w})))"
        wmax = f"array_max({w})"
        ndist = f"size(array_distinct({w}))"
    else:
        first3 = f"array_to_string(list_slice({w}, 1, 3), ' ')"
        pos_the = f"COALESCE(list_position({w}, 'the'), 0)"
        sorted_first = f"list_sort({w})[1]"
        rev_first = f"list_reverse({w})[1]"
        with_tail = f"len(list_concat({w}, ['endmarker']))"
        flat2 = f"len(flatten([{w}, {w}]))"
        wmax = f"list_aggregate({w}, 'max')"
        ndist = f"len(list_distinct({w}))"
    return f"""
SELECT doc_id,
       CAST({arr_len_expr(w, d)} AS BIGINT)      AS n_words,
       {first3}                                  AS first3,
       CAST({pos_the} AS BIGINT)                 AS pos_the,
       {sorted_first}                            AS sorted_first,
       {rev_first}                               AS last_word,
       CAST({with_tail} AS BIGINT)               AS n_with_tail,
       CAST({flat2} AS BIGINT)                   AS n_flat2,
       {wmax}                                    AS max_word,
       CAST({ndist} AS BIGINT)                   AS n_distinct
FROM {tbl('documents', d)}
"""


def arr_len_expr(w: str, d: str) -> str:
    return f"size({w})" if d == "spark" else f"len({w})"


@query("sql_array_fn_surface", oracle=_array_fn_sql("duck"), tags=("sql", "functions", "array"))
def sql_array_fn_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function surface over tokenized documents: size/slice/join/
    position/sort/reverse/concat/flatten/max/distinct — the collection
    builtins SURVEY §2.8 calls out as required for the embeddings and text
    extensions (the reference itself has no array types). All JVM built-in
    expressions, one projection over the scan, no shuffle; indexing and
    missing-element conventions are normalized cross-engine (Spark 0-based
    vs DuckDB 1-based)."""
    views(spark, sf_dir, "documents")
    return spark.sql(_array_fn_sql("spark"))


# ---------------------------------------------------------------------------
# SCD2 dimension history — gaps-and-islands collapse of per-day snapshots
# into validity ranges (the batch MERGE pattern for slowly-changing
# dimensions at lake scale: recompute ranges from the event log instead of
# row-level upserts).
# ---------------------------------------------------------------------------


def _scd2_sql(d: str) -> str:
    return f"""
WITH daily AS (
  SELECT user_id, date_trunc('day', ts) AS day, MAX(event_type) AS attr
  FROM {tbl('events', d)} GROUP BY user_id, date_trunc('day', ts)
), seq AS (
  SELECT user_id, day, attr,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day)
         - ROW_NUMBER() OVER (PARTITION BY user_id, attr ORDER BY day) AS grp
  FROM daily
)
SELECT user_id, attr,
       {ts_str('MIN(day)', d)} AS valid_from,
       {ts_str('MAX(day)', d)} AS valid_to,
       CAST(COUNT(*) AS BIGINT) AS n_days
FROM seq GROUP BY user_id, attr, grp
"""


@query("sql_scd2_ranges", oracle=_scd2_sql("duck"), tags=("sql", "window", "scd2"))
def sql_scd2_ranges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 history: per-user daily attribute
    snapshots collapsed into [valid_from, valid_to] ranges via the
    gaps-and-islands double-row_number trick. Both window layers and the
    final rollup partition on user_id — one fact shuffle. At lake scale
    this recompute-from-log pattern replaces row-level MERGE upserts."""
    views(spark, sf_dir, "events")
    return spark.sql(_scd2_sql("spark"))


# ---------------------------------------------------------------------------
# Null semantics surface — three-valued logic, null-safe equality, null
# ordering, and aggregate null handling probed in one query (NULL handling
# is where engines silently diverge; this pins the contract).
# ---------------------------------------------------------------------------


def _null_semantics_sql(d: str) -> str:
    nse = (
        "(st <=> pst)" if d == "spark" else "(st IS NOT DISTINCT FROM pst)"
    )
    return f"""
WITH base AS (
  SELECT o_orderkey,
         {intdiv('o_orderkey', '4096', d)} AS bkt,
         NULLIF(o_custkey % 7, 0) AS k7,
         CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE o_orderstatus END AS st
  FROM {tbl('orders', d)}
), seq AS (
  SELECT o_orderkey, k7, st,
         LAG(st) OVER (PARTITION BY bkt ORDER BY o_orderkey) AS pst,
         FIRST_VALUE(o_orderkey) OVER (
           PARTITION BY bkt ORDER BY k7 ASC NULLS FIRST, o_orderkey
         ) AS first_null_key
  FROM base
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(k7) AS BIGINT) AS n_k7_nonnull,
       CAST(SUM(CASE WHEN k7 IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_k7_null,
       CAST(COUNT(DISTINCT st) AS BIGINT) AS n_st_distinct,
       CAST(SUM(CASE WHEN {nse} THEN 1 ELSE 0 END) AS BIGINT) AS n_nullsafe_same_as_prev,
       CAST(MIN(first_null_key) AS BIGINT) AS first_null_key,
       CAST(COALESCE(MIN(k7), -1) AS BIGINT) AS min_k7
FROM seq
"""


@query("sql_null_semantics", oracle=_null_semantics_sql("duck"), tags=("sql", "nulls"))
def sql_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-valued-logic contract in one row: COUNT(*) vs COUNT(col) vs
    COUNT(DISTINCT col) under injected nulls, null-safe equality against
    the previous row (Spark ``<=>`` ≡ DuckDB ``IS NOT DISTINCT FROM`` —
    true when both sides are NULL), NULLS FIRST window ordering, NULLIF /
    COALESCE round-trips. Both windows partition on a derived o_orderkey
    range bucket — null-handling semantics are per-row/per-frame, so the
    probe needs no global order and the plan stays scale-safe."""
    views(spark, sf_dir, "orders")
    return spark.sql(_null_semantics_sql("spark"))


def _map_fn_sql(d: str) -> str:
    """Map-typed collection surface. Maps never leave the query (engines
    render map literals differently); every output is a scalar — sorted
    key/value lists are comma-joined to strings so the cross-engine row
    canonicalizer (which sorts on every column) never sees an array cell."""
    if d == "spark":
        mk = "map(lit_status, o_orderstatus, lit_prio, o_orderpriority)"
        build = f"SELECT o_orderkey, 'status' AS lit_status, 'priority' AS lit_prio, o_orderstatus, o_orderpriority, {mk} AS m"
        get_status = "m['status']"
        n_entries = "CAST(cardinality(m) AS BIGINT)"
        keys_sorted = "array_join(array_sort(map_keys(m)), ',')"
        vals_sorted = "array_join(array_sort(map_values(m)), ',')"
        concat_n = (
            "CAST(cardinality(map_concat(m, map('extra', CAST(o_orderkey AS STRING)))) AS BIGINT)"
        )
        from_entries = (
            "map_from_entries(array(struct('a', 1), struct('b', 2)))['b']"
        )
    else:
        build = (
            "SELECT o_orderkey, o_orderstatus, o_orderpriority, "
            "map(['status','priority'], [o_orderstatus, o_orderpriority]) AS m"
        )
        get_status = "m['status'][1]"
        n_entries = "CAST(cardinality(m) AS BIGINT)"
        keys_sorted = "array_to_string(list_sort(map_keys(m)), ',')"
        vals_sorted = "array_to_string(list_sort(map_values(m)), ',')"
        concat_n = (
            "CAST(cardinality(map_concat(m, map(['extra'], [CAST(o_orderkey AS VARCHAR)]))) AS BIGINT)"
        )
        from_entries = "map_from_entries([{'k': 'a', 'v': 1}, {'k': 'b', 'v': 2}])['b'][1]"
    return f"""
WITH built AS (
  {build}
  FROM {tbl('orders', d)} WHERE o_orderkey % 97 = 0
)
SELECT o_orderkey,
       {get_status} AS status_v,
       {n_entries} AS n_entries,
       {keys_sorted} AS keys_sorted,
       {vals_sorted} AS vals_sorted,
       {concat_n} AS n_after_concat,
       CAST({from_entries} AS BIGINT) AS entry_b
FROM built
"""


@query("sql_map_fn_surface", oracle=_map_fn_sql("duck"), tags=("sql", "collections"))
def sql_map_fn_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed collection functions (§2.8 footprint alongside the scalar
    and array surfaces): construction from key/value pairs, element access,
    cardinality, key/value extraction, concat, and map_from_entries — all
    in one codegen projection, with map values reduced to scalars/sorted
    arrays so results compare across engines (Spark maps are unordered;
    DuckDB element access yields single-element lists)."""
    views(spark, sf_dir, "orders")
    return spark.sql(_map_fn_sql("spark"))


def _approx_pct_exact_sql(d: str) -> str:
    """Exact disc-percentile anchor, identical integer arithmetic in both
    dialects: value at 1-indexed rank ceil(p*n) = (n*pnum + pden-1) // pden
    under a value-only ordering (ties permute row_number but the VALUE at
    any rank is invariant)."""
    at = lambda pnum: (  # noqa: E731 — local SQL-fragment builder
        f"MAX(CASE WHEN rn = {intdiv(f'(n * {pnum} + 99)', '100', d)} "
        f"THEN o_totalprice END)"
    )
    return f"""
WITH ranked AS (
  SELECT o_orderpriority, o_totalprice,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice) AS rn,
         COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM {tbl('orders', d)}
)
SELECT o_orderpriority,
       CAST(MAX(n) AS BIGINT) AS n,
       {at(50)} AS p50_exact,
       {at(90)} AS p90_exact,
       {at(99)} AS p99_exact
FROM ranked
GROUP BY o_orderpriority
"""


def _approx_pct_oracle(d: str) -> str:
    return f"""
SELECT o_orderpriority, n, p50_exact, p90_exact, p99_exact,
       TRUE AS p50_within_bound,
       TRUE AS p90_within_bound,
       TRUE AS p99_within_bound
FROM ({_approx_pct_exact_sql(d)}) e
"""


@query(
    "sql_approx_percentile",
    oracle=_approx_pct_oracle("duck"),
    tags=("sql", "agg", "approx"),
)
def sql_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (Greenwald-Khanna sketch, accuracy=10000 bounds
    rank error at n/10000) p50/p90/p99 of order totals per priority,
    shipped as a sketch-accuracy AUDIT (VERDICT r7 #3): output = the
    exact disc-percentile anchors plus deterministic ``within_bound``
    verdicts — the sketch value must lie between the data values at rank
    ``ceil(p*n) ± d`` where d = definition slack (1) + guaranteed rank
    error ceil(n/10000) — which a SQL oracle CAN hash-match (exact
    anchors + literal TRUE). Engine-specific sketch values never leave
    the plan. Scale note: the production operator at 100 TB is the
    mergeable bounded-memory sketch agg; the exact rank anchor (a
    per-group sort, honest cost of ground truth) is the audit you run on
    a sample, exactly as expressed here. The 5-group window partitioning
    is inherent to auditing 5 groups — the sketch path has no window.
    Rank-error bounds are additionally tested in tests/test_approx.py."""
    views(spark, sf_dir, "orders")
    at_rank = lambda r: (  # noqa: E731 — value at clamped 1-indexed rank
        f"MAX(CASE WHEN rn = greatest(least({r}, n), 1) "
        f"THEN o_totalprice END)"
    )
    rank = lambda pnum: intdiv(f"(n * {pnum} + 99)", "100", "spark")  # noqa: E731
    cols = ", ".join(
        f"{at_rank(rank(p))} AS p{p}_exact, "
        f"{at_rank(f'({rank(p)} - d)')} AS p{p}_lo, "
        f"{at_rank(f'({rank(p)} + d)')} AS p{p}_hi"
        for p in (50, 90, 99)
    )
    return spark.sql(
        f"""
WITH ranked AS (
  SELECT o_orderpriority, o_totalprice,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice) AS rn,
         COUNT(*) OVER (PARTITION BY o_orderpriority) AS n,
         1 + {intdiv('(COUNT(*) OVER (PARTITION BY o_orderpriority) + 9999)',
                     '10000', 'spark')} AS d
  FROM {tbl('orders', 'spark')}
),
exact AS (
  SELECT o_orderpriority, CAST(MAX(n) AS BIGINT) AS n, {cols}
  FROM ranked
  GROUP BY o_orderpriority
),
sk AS (
  SELECT o_orderpriority,
         approx_percentile(o_totalprice, 0.5, 10000) AS a50,
         approx_percentile(o_totalprice, 0.9, 10000) AS a90,
         approx_percentile(o_totalprice, 0.99, 10000) AS a99
  FROM {tbl('orders', 'spark')}
  GROUP BY o_orderpriority
)
SELECT e.o_orderpriority, e.n, e.p50_exact, e.p90_exact, e.p99_exact,
       sk.a50 BETWEEN e.p50_lo AND e.p50_hi AS p50_within_bound,
       sk.a90 BETWEEN e.p90_lo AND e.p90_hi AS p90_within_bound,
       sk.a99 BETWEEN e.p99_lo AND e.p99_hi AS p99_within_bound
FROM exact e
JOIN sk ON e.o_orderpriority = sk.o_orderpriority
"""
    )


def _hof_sql(d: str) -> str:
    """Higher-order (lambda) function surface over a real array column.
    Both folds are LEFT folds (Spark ``aggregate``, DuckDB ``list_reduce``
    with a prepended seed) so double accumulation happens in the same IEEE
    order; FLOAT->DOUBLE widening is exact."""
    if d == "spark":
        e = "transform(embedding, x -> CAST(x AS DOUBLE))"
        sum_sq = f"aggregate({e}, CAST(0 AS DOUBLE), (acc, x) -> acc + x * x)"
        n_pos = f"size(filter({e}, x -> x > 0))"
        has_big = f"exists({e}, x -> x > 0.9)"
        all_small = f"forall({e}, x -> abs(x) <= 1.0)"
        rev_dot = (
            f"aggregate(zip_with({e}, reverse({e}), (x, y) -> x * y), "
            "CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
        )
    else:
        e = "list_transform(embedding, x -> CAST(x AS DOUBLE))"
        sum_sq = (
            f"list_reduce(list_prepend(CAST(0 AS DOUBLE), "
            f"list_transform({e}, x -> x * x)), (acc, x) -> acc + x)"
        )
        n_pos = f"len(list_filter({e}, x -> x > 0))"
        has_big = f"list_bool_or(list_transform({e}, x -> x > 0.9))"
        all_small = f"list_bool_and(list_transform({e}, x -> abs(x) <= 1.0))"
        rev_dot = (
            f"list_reduce(list_prepend(CAST(0 AS DOUBLE), "
            f"list_transform(generate_series(1, 64), "
            f"i -> ({e})[i] * ({e})[64 - i + 1])), (acc, x) -> acc + x)"
        )
    return f"""
SELECT vec_id,
       round({sum_sq}, 6) AS sum_sq,
       CAST({n_pos} AS BIGINT) AS n_pos,
       {has_big} AS has_big,
       {all_small} AS all_small,
       round({rev_dot}, 6) AS rev_dot
FROM {tbl('embeddings', d)}
WHERE vec_id % 7 = 0
"""


@query("sql_higher_order_fn_surface", oracle=_hof_sql("duck"), tags=("sql", "collections", "lambda"))
def sql_higher_order_fn_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order lambda functions over array columns — transform /
    filter / exists / forall / zip_with / aggregate (fold) — the §2.8
    collection-lambda footprint. One projection, no shuffle; note these run
    interpreted (outside whole-stage codegen), which is why hot-path vector
    math elsewhere (dialect.dot) unrolls to flat codegen arithmetic instead."""
    views(spark, sf_dir, "embeddings")
    return spark.sql(_hof_sql("spark"))


def _variant_sql(d: str) -> str:
    if d == "spark":
        k_long = "variant_get(v, '$.k', 'long')"
        k_str = "variant_get(v, '$.k', 'string')"
        missing = "variant_get(v, '$.absent', 'string')"
        pre = f"SELECT event_id, event_type, parse_json(props) AS v FROM {tbl('events', 'spark')}"
    else:
        k_long = "CAST(json_extract(v, '$.k') AS BIGINT)"
        k_str = "json_extract_string(v, '$.k')"
        missing = "json_extract_string(v, '$.absent')"
        pre = f"SELECT event_id, event_type, CAST(props AS JSON) AS v FROM {tbl('events', d)}"
    return f"""
WITH parsed AS ({pre})
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM({k_long}) AS BIGINT) AS sum_k,
       CAST(COUNT({missing}) AS BIGINT) AS n_absent_nonnull,
       MIN({k_str}) AS min_k_str
FROM parsed
GROUP BY event_type
"""


@query("sql_variant_shred", oracle=_variant_sql("duck"), tags=("sql", "json", "variant"))
def sql_variant_shred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT semi-structured type: ``parse_json`` into the binary
    variant encoding, then typed ``variant_get`` extraction (long, string,
    and a missing path yielding NULL) aggregated per event type — the
    open-schema ingestion path that replaces schema-on-write for evolving
    JSON payloads; DuckDB's JSON type is the oracle equivalent. At scale the
    variant column shreds at the parquet layer instead of re-parsing text
    per query."""
    views(spark, sf_dir, "events")
    return spark.sql(_variant_sql("spark"))


def _scd2_dim_cte(d: str) -> str:
    """(user_id, attr, vf, vt) validity ranges — the SCD2 dimension."""
    return f"""
daily AS (
  SELECT user_id, date_trunc('day', ts) AS day, MAX(event_type) AS attr
  FROM {tbl('events', d)} GROUP BY user_id, date_trunc('day', ts)
), seq AS (
  SELECT user_id, day, attr,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day)
         - ROW_NUMBER() OVER (PARTITION BY user_id, attr ORDER BY day) AS grp
  FROM daily
), dim AS (
  SELECT user_id, attr, MIN(day) AS vf, MAX(day) AS vt
  FROM seq GROUP BY user_id, attr, grp
), probes AS (
  SELECT event_id, user_id, date_trunc('day', ts) AS pday
  FROM {tbl('events', d)} WHERE event_type = 'purchase'
)"""


def _scd2_pit_oracle(d: str) -> str:
    """Oracle: the naive interval-containment join."""
    return f"""
WITH {_scd2_dim_cte(d)}
SELECT p.event_id, p.user_id, {ts_str('p.pday', d)} AS day, m.attr
FROM probes p JOIN dim m
  ON p.user_id = m.user_id AND p.pday >= m.vf AND p.pday <= m.vt
"""


@query("sql_scd2_pit_join", oracle=_scd2_pit_oracle("duck"), tags=("sql", "scd2", "join"))
def sql_scd2_pit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (temporal dimension) join: each probe event picks the
    SCD2 validity row active on its day. Scale formulation is the as-of
    machinery, not an interval join: dimension version-starts and probes
    union into one stream, one hash shuffle on the entity key, and a
    running ignore-nulls window carries the current version onto every
    probe (version rows sort before probes on equal days — inclusive
    starts); a vt guard drops probes past the last validity day. The
    oracle is the naive interval-containment join over the same ranges."""
    views(spark, sf_dir, "events")
    return spark.sql(
        f"""
WITH {_scd2_dim_cte('spark')},
tagged AS (
  SELECT user_id, vf AS t, 0 AS is_probe,
         CAST(NULL AS BIGINT) AS event_id, CAST(NULL AS TIMESTAMP) AS pday,
         attr, vt
  FROM dim
  UNION ALL
  SELECT user_id, pday AS t, 1,
         event_id, pday,
         CAST(NULL AS STRING), CAST(NULL AS TIMESTAMP)
  FROM probes
),
win AS (
  SELECT user_id, is_probe, event_id, pday,
         last(attr, true) OVER (
           PARTITION BY user_id ORDER BY t, is_probe
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS attr,
         last(vt, true) OVER (
           PARTITION BY user_id ORDER BY t, is_probe
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS cur_vt
  FROM tagged
)
SELECT event_id, user_id, date_format(pday, 'yyyy-MM-dd HH:mm:ss') AS day, attr
FROM win
WHERE is_probe = 1 AND attr IS NOT NULL AND pday <= cur_vt
"""
    )


# ---------------------------------------------------------------------------
# Recursive CTE (Spark 4's WITH RECURSIVE) — iterative fixpoint closure.
# ---------------------------------------------------------------------------


def _recursive_closure_sql(d: str) -> str:
    par = intdiv("c.c_custkey", "10", d)
    return f"""
WITH RECURSIVE chain(custkey, root, depth) AS (
  SELECT c_custkey, c_custkey, CAST(0 AS BIGINT)
  FROM {tbl('customer', d)} WHERE c_custkey < 10
  UNION ALL
  SELECT c.c_custkey, ch.root, ch.depth + 1
  FROM {tbl('customer', d)} c JOIN chain ch ON ch.custkey = {par}
  WHERE c.c_custkey >= 10
)
SELECT depth,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(COUNT(DISTINCT root) AS BIGINT) AS n_roots,
       CAST(MIN(custkey) AS BIGINT) AS min_custkey,
       CAST(MAX(custkey) AS BIGINT) AS max_custkey
FROM chain GROUP BY depth ORDER BY depth
"""


@query(
    "sql_recursive_closure",
    oracle=_recursive_closure_sql("duck"),
    tags=("sql", "recursive", "iterative"),
)
def sql_recursive_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``WITH RECURSIVE`` transitive closure — the iterative-fixpoint SQL
    surface Spark gained in 4.x, exercised on a derived customer forest
    (parent = custkey DIV 10, so depth = digit count and the recursion
    terminates in ~log10 N rounds). Each round is one distributed
    equi-join of the frontier against the base table — exactly how an
    iterative closure should execute on a cluster: the frontier shrinks
    per level, no driver-side loop, no collect. Per-depth rollup keeps
    the output bounded at any SF. DuckDB runs the identical statement as
    the oracle (both engines implement standard SQL:1999 recursion;
    UNION ALL semantics, base-case types pinned with explicit CASTs)."""
    views(spark, sf_dir, "customer")
    return spark.sql(_recursive_closure_sql("spark"))
