"""Runtime-filter (bloom) semi-join pruning — the pattern behind Spark's
``spark.sql.optimizer.runtime.bloomFilter.enabled`` and dynamic partition
pruning, made explicit and cross-engine deterministic so the oracle can
verify it bit-for-bit.

A selective dimension predicate yields a key set; instead of shuffling the
100 TB fact side into a semi join, the keys are folded into a constant-size
bloom filter (here: the set of occupied bit positions, ≤ m = 8192 rows no
matter how many keys), which broadcasts to every fact scan and prunes rows
before any shuffle. Surviving rows (true hits + bounded false positives)
are then exact-verified. The query reports all three outcome classes so the
false-positive bound is visible in the result.

Scale notes: the occupied-position table is ≤ m rows regardless of |dim| —
always broadcastable; the fact side is scanned once, map-side, with three
broadcast-hash semi probes and no shuffle until the final 3-row outcome
aggregation. Hash rows use seeded sha256 so Spark and DuckDB bucket
identically (same discipline as text_heavy_hitters_cms).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .dialect import dec_sum, tbl, views
from .registry import query

_M = 8192  # bloom width (bits / positions)
_K = 3  # hash rows

_DIM_PRED = (
    "o_orderpriority = '1-URGENT' AND o_orderdate >= TIMESTAMP '1997-06-01 00:00:00'"
)


def _pos(key_expr: str, row: int, d: str) -> str:
    """Seeded per-row bloom position: sha256 of the seeded key, low 7 hex
    digits as the bucket — identical text semantics in both engines."""
    if d == "spark":
        h = f"sha2(concat('bf{row}:', CAST({key_expr} AS STRING)), 256)"
        return f"(CAST(conv(substring({h}, 1, 7), 16, 10) AS BIGINT) % {_M})"
    h = f"sha256(concat('bf{row}:', CAST({key_expr} AS VARCHAR)))"
    return f"(CAST(('0x' || substring({h}, 1, 7)) AS BIGINT) % {_M})"


def _bloom_sql(d: str, dim_src: str | None = None, occ_src: str | None = None) -> str:
    """Full query text. On the Spark side ``dim_src``/``occ_src`` name
    pre-materialized temp views (the occupied set is persisted once instead
    of being rebuilt by CTE inlining under each of the three probes); the
    oracle renders the same logic as pure CTEs."""
    occupied_rows = "\n    UNION ALL\n    ".join(
        f"SELECT {_pos('k', r, d)} AS pos FROM dim_keys" for r in range(_K)
    )
    probe_cols = ",\n         ".join(
        f"{_pos('l_orderkey', r, d)} AS p{r}" for r in range(_K)
    )
    # EXISTS, not IN: a projected `x IN (subquery)` carries three-valued
    # null-aware semantics, which Spark must plan as a BroadcastNestedLoopJoin
    # with an `= OR isnull(=)` condition — per-row × per-position comparisons
    # with the hash recomputed inside the join condition. Correlated equality
    # EXISTS plans as a broadcast-hash ExistenceJoin keyed on the
    # once-projected position column (~1000× faster, same result: positions
    # and keys are never null here).
    gate = " AND ".join(
        f"EXISTS (SELECT 1 FROM occupied o WHERE o.pos = pr.p{r})"
        for r in range(_K)
    )
    if dim_src and occ_src:
        # pre-materialized views: alias them under the CTE names the rest of
        # the query references
        head = f"""
WITH dim_keys AS (
  SELECT k FROM {dim_src}
), occupied AS (
  SELECT pos FROM {occ_src}
)"""
    else:
        head = f"""
WITH dim_keys AS (
  SELECT o_orderkey AS k FROM {tbl('orders', d)} WHERE {_DIM_PRED}
), occupied AS (
  SELECT DISTINCT pos FROM (
    {occupied_rows}
  ) p
)"""
    return f"""{head}, probe AS (
  SELECT l_orderkey, l_extendedprice,
         {probe_cols}
  FROM {tbl('lineitem', d)}
), gated AS (
  SELECT l_orderkey, l_extendedprice,
         ({gate}) AS bloom_pass,
         EXISTS (SELECT 1 FROM dim_keys dk WHERE dk.k = pr.l_orderkey) AS exact_hit
  FROM probe pr
)
SELECT CASE WHEN NOT bloom_pass THEN 'pruned'
            WHEN exact_hit THEN 'hit'
            ELSE 'false_positive' END AS outcome,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       {dec_sum('l_extendedprice', 2)} AS revenue
FROM gated
GROUP BY 1
"""


@query(
    "scale_bloom_runtime_filter",
    oracle=_bloom_sql("duck"),
    tags=("scale", "join", "runtime-filter"),
)
def scale_bloom_runtime_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom runtime-filter pruning: fold a selective dimension's keys into
    an ≤8192-row occupied-position set (constant-size whatever |dim| is),
    broadcast-probe the fact scan with k=3 seeded hashes, and exact-verify
    only the survivors. Emits pruned / hit / false_positive row counts so
    the bloom's one-sided error (a real hit can never be pruned — asserted
    in tests/test_plans.py) and its false-positive rate are both visible.
    The exact-hit column here exists for the verification readout; the
    production path probes only the bloom and verifies by joining the
    survivors, never the full scan.

    The dim-key and occupied-position tables are persisted before the
    probes: plain CTEs would be inlined under each of the three ExistenceJoin
    subtrees, rescanning the dimension table up to 10×."""
    views(spark, sf_dir, "orders", "lineitem")
    dim = spark.sql(
        f"SELECT o_orderkey AS k FROM {tbl('orders', 'spark')} WHERE {_DIM_PRED}"
    ).persist()
    dim.createOrReplaceTempView("slsp_bf_dim_keys")
    occ_union = "\n  UNION ALL\n  ".join(
        f"SELECT {_pos('k', r, 'spark')} AS pos FROM slsp_bf_dim_keys"
        for r in range(_K)
    )
    occ = spark.sql(f"SELECT DISTINCT pos FROM (\n  {occ_union}\n) p").persist()
    occ.createOrReplaceTempView("slsp_bf_occupied")
    return spark.sql(
        _bloom_sql("spark", dim_src="slsp_bf_dim_keys", occ_src="slsp_bf_occupied")
    )
