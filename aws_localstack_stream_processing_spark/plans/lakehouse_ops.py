"""Lakehouse / table-maintenance operators — the batch machinery a
100 TB training-data lake needs between ingestion and query:

- ``cdc_merge_upsert``     — MERGE a change batch (upserts + deletes,
  latest-change-wins) into a base snapshot via one full-outer join —
  the engine-native form of the reference's keyed idempotent sink
  (signer/index.js:229-242 writes PK-keyed items so re-delivery
  overwrites; MERGE generalizes that to update/delete);
- ``layout_zorder_cluster`` — Z-order (Morton) interleaving of two join
  keys + range bucketing, with per-bucket min/max key spans — the
  data-layout step that makes file skipping work on either key;
- ``text_heavy_hitters_cms`` — a count-min sketch (4 hash rows × 256
  buckets) built as a plain aggregation, then the top-k exact tokens
  joined against the sketch to show the over-estimate bound;
- ``mv_incremental_refresh`` — algebraic materialized-view maintenance:
  stored per-partition partials + delta merge ≡ full recompute;
- ``profile_expectations`` — a Deequ-style constraint suite (uniqueness,
  completeness, bounds, accepted values, referential integrity) fused
  into one metrics scan per table.

Scale notes: the MERGE is one shuffle per side on the merge key (at
100 TB the base table is bucketed on the key, so only the small change
batch moves); the Z-order projection is a narrow map feeding one range
partitioning; the CMS build is a map-side-combinable count per (row,
bucket) — the sketch is 4×256 cells no matter how big the corpus is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dialect import dec_sum, tbl, views
from .registry import query

# ---------------------------------------------------------------------------
# CDC MERGE (upsert + delete, latest-wins).
# ---------------------------------------------------------------------------

_CUTOFF = "TIMESTAMP '1997-01-01 00:00:00'"


def _merge_sql(d: str) -> str:
    return f"""
WITH base AS (
  SELECT o_orderkey AS k, o_totalprice AS price
  FROM {tbl('orders', d)} WHERE o_orderdate < {_CUTOFF}
), changes AS (
  SELECT (o_orderkey % 30000) AS k, o_totalprice AS price,
         CASE WHEN o_orderkey % 17 = 0 THEN 'D' ELSE 'U' END AS op,
         o_orderkey AS seq
  FROM {tbl('orders', d)} WHERE o_orderdate >= {_CUTOFF}
), latest AS (
  SELECT k, price, op FROM (
    SELECT k, price, op,
           row_number() OVER (PARTITION BY k ORDER BY seq DESC) AS rn
    FROM changes
  ) x WHERE rn = 1
), merged AS (
  SELECT COALESCE(b.k, c.k) AS k,
         CASE WHEN c.k IS NULL THEN b.price
              WHEN c.op = 'U' THEN c.price END AS price,
         CASE WHEN c.k IS NULL THEN 'kept'
              WHEN c.op = 'D' AND b.k IS NOT NULL THEN 'deleted'
              WHEN c.op = 'D' THEN 'delete_absent'
              WHEN b.k IS NULL THEN 'inserted'
              ELSE 'updated' END AS action
  FROM base b FULL OUTER JOIN latest c ON b.k = c.k
)
SELECT k, price, action FROM merged
WHERE action IN ('kept', 'updated', 'inserted')
"""


@query("cdc_merge_upsert", oracle=_merge_sql("duck"), tags=("lakehouse", "cdc", "join"))
def cdc_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE semantics without a table format: collapse the change batch
    to latest-per-key (one window pass), then resolve
    kept/updated/inserted/deleted in a single full-outer join against
    the base snapshot. Exercises all four MERGE branches on synthetic
    change ops derived deterministically from late orders. One shuffle
    per side on the merge key; with the base bucketed on ``k`` (the
    100 TB layout) only the change batch moves. Engine-native form of
    the reference's PK-overwrite sink (signer/index.js:229-242)."""
    views(spark, sf_dir, "orders")
    return spark.sql(_merge_sql("spark"))


# ---------------------------------------------------------------------------
# Z-order layout clustering.
# ---------------------------------------------------------------------------

_Z_BITS = 11  # covers l_partkey <= 2047 and l_suppkey <= 2047
_Z_BUCKETS = 64


def _morton(pk: str, sk: str) -> str:
    terms = []
    for i in range(_Z_BITS):
        terms.append(f"((({pk} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({sk} >> {i}) & 1) << {2 * i})")
    return " + ".join(terms)


def _zorder_sql(d: str) -> str:
    z = _morton("l_partkey", "l_suppkey")
    width = (1 << (2 * _Z_BITS)) // _Z_BUCKETS
    div = "DIV" if d == "spark" else "//"
    return f"""
WITH zval AS (
  SELECT l_partkey, l_suppkey, ({z}) AS z
  FROM {tbl('lineitem', d)}
), bucketed AS (
  SELECT z {div} {width} AS bucket, l_partkey, l_suppkey FROM zval
)
SELECT bucket, COUNT(*) AS n_rows,
       MIN(l_partkey) AS pk_min, MAX(l_partkey) AS pk_max,
       MIN(l_suppkey) AS sk_min, MAX(l_suppkey) AS sk_max
FROM bucketed GROUP BY bucket
"""


@query(
    "layout_zorder_cluster",
    oracle=_zorder_sql("duck"),
    tags=("lakehouse", "layout", "zorder"),
)
def layout_zorder_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering: interleave the bits of two join keys
    into one sort key, range-bucket on it, and emit per-bucket min/max
    spans of BOTH keys — the statistics file skipping would use. Each
    bucket covers ~1/8 of either key's range (vs 1/64 for a
    single-key sort on one key and no locality on the other), which is
    the whole point of the layout. The interleave is a pure integer
    projection (codegen); the bucketing is one partial+final agg."""
    views(spark, sf_dir, "lineitem")
    return spark.sql(_zorder_sql("spark"))


# ---------------------------------------------------------------------------
# Incremental materialized-view refresh.
# ---------------------------------------------------------------------------

_MV_CUTOFF = "TIMESTAMP '1997-06-01 00:00:00'"


def _mv_full_sql(d: str) -> str:
    """The oracle is the FULL recompute — the query under test must produce
    the same table from stored partials + delta merge."""
    return f"""
SELECT o_custkey,
       {dec_sum('o_totalprice', 2)} AS total_spend,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE)
            / COUNT(*) AS DOUBLE) AS avg_spend
FROM {tbl('orders', d)}
GROUP BY o_custkey
"""


@query(
    "mv_incremental_refresh",
    oracle=_mv_full_sql("duck"),
    tags=("lakehouse", "mv", "incremental"),
)
def mv_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: the pre-cutoff partition's
    per-customer partial state (sum, count — the stored MV) is materialized
    once, the post-cutoff delta is aggregated fresh, and the two merge by
    summing partials; avg re-derives from the merged sums. The oracle is
    the full recompute, proving merge ≡ recompute (the algebraic-aggregate
    contract that lets a 100 TB MV refresh scan only the new partition and
    a |groups|-sized state table instead of the whole history). Decimal
    partials keep the merge order-independent and bit-exact."""
    t = views(spark, sf_dir, "orders")
    orders = t["orders"]

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("o_custkey").agg(
            F.sum(F.col("o_totalprice").cast("decimal(28,2)")).alias("s"),
            F.count("*").alias("c"),
        )

    base = partial(orders.filter(f"o_orderdate < {_MV_CUTOFF}")).persist()
    base.count()  # materialize: this is the "stored" MV state
    delta = partial(orders.filter(f"o_orderdate >= {_MV_CUTOFF}"))
    merged = (
        base.unionByName(delta)
        .groupBy("o_custkey")
        .agg(F.sum("s").alias("s"), F.sum("c").alias("c"))
        .select(
            "o_custkey",
            F.col("s").cast("double").alias("total_spend"),
            F.col("c").cast("bigint").alias("n_orders"),
            (F.col("s").cast("double") / F.col("c")).cast("double").alias("avg_spend"),
        )
    )
    return merged


# ---------------------------------------------------------------------------
# Data-quality expectations suite.
# ---------------------------------------------------------------------------


def _expectations_sql(d: str) -> str:
    """Six constraints over two tables. The metric CTEs are 1-row
    aggregates cross-joined into one combined row, and the vertical
    constraint-per-row reshape is a lateral ``inline``/``unnest`` over that
    single row — a UNION-ALL-per-constraint would be CTE-inlined by Spark
    into one table scan per constraint."""
    checks = [
        ("orders.o_orderkey is unique", "n - n_pk"),
        ("orders.o_custkey is complete", "n_null_cust"),
        ("orders.o_totalprice >= 0", "n_neg_price"),
        ("orders.o_orderstatus in (O,F,P)", "n_bad_status"),
        ("lineitem.l_discount in [0,1]", "n_bad_disc"),
        ("lineitem.l_orderkey references orders", "n_orphan"),
    ]
    if d == "spark":
        recs = ",\n  ".join(
            f"named_struct('constraint_name', '{name}', 'violations', {expr})"
            for name, expr in checks
        )
        reshape = f"""
SELECT t.constraint_name, t.violations,
       CASE WHEN t.violations = 0 THEN 'pass' ELSE 'fail' END AS status
FROM m LATERAL VIEW inline(array(
  {recs}
)) t"""
    else:
        recs = ",\n  ".join(
            f"{{'constraint_name': '{name}', 'violations': {expr}}}"
            for name, expr in checks
        )
        reshape = f"""
, u AS (SELECT unnest([
  {recs}
]) AS rec FROM m)
SELECT rec.constraint_name AS constraint_name, rec.violations AS violations,
       CASE WHEN rec.violations = 0 THEN 'pass' ELSE 'fail' END AS status
FROM u"""
    return f"""
WITH o_metrics AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_pk,
         CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_cust,
         CAST(SUM(CASE WHEN o_totalprice < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_neg_price,
         CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_status
  FROM {tbl('orders', d)}
), l_metrics AS (
  SELECT CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_disc
  FROM {tbl('lineitem', d)}
), ref AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_orphan
  FROM {tbl('lineitem', d)} l
  WHERE NOT EXISTS (SELECT 1 FROM {tbl('orders', d)} o WHERE o.o_orderkey = l.l_orderkey)
), m AS (
  SELECT * FROM o_metrics CROSS JOIN l_metrics CROSS JOIN ref
){reshape}
"""


@query(
    "profile_expectations",
    oracle=_expectations_sql("duck"),
    tags=("lakehouse", "quality", "expectations"),
)
def profile_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style expectation suite: uniqueness, completeness, bounds,
    accepted values, and referential integrity evaluated as ONE metrics row
    per table (conditional aggregates fused into a single scan) plus one
    null-safe anti-join — six constraint rows out, each with its violation
    count and pass/fail status. At 100 TB this is the pre-publish gate a
    lake table runs per partition; the metric rows are constant-size so the
    suite's cost is one scan per table regardless of constraint count."""
    views(spark, sf_dir, "orders", "lineitem")
    return spark.sql(_expectations_sql("spark"))


# ---------------------------------------------------------------------------
# Count-min sketch heavy hitters.
# ---------------------------------------------------------------------------

_CMS_W = 256
_CMS_ROWS = 4
_TOP_K = 20


def _cms_hash(tok: str, row: int, d: str) -> str:
    """Deterministic per-row bucket hash shared by both engines: sha256 of
    the seeded token, low 7 hex digits as the bucket index."""
    if d == "spark":
        h = f"sha2(concat('cms{row}:', {tok}), 256)"
        return f"(CAST(conv(substring({h}, 1, 7), 16, 10) AS BIGINT) % {_CMS_W})"
    h = f"sha256(concat('cms{row}:', {tok}))"
    return f"(CAST(('0x' || substring({h}, 1, 7)) AS BIGINT) % {_CMS_W})"


def _cms_sql(d: str, counts_src: str | None = None) -> str:
    """On the Spark side ``counts_src`` names a pre-materialized token-count
    view — the counts CTE is referenced by all four sketch rows plus the
    top-k probe, and CTE inlining would re-tokenize the corpus once per
    reference."""
    if d == "spark":
        toks = f"SELECT explode(split(text, ' ')) AS tok FROM {tbl('documents', d)}"
    else:
        toks = f"SELECT unnest(string_split(text, ' ')) AS tok FROM {tbl('documents', d)}"
    cell_rows = "\nUNION ALL\n".join(
        f"SELECT {r} AS sk_row, {_cms_hash('tok', r, d)} AS bucket, n FROM counts"
        for r in range(_CMS_ROWS)
    )
    probes = ",\n       ".join(
        f"{_cms_hash('tok', r, d)} AS b{r}" for r in range(_CMS_ROWS)
    )
    least = "LEAST(" + ", ".join(
        f"(SELECT c FROM sketch s WHERE s.sk_row = {r} AND s.bucket = t.b{r})"
        for r in range(_CMS_ROWS)
    ) + ")"
    counts_cte = (
        f"SELECT tok, n FROM {counts_src}"
        if counts_src
        else f"SELECT tok, COUNT(*) AS n FROM ({toks}) x GROUP BY tok"
    )
    return f"""
WITH counts AS (
  {counts_cte}
), cells AS (
  {cell_rows}
), sketch AS (
  SELECT sk_row, bucket, SUM(n) AS c FROM cells GROUP BY sk_row, bucket
), top_tokens AS (
  SELECT tok, n,
       {probes}
  FROM counts ORDER BY n DESC, tok LIMIT {_TOP_K}
)
SELECT tok, n AS true_count, CAST({least} AS BIGINT) AS cms_estimate
FROM top_tokens t
"""


@query(
    "text_heavy_hitters_cms",
    oracle=_cms_sql("duck"),
    tags=("llm", "text", "sketch"),
)
def text_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch heavy hitters: build a 4×256 CMS over the token
    stream as a plain two-level aggregation (token counts collapse
    map-side before the 1024-cell sketch agg), then probe the sketch for
    the exact top-20 tokens — the estimate is provably >= the true count
    and the result exposes both so the bound is visible. The sketch is
    constant-size regardless of corpus scale; only token partial counts
    shuffle. Hash rows use seeded sha256 so both engines bucket
    identically. The token-count table is persisted once — it feeds all
    four sketch rows and the top-k probe, and CTE inlining would otherwise
    re-tokenize the corpus per reference."""
    views(spark, sf_dir, "documents")
    counts = spark.sql(
        f"SELECT tok, COUNT(*) AS n FROM (SELECT explode(split(text, ' ')) AS tok "
        f"FROM {tbl('documents', 'spark')}) x GROUP BY tok"
    ).persist()
    counts.createOrReplaceTempView("slsp_cms_counts")
    return spark.sql(_cms_sql("spark", counts_src="slsp_cms_counts"))
