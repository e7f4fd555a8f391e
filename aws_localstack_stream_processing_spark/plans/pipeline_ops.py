"""Round-4 pipeline operators: domain-balanced sampling, product
quantization, skew diagnostics, class-balance profiling, and
merge-on-read deletes.

These extend the training-data-pipeline surface (SURVEY.md §2
extensions): each is a named two-dialect query with a DuckDB oracle, and
each plan is written for the 100 TB shape first — partitioned windows,
broadcast dimensions, map-side-combinable argmins, decimal addends for
order-independent sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dialect import dec_sum, intdiv, qsample, tbl, to_double_arr, views
from .registry import query

# ---------------------------------------------------------------------------
# data_domain_quota — per-source document quotas (domain balancing).
# ---------------------------------------------------------------------------

_QUOTA_PER_SOURCE = 10


def _domain_quota_sql(d: str) -> str:
    return f"""
WITH ranked AS (
  SELECT source, doc_id, n_chars,
         ROW_NUMBER() OVER (
           PARTITION BY source ORDER BY n_chars DESC, doc_id
         ) AS rank_in_source,
         CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS n_source_docs
  FROM {tbl('documents', d)}
)
SELECT source, doc_id, n_chars,
       CAST(rank_in_source AS BIGINT) AS rank_in_source,
       n_source_docs
FROM ranked
WHERE rank_in_source <= {_QUOTA_PER_SOURCE}
ORDER BY source, rank_in_source
"""


@query("data_domain_quota", oracle=_domain_quota_sql("duck"), tags=("llm", "sampling"))
def data_domain_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-balanced sampling: cap every source (domain) at a fixed
    per-domain quota, keeping its longest documents — the Common-Crawl
    rebalancing step that stops a handful of boilerplate-heavy domains
    from dominating a training mix. One window partitioned on source
    (the domain key), so the plan is a single hash shuffle regardless of
    corpus size; a hot domain bounds its partition at the quota scan,
    not at |corpus|. The deterministic quality proxy (length, doc_id
    tie-break) stands in for a model score column at scale."""
    views(spark, sf_dir, "documents")
    return spark.sql(_domain_quota_sql("spark"))


# ---------------------------------------------------------------------------
# emb_pq_codes — product quantization (the storage half of IVF-PQ).
# ---------------------------------------------------------------------------

_PQ_M = 4  # subspaces
_PQ_SUB = 16  # dims per subspace (4 x 16 = 64 = DIM)
_PQ_CENT_MOD = 50  # codebook = subvectors of every 50th vector


def _l2sq_range(a: str, b: str, lo: int, n: int, d: str) -> str:
    """Squared L2 distance over dims [lo, lo+n) of two DOUBLE arrays with
    a fixed left-to-right summation order (bit-exact across engines).
    Spark arrays are 0-indexed, DuckDB lists 1-indexed."""
    if d == "spark":
        terms = " + ".join(
            f"({a}[{i}] - {b}[{i}]) * ({a}[{i}] - {b}[{i}])"
            for i in range(lo, lo + n)
        )
        return f"(CAST(0 AS DOUBLE) + {terms})"
    return (
        f"list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        f"list_transform(generate_series({lo + 1}, {lo + n}), "
        f"i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i]))), "
        f"(x, y) -> x + y)"
    )


def _pq_oracle() -> str:
    d = "duck"
    dists = ",\n         ".join(
        f"{_l2sq_range('v.emb', 'c.cemb', m * _PQ_SUB, _PQ_SUB, d)} AS d{m}"
        for m in range(_PQ_M)
    )
    arg_ctes = ",\n".join(
        f"""a{m} AS (
  SELECT vec_id, cid AS code{m}, d{m} AS e{m} FROM (
    SELECT vec_id, cid, d{m},
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d{m}, cid) AS rn
    FROM dists
  ) r WHERE rn = 1
)"""
        for m in range(_PQ_M)
    )
    err = " + ".join(f"e{m}" for m in range(_PQ_M))
    joins = " ".join(f"JOIN a{m} USING (vec_id)" for m in range(1, _PQ_M))
    codes = ", ".join(f"CAST(code{m} AS BIGINT) AS code{m}" for m in range(_PQ_M))
    return f"""
WITH base AS (
  SELECT vec_id, {to_double_arr('embedding', d)} AS emb FROM {tbl('embeddings', d)}
),
cents AS (
  SELECT vec_id AS cid, emb AS cemb FROM base WHERE vec_id % {_PQ_CENT_MOD} = 0
),
dists AS (
  SELECT v.vec_id, c.cid,
         {dists}
  FROM base v CROSS JOIN cents c
),
{arg_ctes}
SELECT vec_id, {codes}, round({err}, 6) AS recon_err
FROM a0 {joins}
ORDER BY vec_id
"""


@query("emb_pq_codes", oracle=_pq_oracle(), tags=("llm", "similarity"))
def emb_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization — the storage half of a billion-scale IVF-PQ
    index (`emb_quantize_int8` is the scalar sibling): split each vector
    into M=4 subvectors, assign each to its nearest codebook entry per
    subspace, and emit the M code ids plus the total reconstruction
    error. 64 doubles compress to 4 codes.

    Scale shape: the codebook broadcasts (it is ~N/50 rows); each
    subspace argmin is a map-side-combinable ``min(struct(dist, cid))``
    aggregation — no window over the (vector x centroid) product, no
    shuffle of the corpus. The per-subspace L2 distances are fixed-order
    sums, so code assignment is bit-identical to the oracle's
    ROW_NUMBER(ORDER BY dist, cid) formulation."""
    views(spark, sf_dir, "embeddings")
    base = spark.sql(
        f"""
SELECT vec_id, {to_double_arr('embedding', 'spark')} AS emb
FROM {tbl('embeddings', 'spark')}
"""
    )
    cents = F.broadcast(
        base.filter(F.col("vec_id") % _PQ_CENT_MOD == 0).select(
            F.col("vec_id").alias("cid"), F.col("emb").alias("cemb")
        )
    )
    j = base.join(cents)
    for m in range(_PQ_M):
        j = j.withColumn(
            f"d{m}",
            F.expr(_l2sq_range("emb", "cemb", m * _PQ_SUB, _PQ_SUB, "spark")),
        )
    agg = j.groupBy("vec_id").agg(
        *[
            F.min(F.struct(F.col(f"d{m}"), F.col("cid"))).alias(f"b{m}")
            for m in range(_PQ_M)
        ]
    )
    err = F.col("b0.d0")
    for m in range(1, _PQ_M):
        err = err + F.col(f"b{m}.d{m}")
    return agg.select(
        "vec_id",
        *[F.col(f"b{m}.cid").cast("bigint").alias(f"code{m}") for m in range(_PQ_M)],
        F.round(err, 6).alias("recon_err"),
    ).orderBy("vec_id")


# ---------------------------------------------------------------------------
# scale_partition_skew_stats — group-size histogram (skew diagnostics).
# ---------------------------------------------------------------------------


def _skew_stats_sql(d: str) -> str:
    return f"""
WITH gc AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM {tbl('events', d)} GROUP BY user_id
)
SELECT CAST(length(bin(cnt)) AS BIGINT) AS size_bucket_log2,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(MIN(cnt) AS BIGINT) AS min_size,
       CAST(MAX(cnt) AS BIGINT) AS max_size,
       CAST(SUM(cnt) AS BIGINT) AS n_rows
FROM gc
GROUP BY 1
ORDER BY 1
"""


@query("scale_partition_skew_stats", oracle=_skew_stats_sql("duck"), tags=("scale",))
def scale_partition_skew_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-skew diagnostics: histogram of per-key group sizes in
    power-of-two buckets (bucket = bit length of the count — ``bin()``
    string length, no libm log). This is the profile you read BEFORE
    choosing a salting factor or AQE skew threshold: a heavy tail in the
    top buckets is the shuffle that OOMs at 100x. Two narrow
    aggregations — per-key counts (one shuffle on the key, the same one
    the diagnosed job would do) and a ~60-row histogram rollup."""
    views(spark, sf_dir, "events")
    return spark.sql(_skew_stats_sql("spark"))


# ---------------------------------------------------------------------------
# profile_gini_impurity — class balance without logarithms.
# ---------------------------------------------------------------------------


def _gini_col(col_expr: str, col_name: str, d: str) -> str:
    # counts are exact; the squared counts accumulate as DECIMAL(38,0)
    # (order-independent, overflow-free at int64-breaking row counts) and
    # only the final ratio is a double
    return f"""
SELECT '{col_name}' AS col_name,
       CAST(COUNT(*) AS BIGINT) AS n_classes,
       CAST(SUM(c) AS BIGINT) AS n_rows,
       round(1 - CAST(SUM(CAST(CAST(c AS DECIMAL(19,0)) * c AS DECIMAL(38,0)))
                      AS DOUBLE)
                 / (CAST(SUM(c) AS DOUBLE) * SUM(c)), 6) AS gini
FROM (
  SELECT {col_expr} AS cls, CAST(COUNT(*) AS BIGINT) AS c
  FROM {tbl('events', d)} GROUP BY {col_expr}
) t
"""


def _gini_sql(d: str) -> str:
    cols = [
        ("event_type", "event_type"),
        (f"{intdiv('user_id', '10', d)}", "user_decile"),
        ("CAST(floor(value / 10) AS BIGINT)", "value_bucket"),
    ]
    return "\nUNION ALL\n".join(
        _gini_col(expr, name, d) for expr, name in cols
    ) + "\nORDER BY col_name"


@query("profile_gini_impurity", oracle=_gini_sql("duck"), tags=("quality", "profiling"))
def profile_gini_impurity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-balance profiling via Gini impurity (1 - sum p_i^2) for a
    set of profiled columns — the log-free alternative to entropy, so
    the statistic is a ratio of exact integers (squared class counts
    accumulate as DECIMAL(38,0): order-independent and overflow-free
    where a BIGINT product would wrap). A collapsed gini (~0) flags a
    dead column, a too-uniform one (~1-1/k) flags synthetic filler —
    both are data-quality tripwires for training mixes. Per column: one
    hash aggregation to class counts (bounded by distinct-class count)
    and a 1-row rollup; columns union — one scan each, no windows."""
    views(spark, sf_dir, "events")
    return spark.sql(_gini_sql("spark"))


# ---------------------------------------------------------------------------
# lake_mor_delete_read — merge-on-read with positional delete vectors.
# ---------------------------------------------------------------------------


def _mor_sql(d: str) -> str:
    return f"""
WITH files AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice,
         o_orderkey % 50 AS file_id,
         {intdiv('o_orderkey', '50', d)} AS pos
  FROM {tbl('orders', d)}
),
dv AS (
  SELECT file_id, pos FROM files WHERE o_orderkey % 19 = 3
)
SELECT f.o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_live,
       {dec_sum('f.o_totalprice')} AS sum_live_price
FROM files f
WHERE NOT EXISTS (
  SELECT 1 FROM dv WHERE dv.file_id = f.file_id AND dv.pos = f.pos
)
GROUP BY f.o_orderstatus
ORDER BY f.o_orderstatus
"""


@query("lake_mor_delete_read", oracle=_mor_sql("duck"), tags=("lakehouse",))
def lake_mor_delete_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read with positional deletes (Iceberg/Delta deletion
    vectors): a delete "file" of (file_id, position) pairs is applied at
    read time as an anti-join on the position key — no rewrite of the
    base files (that is ``lake_compaction_plan``'s job later). The
    delete vector is a small fraction of the table, so Spark broadcasts
    it into the anti-join and the base scan stays one pass; at 100 TB
    the (file_id) component additionally partition-prunes which delete
    entries each task even looks at. Deletes here are a deterministic
    key predicate so both engines build identical vectors."""
    views(spark, sf_dir, "orders")
    return spark.sql(_mor_sql("spark"))


# ---------------------------------------------------------------------------
# dedup_lsh_quality_eval — precision/recall of the LSH dedup pipeline
# against the corpus's injected ground-truth duplicates.
# ---------------------------------------------------------------------------


def _lsh_eval_metric_sql(pred_src: str, d: str) -> str:
    """Shared metric body: per-class recall of the injected duplicate
    pairs plus overall precision of the predicted pair set.
    ``pred_src`` is a relation producing (doc_a, doc_b)."""
    docs = tbl("documents", d)
    return f"""
WITH pred AS ({pred_src}),
truth AS (
  SELECT doc_id AS doc_a, doc_id + 1000000 AS doc_b, 'near_dup' AS pair_class
  FROM {docs} WHERE doc_id % 10 = 0
  UNION ALL
  SELECT doc_id AS doc_a, doc_id + 2000000 AS doc_b, 'exact_copy' AS pair_class
  FROM {docs} WHERE doc_id % 25 = 0
),
by_class AS (
  SELECT t.pair_class,
         CAST(COUNT(*) AS BIGINT) AS n_base,
         CAST(COUNT(p.doc_a) AS BIGINT) AS n_hit
  FROM truth t
  LEFT JOIN pred p ON p.doc_a = t.doc_a AND p.doc_b = t.doc_b
  GROUP BY t.pair_class
),
pred_total AS (
  SELECT 'predicted_total' AS pair_class,
         CAST(COUNT(*) AS BIGINT) AS n_base,
         CAST(COUNT(t.doc_a) AS BIGINT) AS n_hit
  FROM pred p
  LEFT JOIN truth t ON t.doc_a = p.doc_a AND t.doc_b = p.doc_b
)
SELECT pair_class, n_base, n_hit,
       round(CAST(n_hit AS DOUBLE) / n_base, 6) AS ratio
FROM (SELECT * FROM by_class UNION ALL SELECT * FROM pred_total) u
ORDER BY pair_class
"""


def _lsh_eval_oracle() -> str:
    from .llm_ops import _minhash_sql

    return _lsh_eval_metric_sql(_minhash_sql("duck"), "duck")


@query(
    "dedup_lsh_quality_eval",
    oracle=_lsh_eval_oracle(),
    tags=("llm", "dedup", "evaluation"),
)
def dedup_lsh_quality_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup quality as a first-class query: the corpus injects known
    duplicates (exact copies at doc_id+2M, prefixed near-dups at
    doc_id+1M — ``llm_ops._doc_corpus``), so MinHash-LSH's output can be
    scored against ground truth the same way ``sim_ann_recall_eval``
    scores the ANN index. Emits per-class recall (exact_copy / near_dup
    rows: how many injected pairs were found) and overall precision
    (predicted_total row: how many predicted pairs are injected ones —
    extras are natural collisions, a deterministic count here). The
    predicted side runs the REAL ``dedup_minhash_lsh`` operator; the
    truth table is a scan-thin projection, so the eval adds two
    candidate-sized joins on top of the pipeline under test."""
    from .llm_ops import dedup_minhash_lsh

    pred = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    pred.createOrReplaceTempView("slsp_lsh_pred")
    return spark.sql(
        _lsh_eval_metric_sql("SELECT doc_a, doc_b FROM slsp_lsh_pred", "spark")
    )


# ---------------------------------------------------------------------------
# sql_datetime_fn_surface — calendar/date builtin footprint.
# ---------------------------------------------------------------------------


def _date_str(expr: str, d: str) -> str:
    if d == "spark":
        return f"date_format({expr}, 'yyyy-MM-dd')"
    return f"strftime({expr}, '%Y-%m-%d')"


def _datetime_surface_sql(d: str) -> str:
    dt = "CAST(o_orderdate AS DATE)"
    if d == "spark":
        plus_2m = f"add_months({dt}, 2)"
        dow = f"dayofweek({dt})"
        days_since = f"datediff({dt}, DATE '2024-01-01')"
    else:
        plus_2m = f"({dt} + INTERVAL 2 MONTH)"
        dow = f"(dayofweek({dt}) + 1)"  # DuckDB Sunday=0; Spark Sunday=1
        days_since = f"date_diff('day', DATE '2024-01-01', {dt})"
    return f"""
SELECT o_orderkey,
       {_date_str(dt, d)} AS order_date,
       {_date_str(f"date_trunc('month', {dt})", d)} AS month_start,
       {_date_str(f'last_day({dt})', d)} AS month_end,
       {_date_str(plus_2m, d)} AS plus_2_months,
       CAST({dow} AS BIGINT) AS dow_sun1,
       CAST(quarter({dt}) AS BIGINT) AS qtr,
       CAST(weekofyear({dt}) AS BIGINT) AS iso_week,
       CAST(dayofyear({dt}) AS BIGINT) AS doy,
       CAST({days_since} AS BIGINT) AS days_since_2024,
       {_date_str(f'make_date(year({dt}), month({dt}), 1)', d)} AS made_first
FROM {tbl('orders', d)}
WHERE o_orderkey % 97 = 0
ORDER BY o_orderkey
"""


@query("sql_datetime_fn_surface", oracle=_datetime_surface_sql("duck"), tags=("sql",))
def sql_datetime_fn_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-function footprint in one projection: truncation,
    month-end clamping (last_day, add_months on a month-end date), ISO
    week numbering, day-of-week origin (Spark Sunday=1 vs DuckDB
    Sunday=0 — normalized here), day arithmetic, and date construction.
    These are the functions whose origin/clamping conventions silently
    differ between engines; the oracle pins one contract. Pure codegen
    over a pruned scan — no shuffle but the final order."""
    views(spark, sf_dir, "orders")
    return spark.sql(_datetime_surface_sql("spark"))


# ---------------------------------------------------------------------------
# lake_clustering_depth — Z-order/clustering effectiveness metric.
# ---------------------------------------------------------------------------


def _clustering_depth_sql(d: str) -> str:
    return f"""
WITH files AS (
  SELECT CAST(year(l_shipdate) AS BIGINT) AS part_year,
         l_orderkey % 50 AS file_id,
         CAST(MIN(l_partkey) AS BIGINT) AS mn,
         CAST(MAX(l_partkey) AS BIGINT) AS mx
  FROM {tbl('lineitem', d)}
  GROUP BY year(l_shipdate), l_orderkey % 50
),
bounds AS (
  SELECT part_year, mn AS pos, 1 AS delta FROM files
  UNION ALL
  SELECT part_year, mx AS pos, -1 AS delta FROM files
),
swept AS (
  SELECT part_year,
         SUM(delta) OVER (
           PARTITION BY part_year ORDER BY pos, delta DESC
           ROWS UNBOUNDED PRECEDING
         ) AS depth
  FROM bounds
)
SELECT f.part_year,
       CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(MAX(s.max_depth) AS BIGINT) AS max_overlap_depth
FROM files f
JOIN (SELECT part_year, MAX(depth) AS max_depth FROM swept GROUP BY part_year) s
  ON s.part_year = f.part_year
GROUP BY f.part_year
ORDER BY f.part_year
"""


@query("lake_clustering_depth", oracle=_clustering_depth_sql("duck"), tags=("lakehouse",))
def lake_clustering_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clustering-effectiveness metric (Delta OPTIMIZE's "clustering
    depth"): treat each file's [min, max] key span as an interval and
    sweep per partition — +1 at opens, -1 at closes, running-sum max =
    how many files a point lookup must read. Depth 1 = perfectly
    clustered (``layout_zorder_cluster`` is the rewrite that gets you
    there); depth ~ n_files = effectively unclustered. The sweep window
    partitions on part_year and sorts 2 rows per file — manifest-sized
    work, like ``lake_compaction_plan``."""
    views(spark, sf_dir, "lineitem")
    return spark.sql(_clustering_depth_sql("spark"))


# ---------------------------------------------------------------------------
# emb_ivfpq_search — the composed FAISS IVF-PQ search path.
# ---------------------------------------------------------------------------

_IVFPQ_QUERY_MOD = 25
_IVFPQ_NPROBE = 2
_IVFPQ_TOPK = 5
# recall-eval exact-pass cohort: fixed-k hash-rank sample of the serving
# cohort, so the brute-force side stays k·N at any corpus size
_IVFPQ_EVAL_NQ = 12


def _ivfpq_oracle(topk: int = _IVFPQ_TOPK) -> str:
    d = "duck"
    l2full = _l2sq_range("v.emb", "c.cemb", 0, _PQ_M * _PQ_SUB, d)
    dq_cols = ", ".join(
        f"{_l2sq_range('q.emb', 'k.cemb', m * _PQ_SUB, _PQ_SUB, d)} AS dq{m}"
        for m in range(_PQ_M)
    )
    code_dists = ",\n         ".join(
        f"{_l2sq_range('v.emb', 'c.cemb', m * _PQ_SUB, _PQ_SUB, d)} AS d{m}"
        for m in range(_PQ_M)
    )
    arg_ctes = ",\n".join(
        f"""a{m} AS (
  SELECT vec_id, cid AS code{m} FROM (
    SELECT vec_id, cid, ROW_NUMBER() OVER (
      PARTITION BY vec_id ORDER BY d{m}, cid) AS rn
    FROM cdists
  ) r WHERE rn = 1
)"""
        for m in range(_PQ_M)
    )
    code_joins = " ".join(f"JOIN a{m} USING (vec_id)" for m in range(1, _PQ_M))
    adc = " + ".join(f"w{m}.dq{m}" for m in range(_PQ_M))
    dt_joins = "\n        ".join(
        f"JOIN dt w{m} ON w{m}.qid = c.qid AND w{m}.code = k.code{m}"
        for m in range(_PQ_M)
    )
    return f"""
WITH base AS (
  SELECT vec_id, {to_double_arr('embedding', d)} AS emb FROM {tbl('embeddings', d)}
),
cents AS (
  SELECT vec_id AS cid, emb AS cemb FROM base WHERE vec_id % {_PQ_CENT_MOD} = 0
),
afull AS (
  SELECT vec_id, cid FROM (
    SELECT v.vec_id, c.cid,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY {l2full}, c.cid) AS rn
    FROM base v CROSS JOIN cents c
  ) r WHERE rn = 1
),
cdists AS (
  SELECT v.vec_id, c.cid,
         {code_dists}
  FROM base v CROSS JOIN cents c
),
{arg_ctes},
codes AS (SELECT * FROM a0 {code_joins}),
qp AS (
  SELECT qid, cid FROM (
    SELECT v.vec_id AS qid, c.cid,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY {l2full}, c.cid) AS rn
    FROM base v CROSS JOIN cents c
    WHERE v.vec_id % {_IVFPQ_QUERY_MOD} = 0
  ) r WHERE rn <= {_IVFPQ_NPROBE}
),
dt AS (
  SELECT q.vec_id AS qid, k.cid AS code, {dq_cols}
  FROM base q CROSS JOIN cents k
  WHERE q.vec_id % {_IVFPQ_QUERY_MOD} = 0
),
cand AS (
  SELECT p.qid, a.vec_id AS nid
  FROM qp p JOIN afull a ON a.cid = p.cid AND a.vec_id <> p.qid
),
adc AS (
  SELECT c.qid, c.nid, ({adc}) AS adc_d
  FROM cand c JOIN codes k ON k.vec_id = c.nid
        {dt_joins}
)
SELECT qid AS query_id, nid AS neighbor_id,
       CAST(rnk AS BIGINT) AS rnk, round(adc_d, 6) AS adc_dist
FROM (
  SELECT qid, nid, adc_d,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adc_d, nid) AS rnk
  FROM adc
) r WHERE rnk <= {topk}
ORDER BY query_id, rnk
"""


def _ivfpq_recall_oracle() -> str:
    d = "duck"
    l2full = _l2sq_range("q.emb", "n.emb", 0, _PQ_M * _PQ_SUB, d)
    return f"""
WITH ivfpq AS ({_ivfpq_oracle()}),
base AS (
  SELECT vec_id, {to_double_arr('embedding', d)} AS emb FROM {tbl('embeddings', d)}
),
qs AS ({qsample('base', 'vec_id', _IVFPQ_EVAL_NQ, f'vec_id % {_IVFPQ_QUERY_MOD} = 0')}),
exact AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (
             PARTITION BY q.vec_id ORDER BY {l2full}, n.vec_id
           ) AS rnk
    FROM base q JOIN qs ON qs.vec_id = q.vec_id
    JOIN base n ON q.vec_id <> n.vec_id
  ) r WHERE rnk <= {_IVFPQ_TOPK}
)
SELECT e.query_id,
       CAST(COUNT(i.neighbor_id) AS BIGINT) AS n_hits,
       CAST({_IVFPQ_TOPK} AS BIGINT) AS k,
       round(CAST(COUNT(i.neighbor_id) AS DOUBLE) / {_IVFPQ_TOPK}, 6)
         AS recall_at_k
FROM exact e
LEFT JOIN ivfpq i
  ON i.query_id = e.query_id AND i.neighbor_id = e.neighbor_id
GROUP BY e.query_id
ORDER BY e.query_id
"""


@query(
    "sim_ann_ivfpq_recall_eval",
    oracle=_ivfpq_recall_oracle(),
    tags=("llm", "similarity", "evaluation"),
)
def sim_ann_ivfpq_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the full IVF-PQ serving path against the exact L2
    ranking — completing the eval family (LSH and IVF have theirs).
    This measures BOTH approximations at once: cell pruning (nprobe=2)
    and PQ distance distortion (4x16 codes), which is the number a
    retrieval team actually tunes against. At test SF the codebook is
    only ~N/50 entries per subspace, so recall is intentionally coarse
    (~0.2 mean) — the eval exists precisely to make that visible; the
    production fix is a larger trained codebook plus exact re-rank of
    the PQ top-k (``sim_cosine_topk``'s shape). Approximate side = the
    real ``emb_ivfpq_search`` operator; exact side broadcasts the query
    rows over one corpus pass. Floor pinned in tests/test_approx.py."""
    views(spark, sf_dir, "embeddings")
    approx = emb_ivfpq_search(spark, sf_dir).select("query_id", "neighbor_id")
    base = spark.sql(
        f"""
SELECT vec_id, {to_double_arr('embedding', 'spark')} AS emb
FROM {tbl('embeddings', 'spark')}
"""
    )
    # fixed-k hash-rank sample OF the serving cohort (matches the oracle's
    # qs CTE): the exact pass is k·N at any corpus size
    q = F.broadcast(
        base.filter(F.col("vec_id") % _IVFPQ_QUERY_MOD == 0)
        .orderBy(F.expr("(vec_id * 2654435761) % 1048576"), "vec_id")
        .limit(_IVFPQ_EVAL_NQ)
        .select(F.col("vec_id").alias("qid"), F.col("emb").alias("qemb"))
    )
    from pyspark.sql import Window

    l2 = F.expr(_l2sq_range("qemb", "emb", 0, _PQ_M * _PQ_SUB, "spark"))
    we = Window.partitionBy("qid").orderBy(F.col("d"), F.col("vec_id"))
    exact = (
        q.join(base, F.col("qid") != F.col("vec_id"))
        .withColumn("d", l2)
        .withColumn("rnk", F.row_number().over(we))
        .filter(F.col("rnk") <= _IVFPQ_TOPK)
        .select(F.col("qid").alias("query_id"), F.col("vec_id").alias("neighbor_id"))
    )
    # window-derived |q| x k side, no stats: pin the broadcast or the
    # overlap join sort-merges (same fix as sim_ann_ivf_recall_eval)
    hits = F.broadcast(approx.withColumn("hit", F.lit(1)))
    return (
        exact.join(hits, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(F.count("hit").cast("bigint").alias("n_hits"))
        .withColumn("k", F.lit(_IVFPQ_TOPK).cast("bigint"))
        .withColumn(
            "recall_at_k", F.round(F.col("n_hits") / F.lit(_IVFPQ_TOPK), 6)
        )
        .orderBy("query_id")
    )


def _ivfpq_adc_topk(spark: SparkSession, sf_dir: str, topk: int) -> DataFrame:
    """The shared IVF-PQ ADC pipeline, ranked and cut at ``topk`` per
    query: (query_id, neighbor_id, rnk, adc_dist). ``emb_ivfpq_search``
    serves it directly at k=5; ``emb_ivfpq_refine`` pulls a wider cut
    (4k) as the candidate pool for exact re-ranking.

    r13 (guide §2.4): the coarse assignment and the PQ code assignment
    previously ran as TWO independent N×C broadcast crosses (this
    function's ``afull`` pass plus ``emb_pq_codes``'s argmin pass — the
    dominant cost of the whole pipeline), and the per-subspace ADC
    lookups were FOUR sequential broadcast hash joins on (qid, code_m).
    Now ONE N×C cross computes the four subspace distances AND the
    full-dim distance (``dfull`` stays the oracle's flat 64-term fold —
    NOT d0+d1+d2+d3, whose different summation order could flip argmin
    ties), and one aggregation emits all five argmins (coarse cell +
    four codes, bit-identical winners to the oracle's per-ranking
    ROW_NUMBER); the codes then ride the candidate row, deleting the
    old candidate→codes re-join. The four per-subspace ADC lookups stay
    HASH joins against the broadcast distance table: a per-qid
    code→values map was tried and REVERTED — Spark map literals are
    array-backed, so ``element_at`` is an O(|codebook|) linear scan per
    candidate (O(N²) total; measured 2.13 s → 181 s at sf0.1 before the
    revert). Plan: 3 BNLJ crosses → 2, and the corpus is
    scanned/quantized once instead of twice."""
    views(spark, sf_dir, "embeddings")
    base = spark.sql(
        f"""
SELECT vec_id, {to_double_arr('embedding', 'spark')} AS emb
FROM {tbl('embeddings', 'spark')}
"""
    ).persist()
    cents = F.broadcast(
        base.filter(F.col("vec_id") % _PQ_CENT_MOD == 0).select(
            F.col("vec_id").alias("cid"), F.col("emb").alias("cemb")
        )
    )
    l2full = F.expr(_l2sq_range("emb", "cemb", 0, _PQ_M * _PQ_SUB, "spark"))
    scored = base.join(cents).withColumn("dfull", l2full)
    for m in range(_PQ_M):
        scored = scored.withColumn(
            f"d{m}",
            F.expr(_l2sq_range("emb", "cemb", m * _PQ_SUB, _PQ_SUB, "spark")),
        )
    # ONE pass over the N×C product: coarse argmin (dfull) and the four
    # per-subspace argmins (the emb_pq_codes assignment, same expressions,
    # same min(struct(dist, cid)) winner) in a single map-side-combinable
    # aggregation — no window, no second cross
    assign = (
        scored.groupBy("vec_id")
        .agg(
            F.min(F.struct(F.col("dfull"), F.col("cid"))).alias("bf"),
            *[
                F.min(F.struct(F.col(f"d{m}"), F.col("cid"))).alias(f"b{m}")
                for m in range(_PQ_M)
            ],
        )
        .select(
            "vec_id",
            F.col("bf.cid").alias("cid"),
            *[F.col(f"b{m}.cid").alias(f"code{m}") for m in range(_PQ_M)],
        )
    )
    # query side: top-nprobe cells (tiny side, window is fine)
    from pyspark.sql import Window

    qscored = scored.filter(F.col("vec_id") % _IVFPQ_QUERY_MOD == 0)
    wq = Window.partitionBy("vec_id").orderBy(F.col("dfull"), F.col("cid"))
    # probe list is |queries| x nprobe rows — the serving batch bounds it,
    # so it broadcasts into the cell join (the corpus side never shuffles
    # to meet it)
    qp = F.broadcast(
        qscored.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= _IVFPQ_NPROBE)
        .select(F.col("vec_id").alias("qid"), "cid")
    )
    # per-query ADC distance table over the codebook: |q| x K x M doubles;
    # the dq_m expressions are scored's d_m restricted to query rows —
    # bit-identical values to a fresh query-side cross
    dt = F.broadcast(
        qscored.select(
            F.col("vec_id").alias("qid"),
            F.col("cid").alias("code"),
            *[F.col(f"d{m}").alias(f"dq{m}") for m in range(_PQ_M)],
        )
    )
    # the candidate list (|q| x cell-size x nprobe, serving-batch bounded):
    # the broadcast probe list joins the fused assignment table ONCE on
    # cid — the codes ride along on the same row, so the old second join
    # (candidate list back into the corpus-sized codes table) is gone and
    # ``assign`` (the N×C aggregation) is referenced exactly once
    cand = F.broadcast(qp).join(
        assign.withColumnRenamed("vec_id", "nid"), "cid"
    ).filter(F.col("nid") != F.col("qid")).select(
        "qid", "nid", *[f"code{m}" for m in range(_PQ_M)]
    )
    adc = cand
    for m in range(_PQ_M):
        w = dt.select(
            F.col("qid").alias("qid_w"),
            F.col("code").alias(f"wcode{m}"),
            f"dq{m}",
        )
        adc = adc.join(
            w,
            (F.col("qid") == F.col("qid_w"))
            & (F.col(f"code{m}") == F.col(f"wcode{m}")),
        ).drop("qid_w", f"wcode{m}")
    adc_col = F.col("dq0")
    for m in range(1, _PQ_M):
        adc_col = adc_col + F.col(f"dq{m}")
    wr = Window.partitionBy("qid").orderBy(F.col("adc_d"), F.col("nid"))
    return (
        adc.withColumn("adc_d", adc_col)
        .withColumn("rnk", F.row_number().over(wr))
        .filter(F.col("rnk") <= topk)
        .select(
            F.col("qid").alias("query_id"),
            F.col("nid").alias("neighbor_id"),
            F.col("rnk").cast("bigint").alias("rnk"),
            F.round("adc_d", 6).alias("adc_dist"),
        )
        .orderBy("query_id", "rnk")
    )


@query("emb_ivfpq_search", oracle=_ivfpq_oracle(), tags=("llm", "similarity"))
def emb_ivfpq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed FAISS IVF-PQ search path: coarse-quantize the corpus
    into inverted lists, store each vector as M=4 PQ codes (via the
    ``emb_pq_codes`` operator), then answer queries by scanning only the
    nprobe=2 probed cells and scoring candidates with ASYMMETRIC
    distance computation — each query precomputes a (codebook-entry x
    subspace) distance table and a candidate costs 4 table lookups
    instead of a 64-dim distance. This is how a billion-vector index
    actually serves: the scan reads 4-byte codes, not raw vectors.

    Scale shape: centroids and the per-query distance tables broadcast
    (|q| x K x M doubles); candidate scoring is equi-joins on (cell) and
    (code) keys — the corpus-sized tables never shuffle for a window;
    per-query top-k ranks probed candidates only. Every distance is a
    fixed-order L2 sum, so ranks are bit-identical to the oracle."""
    return _ivfpq_adc_topk(spark, sf_dir, _IVFPQ_TOPK)


_REFINE_R = 4 * _IVFPQ_TOPK  # exact-rescore pool: the standard 4k cut


def _ivfpq_refine_oracle() -> str:
    d = "duck"
    l2 = _l2sq_range("q.emb", "n.emb", 0, _PQ_M * _PQ_SUB, d)
    return f"""
WITH pool AS ({_ivfpq_oracle(_REFINE_R)}),
base AS (
  SELECT vec_id, {to_double_arr('embedding', d)} AS emb FROM {tbl('embeddings', d)}
),
ex AS (
  SELECT p.query_id, p.neighbor_id, p.adc_dist, {l2} AS exact_d
  FROM pool p
  JOIN base q ON q.vec_id = p.query_id
  JOIN base n ON n.vec_id = p.neighbor_id
)
SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS rnk,
       round(exact_d, 6) AS exact_dist, adc_dist
FROM (
  SELECT query_id, neighbor_id, adc_dist, exact_d,
         ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY exact_d, neighbor_id) AS rnk
  FROM ex
) r WHERE rnk <= {_IVFPQ_TOPK}
ORDER BY query_id, rnk
"""


@query("emb_ivfpq_refine", oracle=_ivfpq_refine_oracle(), tags=("llm", "similarity"))
def emb_ivfpq_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ + exact-rescore refine (VERDICT r6 #8) — the standard FAISS
    ``IndexRefineFlat`` serving stack: the ADC stage returns a WIDER top-4k
    pool per query (candidate-bounded by construction: |q| x 4k rows, the
    PQ scan already did the heavy pruning), then ONLY those candidates'
    raw vectors are fetched for an exact L2 re-rank that emits the final
    top-k. This repairs the PQ distance distortion that dominates the
    coarse codebook's recall loss (floor pinned strictly above the
    PQ-only number in tests/test_approx.py) while reading |q| x 4k raw
    vectors instead of the corpus. The pool broadcasts into the
    vector-table joins — the corpus never shuffles; the exact distance is
    the same fixed-order L2 fold, so ranks are bit-identical to the
    oracle."""
    from pyspark.sql import Window

    pool = F.broadcast(
        _ivfpq_adc_topk(spark, sf_dir, _REFINE_R).select(
            "query_id", "neighbor_id", "adc_dist"
        )
    )
    base = spark.sql(
        f"""
SELECT vec_id, {to_double_arr('embedding', 'spark')} AS emb
FROM {tbl('embeddings', 'spark')}
"""
    )
    qv = base.select(F.col("vec_id").alias("query_id"), F.col("emb").alias("qemb"))
    nv = base.select(
        F.col("vec_id").alias("neighbor_id"), F.col("emb").alias("nemb")
    )
    l2 = F.expr(_l2sq_range("qemb", "nemb", 0, _PQ_M * _PQ_SUB, "spark"))
    wr = Window.partitionBy("query_id").orderBy(
        F.col("exact_d"), F.col("neighbor_id")
    )
    return (
        pool.join(qv, "query_id")
        .join(nv, "neighbor_id")
        .withColumn("exact_d", l2)
        .withColumn("rnk", F.row_number().over(wr))
        .filter(F.col("rnk") <= _IVFPQ_TOPK)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rnk").cast("bigint").alias("rnk"),
            F.round("exact_d", 6).alias("exact_dist"),
            "adc_dist",
        )
        .orderBy("query_id", "rnk")
    )


# ---------------------------------------------------------------------------
# graph_jaccard_link_predict — common-neighbor link prediction.
# ---------------------------------------------------------------------------

_LINK_COHORT_MOD = 20  # query cohort: every 20th customer
_LINK_TOPN = 50


def _link_predict_sql(d: str) -> str:
    return f"""
WITH fwd AS (
  SELECT DISTINCT o.o_custkey AS cust, l.l_suppkey AS supp
  FROM {tbl('orders', d)} o JOIN {tbl('lineitem', d)} l
    ON o.o_orderkey = l.l_orderkey
),
deg AS (
  SELECT cust, CAST(COUNT(*) AS BIGINT) AS degree FROM fwd GROUP BY cust
),
cohort AS (
  SELECT cust, supp FROM fwd WHERE cust % {_LINK_COHORT_MOD} = 0
),
common AS (
  SELECT a.cust AS cust_a, b.cust AS cust_b,
         CAST(COUNT(*) AS BIGINT) AS n_common
  FROM cohort a JOIN cohort b ON a.supp = b.supp AND a.cust < b.cust
  GROUP BY a.cust, b.cust
),
scored AS (
  SELECT c.cust_a, c.cust_b, c.n_common,
         round(CAST(c.n_common AS DOUBLE)
               / (da.degree + db.degree - c.n_common), 6) AS jaccard
  FROM common c
  JOIN deg da ON da.cust = c.cust_a
  JOIN deg db ON db.cust = c.cust_b
)
SELECT cust_a, cust_b, n_common, jaccard
FROM scored
ORDER BY jaccard DESC, cust_a, cust_b
LIMIT {_LINK_TOPN}
"""


@query(
    "graph_jaccard_link_predict",
    oracle=_link_predict_sql("duck"),
    tags=("graph", "similarity"),
)
def graph_jaccard_link_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-neighbor link prediction over the customer ↔ supplier
    bipartite graph (the graph the PageRank/triangle operators share):
    for a query cohort of customers, score candidate customer pairs by
    neighbor-set Jaccard — the classic "users like you" recommendation
    primitive. Candidates come from a wedge join through shared
    suppliers restricted to the cohort (cost ~ sum of squared
    per-supplier cohort degrees — the same degree-bounding story as
    ``graph_triangle_count``; at 100 TB the cohort IS the bounding
    knob, exactly how production recommenders batch their query users).
    Scores are ratios of exact counts; top-k is ORDER BY + LIMIT
    (TakeOrderedAndProject, no global sort)."""
    views(spark, sf_dir, "orders", "lineitem")
    return spark.sql(_link_predict_sql("spark"))


# ---------------------------------------------------------------------------
# profile_benford_check — first-digit distribution vs Benford's law.
# ---------------------------------------------------------------------------

# round(1000 * log10(1 + 1/d)) for d = 1..9, precomputed so no libm call
# ever runs inside either engine.
_BENFORD_PERMILLE = {1: 301, 2: 176, 3: 125, 4: 97, 5: 79, 6: 67, 7: 58, 8: 51, 9: 46}


def _benford_sql(d: str) -> str:
    exp_case = " ".join(
        f"WHEN {dig} THEN {pm}" for dig, pm in _BENFORD_PERMILLE.items()
    )
    return f"""
WITH cents AS (
  SELECT CAST(floor(value * 100) AS BIGINT) AS c
  FROM {tbl('events', d)} WHERE value >= 0.01
),
digits AS (
  SELECT CAST(substr(CAST(c AS {'STRING' if d == 'spark' else 'VARCHAR'}), 1, 1)
              AS BIGINT) AS first_digit
  FROM cents
),
obs AS (
  SELECT first_digit, CAST(COUNT(*) AS BIGINT) AS n_obs FROM digits
  GROUP BY first_digit
),
with_tot AS (
  -- total as a window over the 9-row aggregate: one scan of events,
  -- no re-inlined scalar subquery (Spark inlines CTEs per reference)
  SELECT first_digit, n_obs, SUM(n_obs) OVER () AS n FROM obs
)
SELECT first_digit, n_obs,
       round(CAST(1000 * n_obs AS DOUBLE) / n, 6) AS obs_permille,
       CAST(CASE first_digit {exp_case} END AS BIGINT) AS benford_permille,
       round(CAST(1000 * n_obs AS DOUBLE) / n
             - CASE first_digit {exp_case} END, 6) AS deviation
FROM with_tot
ORDER BY first_digit
"""


@query("profile_benford_check", oracle=_benford_sql("duck"), tags=("quality", "profiling"))
def profile_benford_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit distribution vs Benford's law — the
    anomaly/fabrication tripwire for financial-style value columns
    (organically-generated magnitudes follow log-uniform first digits;
    uniform or hand-made data does not). The Benford expectations are
    precomputed permille constants, so no logarithm runs in either
    engine; first digits come from integer-cents string heads (floor,
    not round — exact in both engines). One scan, a 9-row aggregation,
    and a scalar total joined back — profiling cost ~ counting."""
    views(spark, sf_dir, "events")
    return spark.sql(_benford_sql("spark"))
