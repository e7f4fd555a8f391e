"""Round-4 curation & diagnostics operators: per-domain boilerplate
mining, duplicated-span accounting, Matryoshka truncation evaluation,
IVF cell-balance diagnostics, deterministic sampling, theta-sketch set
operations, robust (MAD) outlier detection, and range-partition
boundary planning.

These extend the training-data-pipeline surface (SURVEY.md §2
extensions): each is a named two-dialect query with a DuckDB oracle,
and each plan is written for the 100 TB shape first — every window is
partitioned, heavy work is keyed on high-cardinality columns (ngram /
shingle / cell id), and global order is only ever materialised through
the two-phase bucket-numbering idiom or ``TakeOrderedAndProject``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import hashing
from .cachelife import LiveCache
from .dialect import intdiv, qsample, tbl, to_double_arr, dot, views
from .llm_ops import DIM
from .registry import query

# ---------------------------------------------------------------------------
# text_boilerplate_ngrams — per-domain boilerplate mining (CCNet-style).
# ---------------------------------------------------------------------------

_BP_N = 2  # ngram width
_BP_MIN_DF = 3  # minimum documents an ngram must appear in
_BP_TOP = 10  # boilerplate candidates kept per source


def _bp_ngrams(d: str) -> str:
    if d == "spark":
        return f"""
grams AS (
  SELECT doc_id, source,
         explode(transform(sequence(0, size(w) - {_BP_N}),
                           i -> concat_ws(' ', slice(w, i + 1, {_BP_N}))))
           AS ngram
  FROM (SELECT doc_id, source, split(text, ' ') AS w
        FROM {tbl('documents', d)})
  WHERE size(w) >= {_BP_N}
)"""
    return f"""
grams AS (
  SELECT doc_id, source,
         unnest(list_transform(
           range(0, len(w) - {_BP_N} + 1),
           i -> array_to_string(list_slice(w, i + 1, i + {_BP_N}), ' ')))
           AS ngram
  FROM (SELECT doc_id, source, string_split(text, ' ') AS w
        FROM {tbl('documents', d)})
  WHERE len(w) >= {_BP_N}
)"""


def _boilerplate_sql(d: str) -> str:
    return f"""
WITH {_bp_ngrams(d)},
src_docs AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM {tbl('documents', d)} GROUP BY source
),
df AS (
  SELECT source, ngram, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS doc_freq
  FROM grams GROUP BY source, ngram
),
ranked AS (
  SELECT source, ngram, doc_freq,
         ROW_NUMBER() OVER (
           PARTITION BY source ORDER BY doc_freq DESC, ngram
         ) AS rnk
  FROM df WHERE doc_freq >= {_BP_MIN_DF}
)
SELECT r.source, r.ngram, r.doc_freq, s.n_docs,
       round(CAST(r.doc_freq AS DOUBLE) / s.n_docs, 6) AS df_frac,
       CAST(r.rnk AS BIGINT) AS rnk
FROM ranked r JOIN src_docs s ON s.source = r.source
WHERE r.rnk <= {_BP_TOP}
ORDER BY r.source, r.rnk
"""


@query(
    "text_boilerplate_ngrams",
    oracle=_boilerplate_sql("duck"),
    tags=("llm", "text", "dedup"),
)
def text_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain boilerplate mining in the CCNet style (Wenzek et al.
    2020, public — CCNet removes lines that repeat across pages of the
    same domain): rank every word 2-gram by its document frequency
    within its source (domain) and keep the top 10 that appear in ≥3
    documents. Navigation chrome, cookie banners, and footer text all
    surface here long before whole-document dedup would catch them. The
    sliding-ngram expansion is a narrow codegen map; the DF count keys
    on the high-cardinality (source, ngram) pair, the rank window
    partitions on source bounded by that source's vocabulary, and the
    tiny per-source doc-count table broadcasts. Cost scales with token
    count, never |corpus|²."""
    views(spark, sf_dir, "documents")
    return spark.sql(_boilerplate_sql("spark"))


# ---------------------------------------------------------------------------
# text_dup_span_fraction — sliding-window duplicated-span accounting.
# ---------------------------------------------------------------------------

_SPAN_W = 8  # words per sliding shingle, stride 1


def _span_shingles(d: str) -> str:
    if d == "spark":
        return f"""
spans AS (
  SELECT doc_id,
         explode(transform(sequence(0, size(w) - {_SPAN_W}),
                           i -> concat_ws(' ', slice(w, i + 1, {_SPAN_W}))))
           AS span
  FROM (SELECT doc_id, split(text, ' ') AS w FROM {tbl('documents', d)})
  WHERE size(w) >= {_SPAN_W}
)"""
    return f"""
spans AS (
  SELECT doc_id,
         unnest(list_transform(
           range(0, len(w) - {_SPAN_W} + 1),
           i -> array_to_string(list_slice(w, i + 1, i + {_SPAN_W}), ' ')))
           AS span
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM {tbl('documents', d)})
  WHERE len(w) >= {_SPAN_W}
)"""


def _dup_span_sql(d: str) -> str:
    return f"""
WITH {_span_shingles(d)},
freq AS (
  SELECT span, CAST(COUNT(*) AS BIGINT) AS n_occ FROM spans GROUP BY span
)
SELECT s.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_spans,
       CAST(SUM(CASE WHEN f.n_occ > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_spans,
       round(CAST(SUM(CASE WHEN f.n_occ > 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS dup_frac
FROM spans s JOIN freq f ON f.span = s.span
GROUP BY s.doc_id
ORDER BY s.doc_id
"""


@query(
    "text_dup_span_fraction",
    oracle=_dup_span_sql("duck"),
    tags=("llm", "text", "dedup"),
)
def text_dup_span_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated-span fraction per document, the corpus statistic behind
    exact-substring dedup (Lee et al. 2022, "Deduplicating Training Data
    Makes Language Models Better", public): slide an 8-word window with
    stride 1 over every document and report the fraction of positions
    whose span also occurs anywhere else in the corpus. Unlike
    ``text_chunk_dedup`` (disjoint chunks), the stride-1 windows catch
    duplicated passages at ANY alignment — the suffix-array result,
    approximated with fixed-width shingles. Row count is the corpus
    token count (not squared); both shuffles key on the span hash, so
    partitions stay balanced at 100 TB, and the span-frequency count is
    map-side combinable.

    Spark path (r13): the raw span table headed a diamond (frequency
    count AND the per-doc join both read it), so the split+slide
    expansion ran TWICE, and both shuffles carried raw position rows.
    Now ONE expansion pass folds to per-(doc_id, span) counts ``k``
    (map-side combinable — guide §2.3: aggregate before you shuffle),
    that far smaller table persists, and the same integers re-derive:
    n_occ = SUM(k) over docs, n_spans = SUM(k) per doc, dup positions =
    SUM(k) over globally-duplicated spans (guide §5; expansion passes
    2→1, shuffle rows: positions → distinct (doc, span) pairs)."""
    views(spark, sf_dir, "documents")
    g = spark.sql(_span_group_spark_sql()).persist()
    g.createOrReplaceTempView("slsp_span_g")
    return spark.sql(
        _dup_span_over_groups("slsp_span_g") + "ORDER BY s.doc_id\n"
    )


def _span_group_spark_sql() -> str:
    """Per-(doc_id, span) position counts ``k`` as a CTE-free
    (persistable) plan — ONE split+slide expansion pass, folded
    map-side before any shuffle (guide §2.3)."""
    return f"""
SELECT doc_id, span, CAST(COUNT(*) AS BIGINT) AS k
FROM (
  SELECT doc_id,
         explode(transform(sequence(0, size(w) - {_SPAN_W}),
                           i -> concat_ws(' ', slice(w, i + 1, {_SPAN_W}))))
           AS span
  FROM (SELECT doc_id, split(text, ' ') AS w FROM {tbl('documents', 'spark')})
  WHERE size(w) >= {_SPAN_W}
) spans
GROUP BY doc_id, span
"""


def _dup_span_over_groups(g_src: str) -> str:
    """The dup-span accounting over a persisted (doc_id, span, k) group
    view — the same integers as _dup_span_sql: n_occ = SUM(k) over docs,
    n_spans = SUM(k) per doc, dup positions = SUM(k) over spans whose
    global count exceeds 1."""
    return f"""
WITH freq AS (
  SELECT span, CAST(SUM(k) AS BIGINT) AS n_occ FROM {g_src} GROUP BY span
)
SELECT s.doc_id,
       CAST(SUM(s.k) AS BIGINT) AS n_spans,
       CAST(SUM(CASE WHEN f.n_occ > 1 THEN s.k ELSE 0 END) AS BIGINT)
         AS n_dup_spans,
       round(CAST(SUM(CASE WHEN f.n_occ > 1 THEN s.k ELSE 0 END) AS DOUBLE)
             / SUM(s.k), 6) AS dup_frac
FROM {g_src} s JOIN freq f ON f.span = s.span
GROUP BY s.doc_id
"""


# ---------------------------------------------------------------------------
# emb_matryoshka_recall — truncated-dimension retrieval evaluation.
# ---------------------------------------------------------------------------

_MRL_DIM = 16  # truncated prefix dimensionality
_MRL_NQ = 16  # fixed-size hash-rank query cohort (exact pass stays k·N)
_MRL_K = 5


def _mrl_recall_sql(d: str) -> str:
    # Both rankings ride ONE query x corpus pass: the full-dim and
    # truncated similarities are two columns of the same joined row, and
    # two stacked rank windows (same partitioning, different order) give
    # rf/rt side by side — so the top-k intersection is the same-row
    # predicate rf<=k AND rt<=k, no rank-set self-join.
    return f"""
WITH base AS (
  SELECT vec_id, {to_double_arr('embedding', d)} AS emb
  FROM {tbl('embeddings', d)}
),
normed AS (
  SELECT vec_id, emb,
         sqrt({dot('emb', 'emb', DIM, d)}) AS nrm,
         sqrt({dot('emb', 'emb', _MRL_DIM, d)}) AS tnrm
  FROM base
),
qs AS ({qsample('normed', 'vec_id', _MRL_NQ)}),
pairs AS (
  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
         {dot('q.emb', 'n.emb', DIM, d)} / (q.nrm * n.nrm) AS full_sim,
         {dot('q.emb', 'n.emb', _MRL_DIM, d)} / (q.tnrm * n.tnrm) AS trunc_sim
  FROM normed q JOIN qs ON qs.vec_id = q.vec_id
  JOIN normed n ON q.vec_id <> n.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY full_sim DESC, neighbor_id
         ) AS rf,
         ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY trunc_sim DESC, neighbor_id
         ) AS rt
  FROM pairs
)
SELECT query_id,
       CAST(SUM(CASE WHEN rf <= {_MRL_K} AND rt <= {_MRL_K}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
       CAST({_MRL_K} AS BIGINT) AS k,
       round(CAST(SUM(CASE WHEN rf <= {_MRL_K} AND rt <= {_MRL_K}
                           THEN 1 ELSE 0 END) AS DOUBLE) / {_MRL_K}, 6)
         AS recall_at_k
FROM ranked
GROUP BY query_id
ORDER BY query_id
"""


@query(
    "emb_matryoshka_recall",
    oracle=_mrl_recall_sql("duck"),
    tags=("llm", "similarity", "evaluation"),
)
def emb_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of 16-dim-truncated cosine retrieval against the full
    64-dim ranking — the evaluation behind Matryoshka Representation
    Learning (Kusupati et al. 2022, public): MRL-trained embeddings are
    served truncated to a prefix of their dimensions, trading 4× less
    vector I/O for a measurable recall hit, and this query measures that
    hit per query. Both rankings share ONE query x corpus join (the two
    similarities are columns of the same row) and two stacked windows on
    the same query-id partitioning — one shuffle, two sorts — so the
    top-k intersection is a same-row predicate, never a rank-set
    self-join. The corpus-side join broadcasts the tiny query set. At
    100 TB the truncated serving pass reads a quarter of the vector
    bytes — exactly the production motivation."""
    views(spark, sf_dir, "embeddings")
    return spark.sql(_mrl_recall_sql("spark"))


# ---------------------------------------------------------------------------
# emb_ivf_balance_stats — coarse-quantizer cell-balance diagnostics.
# ---------------------------------------------------------------------------

_IVF_CENT_MOD = 50  # must match llm_ops.sim_ann_ivf ("training" rule)


def _ivf_balance_sql(d: str) -> str:
    return f"""
WITH base AS (
  SELECT vec_id, {to_double_arr('embedding', d)} AS emb
  FROM {tbl('embeddings', d)}
),
normed AS (
  SELECT vec_id, emb, sqrt({dot('emb', 'emb', DIM, d)}) AS nrm FROM base
),
cents AS (
  SELECT vec_id AS cid, emb AS cemb, nrm AS cnrm FROM normed
  WHERE vec_id % {_IVF_CENT_MOD} = 0
),
assign AS (
  SELECT vec_id, cid FROM (
    SELECT n.vec_id, c.cid,
           ROW_NUMBER() OVER (
             PARTITION BY n.vec_id
             ORDER BY {dot('n.emb', 'c.cemb', DIM, d)} / (n.nrm * c.cnrm)
                        DESC,
                      c.cid
           ) AS crnk
    FROM normed n CROSS JOIN cents c
  ) a WHERE crnk = 1
),
cells AS (
  SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_vecs FROM assign GROUP BY cid
),
tot AS (
  SELECT CAST(SUM(n_vecs) AS BIGINT) AS n_total,
         CAST(COUNT(*) AS BIGINT) AS n_cells
  FROM cells
)
SELECT c.cid, c.n_vecs,
       round(CAST(c.n_vecs AS DOUBLE) / t.n_total, 6) AS share,
       round(CAST(c.n_vecs AS DOUBLE) * t.n_cells / t.n_total, 6)
         AS balance_ratio
FROM cells c CROSS JOIN tot t
ORDER BY c.cid
"""


@query(
    "emb_ivf_balance_stats",
    oracle=_ivf_balance_sql("duck"),
    tags=("llm", "similarity", "profiling"),
)
def emb_ivf_balance_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cell-population diagnostics for the IVF coarse quantizer used by
    ``sim_ann_ivf``: per-centroid vector count, corpus share, and the
    balance ratio (cell size over the uniform expectation). FAISS calls
    this the imbalance factor — a cell at ratio 10 makes every probe of
    that cell 10× more expensive, so the diagnostic IS the capacity
    plan. The assignment argmin reuses the index's own rule (same
    centroid set, same tie-break) so the stats describe the real index;
    the per-vector window partitions on vec_id, the cell count is
    map-side combinable, and the totals row is a broadcast scalar."""
    views(spark, sf_dir, "embeddings")
    return spark.sql(_ivf_balance_sql("spark"))


# ---------------------------------------------------------------------------
# emb_ivf_incremental_upsert — grow-only IVF index maintenance.
# ---------------------------------------------------------------------------

# "new arrivals" slice: vec_id % 10 == 7 (~10% of the corpus). The frozen
# centroid set (vec_id % _IVF_CENT_MOD == 0) is disjoint from it by
# construction (50 | vec_id ⇒ vec_id % 10 == 0), so the centroids are
# trained entirely on the retained corpus — the upsert never retrains.
_IVF_NEW_MOD = 10
_IVF_NEW_REM = 7


def _ivf_upsert_sql(d: str) -> str:
    return f"""
WITH base AS (
  SELECT vec_id, {to_double_arr('embedding', d)} AS emb
  FROM {tbl('embeddings', d)}
),
normed AS (
  SELECT vec_id, emb, sqrt({dot('emb', 'emb', DIM, d)}) AS nrm,
         (vec_id % {_IVF_NEW_MOD} = {_IVF_NEW_REM}) AS is_new
  FROM base
),
cents AS (
  SELECT vec_id AS cid, emb AS cemb, nrm AS cnrm FROM normed
  WHERE vec_id % {_IVF_CENT_MOD} = 0
),
assign AS (
  SELECT vec_id, is_new, cid FROM (
    SELECT n.vec_id, n.is_new, c.cid,
           ROW_NUMBER() OVER (
             PARTITION BY n.vec_id
             ORDER BY {dot('n.emb', 'c.cemb', DIM, d)} / (n.nrm * c.cnrm)
                        DESC,
                      c.cid
           ) AS crnk
    FROM normed n CROSS JOIN cents c
  ) a WHERE crnk = 1
),
cells AS (
  SELECT cid,
         CAST(SUM(CASE WHEN is_new THEN 0 ELSE 1 END) AS BIGINT) AS n_base,
         CAST(SUM(CASE WHEN is_new THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
         CAST(COUNT(*) AS BIGINT) AS n_total
  FROM assign GROUP BY cid
),
tot AS (
  SELECT CAST(SUM(n_base) AS BIGINT) AS t_base,
         CAST(SUM(n_total) AS BIGINT) AS t_total,
         CAST(COUNT(*) AS BIGINT) AS n_cells
  FROM cells
)
SELECT c.cid, c.n_base, c.n_added, c.n_total,
       round(CAST(c.n_total AS DOUBLE) / t.t_total, 6) AS share_after,
       round(CAST(c.n_base AS DOUBLE) * t.n_cells / t.t_base, 6)
         AS balance_before,
       round(CAST(c.n_total AS DOUBLE) * t.n_cells / t.t_total, 6)
         AS balance_after
FROM cells c CROSS JOIN tot t
ORDER BY c.cid
"""


# recent emb_ivf_incremental_upsert calls' persisted `normed` scans —
# lock-guarded bounded lifecycle (ADVICE r12; the same leak class the
# profile_mutual_information r11 fix closed): without retirement, every
# invocation in a no-clearCache session registered a fresh cached relation
_IVF_NORMED_LIVE = LiveCache(keep=2)


def ivf_assign(df: DataFrame, cents: DataFrame) -> DataFrame:
    """Coarse-quantize ``df`` (columns ``vec_id, emb, nrm``) against the
    broadcast centroid set (``cid, cemb, cnrm``): (vec_id, cid) of each
    vector's nearest centroid, ties to the lowest cid.

    The argmax is an aggregation ``max(struct(cos, -cid))`` — map-side
    combinable, no sort, no shuffle of the (vector × centroid) product —
    the same idiom as ``sim_ann_ivf``/``emb_kmeans_lloyd``; shared here
    so the index build, the incremental upsert, and the rebuild-audit
    test all quantize through ONE code path."""
    cos = F.expr(dot("emb", "cemb", DIM, "spark")) / (
        F.col("nrm") * F.col("cnrm")
    )
    scored = df.join(cents).withColumn("ccos", cos)
    return (
        scored.groupBy("vec_id")
        .agg(
            F.max(
                F.struct(F.col("ccos"), (-F.col("cid")).alias("nc"))
            ).alias("b")
        )
        .select("vec_id", (-F.col("b.nc")).alias("cid"))
    )


@query(
    "emb_ivf_incremental_upsert",
    oracle=_ivf_upsert_sql("duck"),
    tags=("llm", "similarity", "incremental"),
)
def emb_ivf_incremental_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental IVF index maintenance (VERDICT r11 #4): new vectors
    are assigned to the EXISTING frozen centroids and appended to the
    inverted lists — FAISS ``add_with_ids`` semantics, the vector-valued
    analogue of the reference's grow-only keyed store
    (signer/index.js:229-242). A 100 TB corpus never rebuilds its vector
    index from scratch; the delta assignment is the whole per-ingest
    cost, and because per-vector assignment under a FROZEN centroid set
    is independent of every other vector, the incrementally-grown index
    is EXACTLY the index a full rebuild would produce (the equivalence
    ``tests/test_approx.py`` pins against the batch-built
    ``emb_ivf_balance_stats`` cells and a from-scratch rebuild).

    The emitted table is the upsert's operational product: per-cell list
    sizes before/after, the delta, and the FAISS-style imbalance factor
    before/after — the re-cluster tripwire. A cell whose balance_after
    drifts far above 1 makes every probe of that cell proportionally
    more expensive; when the post-upsert imbalance crosses the
    deployment's threshold, THAT (not the upsert itself) schedules the
    offline re-train, exactly like ``KeyedParquetSink.resplit``'s
    bucket-count evolution.

    Plan shape: the retained-index pass scores only retained rows, the
    upsert pass only the ~10% delta slice — disjoint slices, so total
    scoring work equals one corpus pass; both passes broadcast the
    ~sqrt(N) centroid set and aggregate map-side (``ivf_assign``); the
    per-cell merge is a |cells|-sized groupBy and the totals row a
    broadcast scalar.

    Cache lifecycle (ADVICE r12): the persisted ``normed`` scan — shared
    by the centroid slice and both assignment passes — is tracked in
    ``_IVF_NORMED_LIVE``, which retires all but the newest two entries
    under a lock; repeated invocations in a no-clearCache session no
    longer accumulate cached relations (the leak class the
    ``profile_mutual_information`` r11 fix closed)."""
    views(spark, sf_dir, "embeddings")
    normed = _IVF_NORMED_LIVE.track(
        spark.sql(
            f"""
SELECT vec_id, emb, sqrt({dot('emb', 'emb', DIM, 'spark')}) AS nrm
FROM (SELECT vec_id, {to_double_arr('embedding', 'spark')} AS emb
      FROM {tbl('embeddings', 'spark')})
"""
        ).persist(),
        key=sf_dir,
    )
    cents = F.broadcast(
        normed.filter(F.col("vec_id") % _IVF_CENT_MOD == 0).select(
            F.col("vec_id").alias("cid"),
            F.col("emb").alias("cemb"),
            F.col("nrm").alias("cnrm"),
        )
    )
    is_new = F.col("vec_id") % _IVF_NEW_MOD == _IVF_NEW_REM
    retained = ivf_assign(normed.filter(~is_new), cents)  # standing index
    upserted = ivf_assign(normed.filter(is_new), cents)  # the delta pass
    assign = retained.withColumn("is_new", F.lit(False)).unionByName(
        upserted.withColumn("is_new", F.lit(True))
    )
    cells = assign.groupBy("cid").agg(
        F.sum(F.when(F.col("is_new"), 0).otherwise(1))
        .cast("bigint")
        .alias("n_base"),
        F.sum(F.when(F.col("is_new"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_added"),
        F.count("*").cast("bigint").alias("n_total"),
    )
    tot = F.broadcast(
        cells.agg(
            F.sum("n_base").cast("bigint").alias("t_base"),
            F.sum("n_total").cast("bigint").alias("t_total"),
            F.count("*").cast("bigint").alias("n_cells"),
        )
    )
    return (
        cells.crossJoin(tot)
        .select(
            "cid",
            "n_base",
            "n_added",
            "n_total",
            F.round(
                F.col("n_total").cast("double") / F.col("t_total"), 6
            ).alias("share_after"),
            F.round(
                F.col("n_base").cast("double")
                * F.col("n_cells")
                / F.col("t_base"),
                6,
            ).alias("balance_before"),
            F.round(
                F.col("n_total").cast("double")
                * F.col("n_cells")
                / F.col("t_total"),
                6,
            ).alias("balance_after"),
        )
        .orderBy("cid")
    )


# ---------------------------------------------------------------------------
# sketch_reservoir_sample — deterministic hash-rank uniform sample.
# ---------------------------------------------------------------------------

_SAMPLE_K = 50


def _reservoir_sql(d: str) -> str:
    doc_str = (
        "CAST(doc_id AS STRING)" if d == "spark" else "CAST(doc_id AS VARCHAR)"
    )
    return f"""
SELECT doc_id, source, n_chars, md5({doc_str}) AS sample_key
FROM {tbl('documents', d)}
ORDER BY sample_key, doc_id
LIMIT {_SAMPLE_K}
"""


@query(
    "sketch_reservoir_sample",
    oracle=_reservoir_sql("duck"),
    tags=("sketch", "sampling"),
)
def sketch_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fixed-size uniform sample: rank every document by a
    salted content-free hash (md5 of its id) and keep the k smallest —
    the distributed, re-runnable equivalent of reservoir sampling
    (Vitter 1985, public). Because the rank key is a hash, the k
    smallest are a uniform draw, yet the query is pure and replayable
    (same sample every run, no RNG state). Spark executes the ORDER BY +
    LIMIT as TakeOrderedAndProject — a per-partition heap of k rows
    merged on the driver, no global sort, no shuffle of the corpus — so
    sampling 50 documents out of 100 billion moves k rows per partition
    and nothing else."""
    views(spark, sf_dir, "documents")
    return spark.sql(_reservoir_sql("spark"))


# ---------------------------------------------------------------------------
# sketch_theta_union — KMV/theta set operations across corpus slices.
# ---------------------------------------------------------------------------

_THETA_K = 64
_HASH_SPACE = float(2**32)


def _doc_hash(d: str) -> str:
    """doc_id -> uniform 32-bit integer via the first 8 md5 hex digits
    (same fold as sketch_kmv_distinct — no engine-specific hex builtin)."""
    to_str = (
        "CAST(doc_id AS STRING)" if d == "spark" else "CAST(doc_id AS VARCHAR)"
    )
    hx = f"md5({to_str})"
    digits = " + ".join(
        f"CAST({hashing.hexdigit_val(f'substr({hx}, {i + 1}, 1)', d)} AS BIGINT)"
        f" * {16 ** (7 - i)}"
        for i in range(8)
    )
    return f"CAST({digits} AS BIGINT)"


def _theta_union_sql(d: str) -> str:
    h = _doc_hash(d)
    est = (
        f"CASE WHEN n_kept < {_THETA_K} THEN CAST(n_kept AS DOUBLE)"
        f" ELSE CAST({_THETA_K - 1} AS DOUBLE) * {_HASH_SPACE} / kth END"
    )
    return f"""
WITH hashed AS (
  SELECT doc_id, {h} AS h FROM {tbl('documents', d)}
),
slices AS (
  SELECT 'a' AS slice_id, h FROM hashed WHERE doc_id % 3 <> 0
  UNION ALL
  SELECT 'b' AS slice_id, h FROM hashed WHERE doc_id % 2 <> 0
  UNION ALL
  SELECT 'union' AS slice_id, h FROM (
    SELECT DISTINCT h FROM hashed WHERE doc_id % 3 <> 0 OR doc_id % 2 <> 0
  ) u
),
ranked AS (
  SELECT slice_id, h,
         ROW_NUMBER() OVER (PARTITION BY slice_id ORDER BY h) AS rnk
  FROM slices
),
sketch AS (
  SELECT slice_id,
         CAST(MAX(h) AS BIGINT) AS kth,
         CAST(COUNT(*) AS BIGINT) AS n_kept
  FROM ranked WHERE rnk <= {_THETA_K}
  GROUP BY slice_id
),
est AS (
  SELECT slice_id, round({est}, 2) AS kmv_estimate FROM sketch
),
exact AS (
  SELECT 'a' AS slice_id, CAST(COUNT(*) AS BIGINT) AS exact_count
  FROM hashed WHERE doc_id % 3 <> 0
  UNION ALL
  SELECT 'b', CAST(COUNT(*) AS BIGINT)
  FROM hashed WHERE doc_id % 2 <> 0
  UNION ALL
  SELECT 'union', CAST(COUNT(*) AS BIGINT)
  FROM hashed WHERE doc_id % 3 <> 0 OR doc_id % 2 <> 0
),
joined AS (
  SELECT e.slice_id, e.kmv_estimate, x.exact_count
  FROM est e JOIN exact x ON x.slice_id = e.slice_id
)
SELECT slice_id, kmv_estimate, exact_count FROM joined
UNION ALL
SELECT 'intersect' AS slice_id,
       round(a.kmv_estimate + b.kmv_estimate - u.kmv_estimate, 2)
         AS kmv_estimate,
       a.exact_count + b.exact_count - u.exact_count AS exact_count
FROM (SELECT kmv_estimate, exact_count FROM joined WHERE slice_id = 'a') a
CROSS JOIN (SELECT kmv_estimate, exact_count FROM joined WHERE slice_id = 'b') b
CROSS JOIN (SELECT kmv_estimate, exact_count FROM joined
            WHERE slice_id = 'union') u
ORDER BY slice_id
"""


@query(
    "sketch_theta_union",
    oracle=_theta_union_sql("duck"),
    tags=("sketch", "scale"),
)
def sketch_theta_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta/KMV sketch SET OPERATIONS (Dasgupta et al. 2016, the
    DataSketches theta framework, public): estimate |A|, |B|, |A∪B| with
    64-minimum-value sketches over two overlapping corpus slices, then
    derive |A∩B| by inclusion–exclusion — the cardinality algebra behind
    "how many documents do these two crawls share?" without ever
    joining them. Each sketch is a per-slice top-k by hash (per-partition
    heaps — WindowGroupLimit — so k rows shuffle per slice); the union
    sketch merges before ranking, exactly how theta sketches compose
    across a 1000-executor fleet: k values per node, not the corpus.
    Exact counts ride along as the error reference.

    Spark path (r13): the oracle's final inclusion–exclusion UNION ALL
    references ``joined`` four times, and Catalyst inlines CTEs — the
    whole sketch+exact subtree was re-planned 4× (measured: 166 physical
    operators, 18 parquet scans). Here ``joined`` (3 rows) is computed
    ONCE and persisted, the intersect row derives from it via 1-row
    cross joins, and the three exact counts collapse into one
    conditional-aggregation scan unpivoted with ``stack`` (guide §2.4;
    plan: 18→4 scans, 19→7 exchanges)."""
    views(spark, sf_dir, "documents")
    d = "spark"
    h = _doc_hash(d)
    est = (
        f"CASE WHEN n_kept < {_THETA_K} THEN CAST(n_kept AS DOUBLE)"
        f" ELSE CAST({_THETA_K - 1} AS DOUBLE) * {_HASH_SPACE} / kth END"
    )
    joined = spark.sql(
        f"""
WITH hashed AS (
  SELECT doc_id, {h} AS h FROM {tbl('documents', d)}
),
slices AS (
  SELECT 'a' AS slice_id, h FROM hashed WHERE doc_id % 3 <> 0
  UNION ALL
  SELECT 'b' AS slice_id, h FROM hashed WHERE doc_id % 2 <> 0
  UNION ALL
  SELECT 'union' AS slice_id, h FROM (
    SELECT DISTINCT h FROM hashed WHERE doc_id % 3 <> 0 OR doc_id % 2 <> 0
  ) u
),
ranked AS (
  SELECT slice_id, h,
         ROW_NUMBER() OVER (PARTITION BY slice_id ORDER BY h) AS rnk
  FROM slices
),
sketch AS (
  SELECT slice_id,
         CAST(MAX(h) AS BIGINT) AS kth,
         CAST(COUNT(*) AS BIGINT) AS n_kept
  FROM ranked WHERE rnk <= {_THETA_K}
  GROUP BY slice_id
),
est AS (
  SELECT slice_id, round({est}, 2) AS kmv_estimate FROM sketch
),
exact_base AS (
  SELECT CAST(COUNT(CASE WHEN doc_id % 3 <> 0 THEN 1 END) AS BIGINT) AS ca,
         CAST(COUNT(CASE WHEN doc_id % 2 <> 0 THEN 1 END) AS BIGINT) AS cb,
         CAST(COUNT(CASE WHEN doc_id % 3 <> 0 OR doc_id % 2 <> 0 THEN 1 END)
              AS BIGINT) AS cu
  FROM {tbl('documents', d)}
),
exact AS (
  SELECT stack(3, 'a', ca, 'b', cb, 'union', cu) AS (slice_id, exact_count)
  FROM exact_base
)
SELECT e.slice_id, e.kmv_estimate, x.exact_count
FROM est e JOIN exact x ON x.slice_id = e.slice_id
"""
        # localCheckpoint, not persist: CacheManager cannot substitute a
        # cached plan that contains WithCTE (CTE ids renumber on reuse),
        # so a persist here silently re-ran the whole sketch chain per
        # consumer; the eager checkpoint materializes the 3 rows once
    ).localCheckpoint(eager=True)
    a = joined.filter("slice_id = 'a'").selectExpr(
        "kmv_estimate AS ka", "exact_count AS ea"
    )
    b = joined.filter("slice_id = 'b'").selectExpr(
        "kmv_estimate AS kb", "exact_count AS eb"
    )
    u = joined.filter("slice_id = 'union'").selectExpr(
        "kmv_estimate AS ku", "exact_count AS eu"
    )
    inter = a.crossJoin(b).crossJoin(u).selectExpr(
        "'intersect' AS slice_id",
        "round(ka + kb - ku, 2) AS kmv_estimate",
        "ea + eb - eu AS exact_count",
    )
    return joined.unionByName(inter).orderBy("slice_id")


# ---------------------------------------------------------------------------
# profile_outlier_mad — robust per-group outlier detection.
# ---------------------------------------------------------------------------

_MAD_CUT = 3.5  # |x - median| > cut * MAD (Iglewicz-Hoaglin default)


def _outlier_mad_sql(d: str) -> str:
    # integer division semantics: (n+1)/2 must floor in both engines
    n_lo = intdiv("(n + 1)", "2", d)
    n_hi = intdiv("(n + 2)", "2", d)
    return f"""
WITH ev AS (
  SELECT event_id, event_type, CAST(value AS DOUBLE) AS v
  FROM {tbl('events', d)}
),
rk AS (
  SELECT event_type, event_id, v,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY v, event_id)
           AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM ev
),
med AS (
  SELECT event_type, (MIN(v) + MAX(v)) / 2 AS med
  FROM rk WHERE rn IN ({n_lo}, {n_hi})
  GROUP BY event_type
),
dev AS (
  SELECT e.event_type, e.event_id, e.v, m.med,
         CASE WHEN e.v >= m.med THEN e.v - m.med ELSE m.med - e.v END AS ad
  FROM ev e JOIN med m ON m.event_type = e.event_type
),
drk AS (
  SELECT event_type, event_id, v, med, ad,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY ad, event_id)
           AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM dev
),
mad AS (
  SELECT event_type, (MIN(ad) + MAX(ad)) / 2 AS mad
  FROM drk WHERE rn IN ({n_lo}, {n_hi})
  GROUP BY event_type
)
SELECT e.event_type, e.event_id, round(e.v, 6) AS value,
       round(e.med, 6) AS med, round(m.mad, 6) AS mad,
       round((e.v - e.med) / m.mad, 6) AS mad_score
FROM dev e JOIN mad m ON m.event_type = e.event_type
WHERE m.mad > 0 AND e.ad > {_MAD_CUT} * m.mad
ORDER BY e.event_type, e.event_id
"""


@query(
    "profile_outlier_mad",
    oracle=_outlier_mad_sql("duck"),
    tags=("quality", "profiling"),
)
def profile_outlier_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-group outlier detection by median absolute deviation
    (Iglewicz & Hoaglin 1993, public): flag events whose |value − median|
    exceeds 3.5 MADs within their event type. Unlike z-scores, both the
    centre and the spread are medians, so the detector's thresholds
    cannot be dragged by the very outliers it hunts — the standard
    robust gate for ingest-time value validation. Medians come from a
    rank-and-average-the-middle construction (identical IEEE adds in
    both engines — no quantile-interpolation variance across dialects);
    every window partitions on event_type, and the two median tables are
    group-count-sized broadcast joins.

    Spark path (r13): the deviation table ``dev`` (events + per-type
    median + absolute deviation) heads a diamond — the MAD rank chain
    AND the final gate both read it — and CTE inlining re-planned the
    whole ev→rank-window→median→join chain for each consumer (measured:
    6 Window ops / 4 scans in the flat plan). ``dev`` is persisted once
    (CTE-free build, so CacheManager can substitute it) and the
    oracle-shared MAD/gate text runs over the cached view (guide §5;
    plan: 6→2 Window ops, 4→2 scans)."""
    views(spark, sf_dir, "events")
    d = "spark"
    n_lo = intdiv("(n + 1)", "2", d)
    n_hi = intdiv("(n + 2)", "2", d)
    ev = (
        f"SELECT event_id, event_type, CAST(value AS DOUBLE) AS v "
        f"FROM {tbl('events', d)}"
    )
    dev = spark.sql(
        f"""
SELECT e.event_type, e.event_id, e.v, m.med,
       CASE WHEN e.v >= m.med THEN e.v - m.med ELSE m.med - e.v END AS ad
FROM ({ev}) e
JOIN (SELECT event_type, (MIN(v) + MAX(v)) / 2 AS med
      FROM (SELECT event_type, event_id, v,
                   ROW_NUMBER() OVER (
                     PARTITION BY event_type ORDER BY v, event_id) AS rn,
                   COUNT(*) OVER (PARTITION BY event_type) AS n
            FROM ({ev}) ev) rk
      WHERE rn IN ({n_lo}, {n_hi})
      GROUP BY event_type) m
  ON m.event_type = e.event_type
"""
    ).persist()
    dev.createOrReplaceTempView("slsp_mad_dev")
    return spark.sql(
        f"""
WITH drk AS (
  SELECT event_type, event_id, v, med, ad,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY ad, event_id)
           AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM slsp_mad_dev
),
mad AS (
  SELECT event_type, (MIN(ad) + MAX(ad)) / 2 AS mad
  FROM drk WHERE rn IN ({n_lo}, {n_hi})
  GROUP BY event_type
)
SELECT e.event_type, e.event_id, round(e.v, 6) AS value,
       round(e.med, 6) AS med, round(m.mad, 6) AS mad,
       round((e.v - e.med) / m.mad, 6) AS mad_score
FROM slsp_mad_dev e JOIN mad m ON m.event_type = e.event_type
WHERE m.mad > 0 AND e.ad > {_MAD_CUT} * m.mad
ORDER BY e.event_type, e.event_id
"""
    )


# ---------------------------------------------------------------------------
# scale_range_boundaries — balanced range-partition cut points.
# ---------------------------------------------------------------------------

_RANGE_SPLITS = 8
_PRICE_BUCKET = 20000  # value-range bucket width for two-phase numbering


def _range_boundaries_sql(d: str) -> str:
    idx_rows = ", ".join(f"({i})" for i in range(1, _RANGE_SPLITS))
    target = intdiv("(s.split_idx * t.n_total)", str(_RANGE_SPLITS), d)
    return f"""
WITH src AS (
  SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS price
  FROM {tbl('orders', d)}
),
bucketed AS (
  SELECT o_orderkey, price,
         CAST(floor(price / {_PRICE_BUCKET}) AS BIGINT) AS bkt
  FROM src
),
local_rn AS (
  SELECT o_orderkey, price, bkt,
         ROW_NUMBER() OVER (PARTITION BY bkt ORDER BY price, o_orderkey)
           AS lrn
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
  SELECT l.o_orderkey, l.price, CAST(o.off + l.lrn AS BIGINT) AS rn
  FROM local_rn l JOIN offsets o ON l.bkt = o.bkt
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM src),
splits AS (SELECT split_idx FROM (VALUES {idx_rows}) AS v(split_idx)),
cuts AS (
  SELECT s.split_idx, CAST({target} AS BIGINT) AS target_rank
  FROM splits s CROSS JOIN tot t
)
SELECT CAST(c.split_idx AS BIGINT) AS split_idx,
       c.target_rank,
       round(n.price, 6) AS boundary_value
FROM cuts c JOIN numbered n ON n.rn = c.target_rank
ORDER BY split_idx
"""


@query(
    "scale_range_boundaries",
    oracle=_range_boundaries_sql("duck"),
    tags=("scale",),
)
def scale_range_boundaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced range-partition planning: the 7 cut points that split
    ``orders`` into 8 equal-row ranges of ``o_totalprice`` — what
    ``repartitionByRange``'s sampler estimates before any 100 TB global
    sort, made exact and driver-checkable. Global ranks come from the
    two-phase bucket-numbering idiom (value-range buckets → partitioned
    local row numbers → prefix-sum offsets), so the plan contains no
    single-partition window; the boundary probe is then a join of 7 rows
    against the numbered table. At scale the same plan runs over a
    sampled fraction — the shape (bucket, number, probe) is unchanged,
    and the exactness here is what lets the driver hash-verify it."""
    views(spark, sf_dir, "orders")
    return spark.sql(_range_boundaries_sql("spark"))
