"""Round-4 wave-2 operators: entity-resolution blocking, Markov
transition mining, exact-sum correlation/entropy/quantile profiling,
hybrid lexical+vector retrieval fusion, and series autocorrelation.

Each is a named two-dialect query with a DuckDB oracle (the driver's
hash-compare gate). Family rules, same as the rest of the registry:
double aggregates go through order-independent DECIMAL addends, every
window carries a partition spec or is provably candidate-bounded, every
LIMIT follows a total ORDER BY, and divisions happen once at the end in
a fixed order so both engines emit bit-identical doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .dataset_ops import _BM25_TERMS, _tok_cte
from .dialect import dec_sum, dot, intdiv, tbl, to_double_arr, views
from .llm_ops import DIM
from .registry import query

# ---------------------------------------------------------------------------
# er_blocking_fuzzy_join — entity resolution: block, then verify.
# ---------------------------------------------------------------------------

_ER_MAX_DIST = 4


def _er_blocking_sql(d: str) -> str:
    return f"""
WITH cand AS (
  SELECT a.p_brand AS brand,
         a.p_type AS type_bucket,
         levenshtein(a.p_name, b.p_name) AS dist
  FROM {tbl('part', d)} a
  JOIN {tbl('part', d)} b
    ON a.p_brand = b.p_brand
   AND a.p_type = b.p_type
   AND a.p_partkey < b.p_partkey
)
SELECT brand, type_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_candidates,
       CAST(SUM(CASE WHEN dist <= {_ER_MAX_DIST} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_matches,
       CAST(MIN(dist) AS BIGINT) AS min_dist,
       CAST(MAX(dist) AS BIGINT) AS max_dist
FROM cand
GROUP BY brand, type_bucket
ORDER BY brand, type_bucket
"""


@query("er_blocking_fuzzy_join", oracle=_er_blocking_sql("duck"), tags=("er", "dedup"))
def er_blocking_fuzzy_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution blocking: generate candidate pairs only within a
    blocking key (brand x type) via an equi-join, then verify each
    candidate with an edit-distance predicate — the standard
    block-then-verify shape that turns an O(n^2) fuzzy self-join into a
    sum of per-block quadratics. The equi-join is one hash shuffle on
    the blocking key; candidate count is bounded by the largest block
    (~n/|blocks| rows), never by n^2, and levenshtein runs inside
    whole-stage codegen on the JVM. At 100 TB the knob is the blocking
    key's selectivity (add p_size or a name-prefix to split hot
    blocks); the per-block match stats returned here are exactly the
    monitoring signal for that tuning loop.

    ASCII contract: Spark's levenshtein counts code points but DuckDB's
    counts BYTES, so the two-dialect template is only bit-equal on
    ASCII names (pinned in test_function_parity.py); a unicode corpus
    would fold to ASCII in the blocking projection first."""
    views(spark, sf_dir, "part")
    return spark.sql(_er_blocking_sql("spark"))


# ---------------------------------------------------------------------------
# seq_markov_transitions — first-order behavioral transition matrix.
# ---------------------------------------------------------------------------


def _markov_sql(d: str) -> str:
    return f"""
WITH seq AS (
  SELECT user_id, event_type AS from_state,
         LEAD(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS to_state
  FROM {tbl('events', d)}
),
cnt AS (
  SELECT from_state, to_state, CAST(COUNT(*) AS BIGINT) AS n
  FROM seq WHERE to_state IS NOT NULL
  GROUP BY from_state, to_state
),
tot AS (
  SELECT from_state, CAST(SUM(n) AS BIGINT) AS t FROM cnt GROUP BY from_state
)
SELECT cnt.from_state, cnt.to_state, cnt.n,
       round(CAST(cnt.n AS DOUBLE) / CAST(tot.t AS DOUBLE), 6) AS prob
FROM cnt JOIN tot ON tot.from_state = cnt.from_state
ORDER BY cnt.from_state, cnt.to_state
"""


@query("seq_markov_transitions", oracle=_markov_sql("duck"), tags=("sequence", "analytics"))
def seq_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams:
    P(next event type | current event type), the standard behavioral
    model behind next-action prediction and anomaly scoring. The LEAD
    window partitions on user_id (one shuffle, no global order); the
    transition count collapses to |states|^2 rows via a map-side
    combinable GROUP BY, so the 100 TB cost is one user-keyed shuffle of
    the events table and the result is always tiny. The row-count
    denominator join is a broadcast of the |states|-row totals."""
    views(spark, sf_dir, "events")
    return spark.sql(_markov_sql("spark"))


# ---------------------------------------------------------------------------
# profile_correlation_matrix — single-pass exact-sum Pearson correlations.
# ---------------------------------------------------------------------------

_CORR_PAIRS = (
    ("l_quantity", "l_extendedprice", "corr_qty_price"),
    ("l_quantity", "l_discount", "corr_qty_disc"),
    ("l_extendedprice", "l_tax", "corr_price_tax"),
    ("l_discount", "l_tax", "corr_disc_tax"),
)


def _corr_sql(d: str) -> str:
    cols = sorted({c for x, y, _ in _CORR_PAIRS for c in (x, y)})
    sums = ", ".join(
        [f"CAST(COUNT(*) AS DOUBLE) AS n"]
        + [f"{dec_sum(c)} AS s_{c}" for c in cols]
        + [f"{dec_sum(f'CAST({c} AS DOUBLE) * CAST({c} AS DOUBLE)')} AS ss_{c}" for c in cols]
        + [
            f"{dec_sum(f'CAST({x} AS DOUBLE) * CAST({y} AS DOUBLE)')} AS sp_{alias}"
            for x, y, alias in _CORR_PAIRS
        ]
    )
    corrs = ", ".join(
        f"round((n * sp_{alias} - s_{x} * s_{y})"
        f" / (sqrt(n * ss_{x} - s_{x} * s_{x})"
        f"    * sqrt(n * ss_{y} - s_{y} * s_{y})), 6) AS {alias}"
        for x, y, alias in _CORR_PAIRS
    )
    return f"""
WITH sums AS (
  SELECT {sums}
  FROM {tbl('lineitem', d)}
)
SELECT CAST(n AS BIGINT) AS n_rows, {corrs}
FROM sums
"""


@query("profile_correlation_matrix", oracle=_corr_sql("duck"), tags=("quality", "profiling"))
def profile_correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation matrix over the numeric lineitem measures in
    ONE scan: every sum / sum-of-squares / cross-product the four
    correlations need is a column of a single map-side-combinable
    aggregation, and the corr formula r = (n*Sxy - Sx*Sy) /
    sqrt((n*Sxx - Sx^2)(n*Syy - Sy^2)) is evaluated on the one result
    row. The addends go through DECIMAL(28,6) so every partial-sum
    order gives the same bits (the reason this hash-matches DuckDB
    rather than engine-native corr(), whose float co-moment folds are
    order-dependent). 100 TB cost: exactly one scan, shuffle of ~30
    partial rows."""
    views(spark, sf_dir, "lineitem")
    return spark.sql(_corr_sql("spark"))


# ---------------------------------------------------------------------------
# profile_entropy — Shannon entropy of categorical columns.
# ---------------------------------------------------------------------------


def _entropy_sql(d: str) -> str:
    return f"""
WITH src AS (
  SELECT 'events.event_type' AS col_name, event_type AS val
  FROM {tbl('events', d)}
  UNION ALL
  SELECT 'documents.lang' AS col_name, lang AS val FROM {tbl('documents', d)}
  UNION ALL
  SELECT 'orders.o_orderstatus' AS col_name, o_orderstatus AS val
  FROM {tbl('orders', d)}
),
cnt AS (
  SELECT col_name, val, CAST(COUNT(*) AS BIGINT) AS n
  FROM src GROUP BY col_name, val
),
tot AS (
  SELECT col_name, CAST(SUM(n) AS BIGINT) AS t,
         CAST(COUNT(*) AS BIGINT) AS n_categories
  FROM cnt GROUP BY col_name
)
SELECT cnt.col_name, MIN(tot.n_categories) AS n_categories,
       CAST(SUM(CAST(round(
         -(CAST(cnt.n AS DOUBLE) / CAST(tot.t AS DOUBLE))
          * ln(CAST(cnt.n AS DOUBLE) / CAST(tot.t AS DOUBLE)), 12)
         AS DECIMAL(28,12))) AS DOUBLE) AS entropy_nats
FROM cnt JOIN tot ON tot.col_name = cnt.col_name
GROUP BY cnt.col_name
ORDER BY cnt.col_name
"""


@query("profile_entropy", oracle=_entropy_sql("duck"), tags=("quality", "profiling"))
def profile_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy (nats) of categorical distributions — the
    profiling signal for class balance, label drift, and dedup-key
    selectivity. Per column: category counts via a map-side combinable
    GROUP BY, totals via a second tiny aggregation, then
    -sum(p * ln p) with each term rounded to 12 decimals and summed
    through DECIMAL so the handful of per-category terms add
    order-independently (ln() itself is bit-stable across both engines
    for these ratios; the rounding guards the sum order, not the log).
    100 TB cost: one scan per profiled column, reduce size = category
    cardinality."""
    views(spark, sf_dir, "events", "documents", "orders")
    return spark.sql(_entropy_sql("spark"))


# ---------------------------------------------------------------------------
# rag_hybrid_rrf — lexical BM25 + vector cosine, fused with RRF.
# ---------------------------------------------------------------------------

_HY_K = 60  # standard RRF dampening constant
_HY_CAND = 50  # per-modality candidate depth
_HY_TOPN = 20
_HY_QVEC = 0  # query embedding = corpus vector 0 (deterministic)


def _hybrid_bm25_cte(d: str) -> str:
    """Candidate list of the lexical side — same scoring form as
    rag_bm25_topk (integerized idf*tf-norm rational, one double
    division), shortened to the candidate depth.

    Spark branch (r13): the one-pass perdoc/g base from
    ``rag_bm25_topk`` — one tokenize scan + one 1-row broadcast stats
    aggregate instead of the oracle's re-planned tok/dl/tf/df/scored
    chain (guide §2.4); identical integers → bit-identical lex_score."""
    if d == "spark":
        from .dataset_ops import _bm25_perdoc_ctes, _bm25_score_i

        n = len(_BM25_TERMS)
        s_i = ", ".join(
            f"CASE WHEN tf{i} > 0 THEN {_bm25_score_i(i)} END AS s{i}"
            for i in range(n)
        )
        total = " + ".join(
            f"COALESCE(s{i}, CAST(0 AS DOUBLE))" for i in range(n)
        )
        any_tf = " OR ".join(f"tf{i} > 0" for i in range(n))
        return f"""
  WITH {_bm25_perdoc_ctes()},
  pivoted AS (
    SELECT doc_id, {s_i}
    FROM perdoc CROSS JOIN g
    WHERE {any_tf}
  )
  SELECT doc_id, {total} AS lex_score
  FROM pivoted
  ORDER BY {total} DESC, doc_id
  LIMIT {_HY_CAND}
"""
    terms = ", ".join(f"'{t}'" for t in _BM25_TERMS)
    score = (
        "(CAST((2 * n_docs - 2 * df + 1) * 22 * tf * sum_dl AS DOUBLE)"
        " / CAST((2 * df + 1)"
        "        * (10 * tf * sum_dl + 3 * sum_dl + 9 * dl * n_docs)"
        "        AS DOUBLE))"
    )
    per_term = ", ".join(
        f"MAX(CASE WHEN term = '{t}' THEN score END) AS s{i}"
        for i, t in enumerate(_BM25_TERMS)
    )
    total = " + ".join(
        f"COALESCE(s{i}, CAST(0 AS DOUBLE))" for i in range(len(_BM25_TERMS))
    )
    return f"""
  WITH {_tok_cte(d)},
  dl AS (
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM tok GROUP BY doc_id
  ),
  stats AS (
    SELECT CAST(SUM(dl) AS BIGINT) AS sum_dl, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM dl
  ),
  tf AS (
    SELECT doc_id, word AS term, CAST(COUNT(*) AS BIGINT) AS tf
    FROM tok WHERE word IN ({terms}) GROUP BY doc_id, word
  ),
  df AS (
    SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term
  ),
  scored AS (
    SELECT tf.doc_id, tf.term, {score} AS score
    FROM tf
    JOIN dl ON dl.doc_id = tf.doc_id
    JOIN df ON df.term = tf.term
    CROSS JOIN stats
  ),
  pivoted AS (
    SELECT doc_id, {per_term} FROM scored GROUP BY doc_id
  )
  SELECT doc_id, {total} AS lex_score
  FROM pivoted
  ORDER BY {total} DESC, doc_id
  LIMIT {_HY_CAND}
"""


def _hybrid_vec_cte(d: str) -> str:
    return f"""
  WITH emb AS (
    SELECT vec_id, {to_double_arr('embedding', d)} AS emb
    FROM {tbl('embeddings', d)}
  ),
  q AS (
    SELECT emb AS qemb, sqrt({dot('emb', 'emb', DIM, d)}) AS qnrm
    FROM emb WHERE vec_id = {_HY_QVEC}
  ),
  scored AS (
    SELECT emb.vec_id AS doc_id,
           {dot('qemb', 'emb', DIM, d)}
             / (qnrm * sqrt({dot('emb', 'emb', DIM, d)})) AS vec_score
    FROM emb CROSS JOIN q
    WHERE emb.vec_id <> {_HY_QVEC}
  )
  SELECT doc_id, vec_score
  FROM scored
  ORDER BY vec_score DESC, doc_id
  LIMIT {_HY_CAND}
"""


def _hybrid_rrf_sql(d: str) -> str:
    k = _HY_K
    return f"""
WITH lex_rank AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (ORDER BY lex_score DESC, doc_id) AS r_lex
  FROM ({_hybrid_bm25_cte(d)}) lex_top
),
vec_rank AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (ORDER BY vec_score DESC, doc_id) AS r_vec
  FROM ({_hybrid_vec_cte(d)}) vec_top
),
fused AS (
  SELECT COALESCE(lex_rank.doc_id, vec_rank.doc_id) AS doc_id,
         lex_rank.r_lex AS r_lex, vec_rank.r_vec AS r_vec,
         (COALESCE(CAST(1 AS DOUBLE) / ({k} + lex_rank.r_lex), CAST(0 AS DOUBLE))
          + COALESCE(CAST(1 AS DOUBLE) / ({k} + vec_rank.r_vec), CAST(0 AS DOUBLE))
         ) AS rrf
  FROM lex_rank FULL OUTER JOIN vec_rank ON vec_rank.doc_id = lex_rank.doc_id
)
SELECT doc_id, r_lex, r_vec, round(rrf, 6) AS rrf_score
FROM fused
ORDER BY rrf DESC, doc_id
LIMIT {_HY_TOPN}
"""


@query("rag_hybrid_rrf", oracle=_hybrid_rrf_sql("duck"), tags=("llm", "rag", "similarity"))
def rag_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 lexical candidates and embedding-cosine
    vector candidates for the same query, fused by Reciprocal Rank
    Fusion (1/(60+rank), the industry-standard hybrid-search scorer).
    Each side is independently candidate-bounded: the lexical side is
    the rag_bm25_topk plan (doc-keyed shuffles only, broadcast stats),
    the vector side is the sim_cosine_topk plan (one corpus pass,
    query row broadcast, fixed-order dot products), and both end in a
    TakeOrdered top-{_HY_CAND}. The two rank windows and the full
    outer join then touch at most 2x{_HY_CAND} rows — constant-size
    regardless of corpus scale, so the fusion stage is free at 100 TB.
    Both 1/(k+r) terms are single IEEE divisions in a fixed sum order,
    keeping the fused ranking bit-identical across engines."""
    views(spark, sf_dir, "documents", "embeddings")
    return spark.sql(_hybrid_rrf_sql("spark"))


# ---------------------------------------------------------------------------
# profile_quantile_bins — equi-depth histogram from exact disc quantiles.
# ---------------------------------------------------------------------------


def _quantile_bins_sql(d: str) -> str:
    return f"""
WITH b AS (
  SELECT percentile_disc(0.25) WITHIN GROUP (ORDER BY o_totalprice) AS q1,
         percentile_disc(0.50) WITHIN GROUP (ORDER BY o_totalprice) AS q2,
         percentile_disc(0.75) WITHIN GROUP (ORDER BY o_totalprice) AS q3
  FROM {tbl('orders', d)}
),
binned AS (
  SELECT CASE WHEN o_totalprice <= q1 THEN 1
              WHEN o_totalprice <= q2 THEN 2
              WHEN o_totalprice <= q3 THEN 3
              ELSE 4 END AS bin_id,
         o_totalprice
  FROM {tbl('orders', d)} CROSS JOIN b
)
SELECT bin_id,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       round(MIN(o_totalprice), 2) AS lo,
       round(MAX(o_totalprice), 2) AS hi
FROM binned
GROUP BY bin_id
ORDER BY bin_id
"""


@query("profile_quantile_bins", oracle=_quantile_bins_sql("duck"), tags=("quality", "profiling"))
def profile_quantile_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth histogram: discrete quartile boundaries
    (percentile_disc — an actual data value, no interpolation, hence
    bit-exact across engines) broadcast as a one-row dimension, then a
    single binning scan. Two passes total; the quantile pass is the
    scale bottleneck (exact disc quantiles sort), so at 100 TB the
    documented swap is approx_percentile for the boundary pass while
    the binning scan stays identical — the operator's shape (tiny
    boundary row broadcast into a CASE) is unchanged."""
    views(spark, sf_dir, "orders")
    return spark.sql(_quantile_bins_sql("spark"))


# ---------------------------------------------------------------------------
# ts_autocorr — lag-1 autocorrelation of per-minute series.
# ---------------------------------------------------------------------------


def _autocorr_sql(d: str) -> str:
    ep = "CAST(unix_timestamp(ts) AS BIGINT)" if d == "spark" else "CAST(floor(epoch(ts)) AS BIGINT)"
    return f"""
WITH mins AS (
  SELECT event_type, {intdiv(ep, '60', d)} AS minute,
         {dec_sum('value', 2)} AS v
  FROM {tbl('events', d)}
  GROUP BY event_type, {intdiv(ep, '60', d)}
),
pairs AS (
  SELECT event_type, v,
         LAG(v) OVER (PARTITION BY event_type ORDER BY minute) AS vprev
  FROM mins
),
s AS (
  SELECT event_type,
         CAST(COUNT(*) AS DOUBLE) AS n,
         {dec_sum('v')} AS sx, {dec_sum('vprev')} AS sy,
         {dec_sum('v * v')} AS sxx, {dec_sum('vprev * vprev')} AS syy,
         {dec_sum('v * vprev')} AS sxy
  FROM pairs WHERE vprev IS NOT NULL
  GROUP BY event_type
)
SELECT event_type, CAST(n AS BIGINT) AS n_lags,
       round((n * sxy - sx * sy)
             / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)),
             6) AS autocorr_lag1
FROM s
ORDER BY event_type
"""


@query("ts_autocorr", oracle=_autocorr_sql("duck"), tags=("timeseries", "profiling"))
def ts_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of each event type's per-minute value
    series — the quick test for whether a metric is momentum-driven or
    white noise (input to forecasting-model choice next to ts_holt_linear
    and ts_seasonality_profile). Downsample-to-minutes is a map-side
    combinable DECIMAL-sum aggregation; the LAG window partitions on
    event_type over the already-tiny minute series; the correlation
    itself reuses the exact-sum Pearson form of
    profile_correlation_matrix, one division per series at the end.
    100 TB cost: one shuffle of minute-level partials, state bounded by
    series length, never raw row count."""
    views(spark, sf_dir, "events")
    return spark.sql(_autocorr_sql("spark"))
