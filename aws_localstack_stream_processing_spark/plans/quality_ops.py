"""Corpus-quality and profiling operators (round-2 breadth).

- ``text_gopher_rules``    — Gopher-style document quality gates (word
  count, mean word length, alpha-word fraction, stopword presence,
  symbol ratio) as one codegen projection — the standard pretraining
  corpus filter (Rae et al. 2021, public);
- ``profile_table_stats``  — single-pass column profiler (count / nulls /
  exact distinct / min / max per column) in a vertical layout;
- ``sql_ntile_cume``       — distribution window functions (ntile,
  cume_dist, percent_rank) over a deterministic total order;
- ``ts_ewma``              — exponentially weighted moving average
  (alpha = 1/2) via integer-weighted lags — exact decimal algebra, no
  libm, bit-identical across engines;
- ``ts_zscore_anomaly``    — rolling z-score anomaly gate with the
  comparison done in exact decimal form ``(n·x − Σx)² > 9·(n·Σx² −
  (Σx)²)`` so the boolean never depends on float rounding;
- ``dedup_edit_distance``  — banded Levenshtein near-duplicate pairs
  (candidate generation by (lang, length-band) bucket, edit-distance
  verify) — the character-level sibling of ``dedup_ngram_jaccard``.

Scale notes: the gopher gates and profiler are single scans (the
profiler's exact multi-distinct uses Spark's Expand — the documented
100 TB path swaps ``count(distinct)`` for ``approx_count_distinct`` per
column, same shape); EWMA and z-score are one shuffle on the series key
with frame-local state only; the edit-distance join is bucketed
candidate generation + verify, never all-pairs (reference for the
pattern: SURVEY.md §2 north-star dedup family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .dialect import tbl, ts_str, views
from .registry import query

# ---------------------------------------------------------------------------
# Gopher-style quality gates.
# ---------------------------------------------------------------------------

_STOPWORDS = "('the','a','and','of','to','in','is','for')"


def _gopher_sql(d: str) -> str:
    if d == "spark":
        words = "split(text, ' ')"
        nw = "size(words)"
        alpha = "size(filter(words, w -> w rlike '[a-z]'))"
        stop = f"size(filter(words, w -> w IN {_STOPWORDS}))"
        sym = "regexp_count(text, '[#…]')"
    else:
        words = "string_split(text, ' ')"
        nw = "len(words)"
        alpha = "len(list_filter(words, w -> regexp_matches(w, '[a-z]')))"
        stop = f"len(list_filter(words, w -> w IN {_STOPWORDS}))"
        sym = "len(regexp_extract_all(text, '[#…]'))"
    return f"""
WITH tok AS (
  SELECT doc_id, lang, text, {words} AS words FROM {tbl('documents', d)}
), stats AS (
  SELECT doc_id, lang,
         CAST({nw} AS BIGINT) AS n_words,
         CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_alpha_chars,
         CAST({alpha} AS BIGINT) AS alpha_words,
         CAST({stop} AS BIGINT) AS stop_words,
         CAST({sym} AS BIGINT) AS sym_chars
  FROM tok
)
SELECT doc_id, lang, n_words,
       round(CAST(n_alpha_chars AS DOUBLE) / n_words, 6) AS mean_word_len,
       alpha_words, stop_words, sym_chars,
       (n_words BETWEEN 10 AND 100000)      AS gate_word_count,
       (n_alpha_chars BETWEEN 2 * n_words AND 12 * n_words) AS gate_mean_word_len,
       (5 * alpha_words >= 4 * n_words)     AS gate_alpha_frac,
       (stop_words >= 1)                    AS gate_stopwords,
       (10 * sym_chars <= n_words)          AS gate_symbol_ratio,
       ((n_words BETWEEN 10 AND 100000)
        AND n_alpha_chars BETWEEN 2 * n_words AND 12 * n_words
        AND 5 * alpha_words >= 4 * n_words
        AND stop_words >= 1
        AND 10 * sym_chars <= n_words)      AS keep
FROM stats
"""


@query("text_gopher_rules", oracle=_gopher_sql("duck"), tags=("llm", "text", "quality"))
def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style pretraining quality gates: word-count bounds, mean
    word length, alpha-word fraction >= 0.8, stopword presence, symbol
    ratio <= 0.1 — each gate an integer comparison (``5*alpha >= 4*n``
    instead of a float threshold) so the booleans are exact in any
    engine. One codegen projection, zero shuffles: filtering 100 TB is
    exactly as parallel as scanning it."""
    views(spark, sf_dir, "documents")
    return spark.sql(_gopher_sql("spark"))


# ---------------------------------------------------------------------------
# Single-pass column profiler.
# ---------------------------------------------------------------------------


def _profile_sql(d: str) -> str:
    epoch = (
        "unix_timestamp(o_orderdate)" if d == "spark"
        else "CAST(floor(epoch(o_orderdate)) AS BIGINT)"
    )
    cols = {
        "o_orderkey": "CAST(o_orderkey AS DOUBLE)",
        "o_custkey": "CAST(o_custkey AS DOUBLE)",
        "o_totalprice": "o_totalprice",
        "o_orderdate_epoch": f"CAST({epoch} AS DOUBLE)",
    }
    aggs, recs = ["COUNT(*) AS n_rows"], []
    for i, (name, expr) in enumerate(cols.items()):
        aggs.append(f"COUNT({expr}) AS nn{i}")
        aggs.append(f"COUNT(DISTINCT {expr}) AS nd{i}")
        aggs.append(f"MIN({expr}) AS mn{i}")
        aggs.append(f"MAX({expr}) AS mx{i}")
        if d == "spark":
            recs.append(
                f"named_struct('col', '{name}', 'non_null', nn{i}, "
                f"'n_distinct', nd{i}, 'min_val', mn{i}, 'max_val', mx{i})"
            )
        else:
            recs.append(
                f"{{'col': '{name}', 'non_null': nn{i}, "
                f"'n_distinct': nd{i}, 'min_val': mn{i}, 'max_val': mx{i}}}"
            )
    agg = f"WITH agg AS (SELECT {', '.join(aggs)} FROM {tbl('orders', d)})"
    arr = ",\n  ".join(recs)
    if d == "spark":
        # lateral inline over the 1-row aggregate: the reshape scans one
        # row, the table is scanned exactly once.
        return f"""{agg}
SELECT t.col, agg.n_rows, t.non_null, t.n_distinct, t.min_val, t.max_val
FROM agg LATERAL VIEW inline(array(
  {arr}
)) t
"""
    return f"""{agg},
u AS (SELECT n_rows, unnest([
  {arr}
]) AS rec FROM agg)
SELECT rec.col AS col, n_rows, rec.non_null AS non_null,
       rec.n_distinct AS n_distinct, rec.min_val AS min_val,
       rec.max_val AS max_val
FROM u
"""


@query("profile_table_stats", oracle=_profile_sql("duck"), tags=("analytics", "profiling"))
def profile_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiler: one aggregation pass emits per-column row count,
    non-null count, exact distinct count, min and max; a lateral
    ``inline`` over the single 1-row aggregate reshapes it vertically,
    so the table is scanned exactly once (a CTE-per-column union would
    be inlined into one scan per column). Exact multi-distinct costs one Expand
    (4× row multiplication before the partial agg) — the documented
    100 TB path replaces ``COUNT(DISTINCT)`` with
    ``approx_count_distinct`` per column, collapsing to a plain
    single-pass partial+final agg."""
    views(spark, sf_dir, "orders")
    return spark.sql(_profile_sql("spark"))


# ---------------------------------------------------------------------------
# Distribution window functions.
# ---------------------------------------------------------------------------


def _ntile_sql(d: str) -> str:
    return f"""
SELECT o_orderkey, o_orderpriority,
       ntile(4)       OVER w AS quartile,
       cume_dist()    OVER w AS cum_frac,
       percent_rank() OVER w AS pct_rank
FROM {tbl('orders', d)}
WHERE o_totalprice > 100000
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
"""


@query("sql_ntile_cume", oracle=_ntile_sql("duck"), tags=("sql", "window"))
def sql_ntile_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions (ntile / cume_dist / percent_rank)
    over a total order made deterministic by the unique-key tiebreak.
    cume_dist and percent_rank are single IEEE divisions of exact
    integers, so they are bit-identical across engines. One hash
    exchange on the partition key, sort within partitions — the same
    shape at any scale."""
    views(spark, sf_dir, "orders")
    return spark.sql(_ntile_sql("spark"))


# ---------------------------------------------------------------------------
# EWMA, alpha = 1/2, depth 8 — integer weights 2^(7-k), exact decimal.
# ---------------------------------------------------------------------------


def _ewma_sql(d: str) -> str:
    num_terms, den_terms = [], []
    for k in range(8):
        w = 1 << (7 - k)
        v = f"lag(CAST(value AS DECIMAL(10,2)), {k}) OVER w"
        num_terms.append(f"COALESCE({v} * {w}, 0)")
        den_terms.append(f"CASE WHEN {v} IS NOT NULL THEN {w} ELSE 0 END")
    num = " + ".join(num_terms)
    den = " + ".join(den_terms)
    return f"""
SELECT event_id, user_id, {ts_str('ts', d)} AS ts_s, value,
       CAST(CAST({num} AS DOUBLE) / CAST({den} AS DOUBLE) AS DOUBLE) AS ewma
FROM {tbl('events', d)}
WHERE event_type = 'view'
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


@query("ts_ewma", oracle=_ewma_sql("duck"), tags=("timeseries", "window", "smoothing"))
def ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average (alpha = 1/2, depth 8) per
    user series. Weights are the integers 2^(7-k) applied to exact
    DECIMAL(10,2) lags, so the weighted sum is exact and the single
    final IEEE division is bit-identical across engines — no libm ``pow``
    in the plan. One hash exchange on user_id; frame state is 8 rows
    regardless of scale."""
    views(spark, sf_dir, "events")
    return spark.sql(_ewma_sql("spark"))


# ---------------------------------------------------------------------------
# Rolling z-score anomaly gate in exact decimal algebra.
# ---------------------------------------------------------------------------


def _zscore_sql(d: str) -> str:
    return f"""
WITH base AS (
  SELECT event_id, user_id, ts, value,
         CAST(value AS DECIMAL(10,2)) AS v2
  FROM {tbl('events', d)}
  WHERE event_type = 'purchase'
), win AS (
  SELECT event_id, user_id, ts, value, v2,
         COUNT(v2) OVER fr AS n,
         CAST(SUM(v2) OVER fr AS DECIMAL(14,2)) AS sx,
         CAST(SUM(CAST(v2 * v2 AS DECIMAL(20,4))) OVER fr AS DECIMAL(20,4)) AS sxx
  FROM base
  WINDOW fr AS (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN 15 PRECEDING AND CURRENT ROW)
), alg AS (
  SELECT event_id, user_id, ts, value, n,
         CAST(CAST(n AS DECIMAL(6,0)) * v2 - sx AS DECIMAL(14,2)) AS dd,
         CAST(CAST(n AS DECIMAL(6,0)) * sxx AS DECIMAL(27,4)) AS nsxx,
         CAST(sx * sx AS DECIMAL(29,4)) AS sx2
  FROM win
)
SELECT event_id, user_id, {ts_str('ts', d)} AS ts_s, value,
       CAST(n AS BIGINT) AS n_window,
       CAST(dd * dd AS DOUBLE) AS dev_sq_scaled,
       CAST(nsxx - sx2 AS DOUBLE) AS var_scaled
FROM alg
WHERE n >= 8 AND CAST(dd * dd AS DECIMAL(29,4)) > 9 * (nsxx - sx2)
"""


@query(
    "ts_zscore_anomaly", oracle=_zscore_sql("duck"), tags=("timeseries", "anomaly")
)
def ts_zscore_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score outlier gate (|z| > 3 over a 16-row trailing
    frame per user). The gate is evaluated in exact decimal algebra —
    ``(n·x − Σx)² > 9·(n·Σx² − (Σx)²)`` — equivalent to the float
    z-score comparison but with zero rounding, so the kept set is
    engine-independent. One hash exchange on user_id; the frame carries
    scalar sums only (no per-group buffers)."""
    views(spark, sf_dir, "events")
    return spark.sql(_zscore_sql("spark"))


# ---------------------------------------------------------------------------
# Banded Levenshtein near-duplicate pairs.
# ---------------------------------------------------------------------------

_LEV_CAP = 120  # verify on the first 120 chars — bounds per-pair cost
_LEV_BAND = 24  # candidate bucket: same (lang, length DIV 24)


def _editdist_sql(d: str) -> str:
    div = "DIV" if d == "spark" else "//"
    return f"""
WITH docs AS (
  SELECT doc_id, lang,
         substring(text, 1, {_LEV_CAP}) AS head,
         length(text) {div} {_LEV_BAND} AS band
  FROM {tbl('documents', d)}
), pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(levenshtein(a.head, b.head) AS BIGINT) AS edit_dist
  FROM docs a JOIN docs b
    ON a.lang = b.lang AND a.band = b.band AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, edit_dist
FROM pairs
WHERE edit_dist * 10 <= {_LEV_CAP} * 3
"""


@query(
    "dedup_edit_distance", oracle=_editdist_sql("duck"), tags=("llm", "dedup", "text")
)
def dedup_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level near-duplicate pairs: bucket candidates by
    (lang, length-band) so the self-join is bucket-local, then verify
    with Levenshtein distance on a fixed 120-char head (bounds per-pair
    cost at O(120²) and keeps the predicate engine-portable). Candidate
    generation scales with bucket collision counts, never |corpus|² —
    the same generate-then-verify shape as the MinHash/SimHash family;
    recall is bounded by the band width (documented tradeoff)."""
    views(spark, sf_dir, "documents")
    return spark.sql(_editdist_sql("spark"))


# ---------------------------------------------------------------------------
# Equi-width histogram.
# ---------------------------------------------------------------------------

_HIST_BUCKETS = 20


def _hist_sql(d: str) -> str:
    div = "DIV" if d == "spark" else "//"
    # bucket = floor((x - lo) / w) clamped to the last bucket; bounds come
    # from a 1-row aggregate joined in (single scan for bounds + single
    # scan for the fill — the two-pass histogram)
    return f"""
WITH bounds AS (
  SELECT MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi FROM {tbl('orders', d)}
),
bucketed AS (
  SELECT LEAST(CAST(floor((o_totalprice - b.lo) / ((b.hi - b.lo) / {_HIST_BUCKETS})) AS BIGINT),
               {_HIST_BUCKETS - 1}) AS bucket,
         b.lo, b.hi
  FROM {tbl('orders', d)} o CROSS JOIN bounds b
)
SELECT bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       round(MIN(lo) + bucket * ((MIN(hi) - MIN(lo)) / {_HIST_BUCKETS}), 6) AS bucket_lo
FROM bucketed
GROUP BY bucket
"""


@query("profile_histogram", oracle=_hist_sql("duck"), tags=("analytics", "profiling"))
def profile_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-pass equi-width histogram: a 1-row min/max aggregate broadcasts
    into the bucketing projection (classic first-pass-bounds histogram);
    the bucket arithmetic is the same double expression in both engines and
    the top bucket absorbs the max value. Cost: two scans, one 20-row
    shuffle — the shape ANALYZE-style column histograms use at any scale."""
    views(spark, sf_dir, "orders")
    return spark.sql(_hist_sql("spark"))


# ---------------------------------------------------------------------------
# Seasonality profile (hour-of-day x day-of-week).
# ---------------------------------------------------------------------------


def _seasonality_sql(d: str) -> str:
    hod = "hour(ts)" if d == "spark" else "CAST(hour(ts) AS INTEGER)"
    dow = "dayofweek(ts)" if d == "spark" else "CAST(dayofweek(ts) + 1 AS INTEGER)"
    return f"""
SELECT event_type,
       CAST({hod} AS BIGINT) AS hour_of_day,
       CAST({dow} AS BIGINT) AS day_of_week,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
FROM {tbl('events', d)}
GROUP BY 1, 2, 3
"""


@query("ts_seasonality_profile", oracle=_seasonality_sql("duck"), tags=("timeseries", "agg"))
def ts_seasonality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality profile: event volume and exact-decimal value mass per
    (series, hour-of-day, day-of-week) cell — the load-shape matrix behind
    capacity planning and anomaly baselines. One partial+final hash
    aggregate; the calendar keys are pure codegen projections (DuckDB's
    dayofweek is 0-based Sunday, Spark's 1-based — normalized in the
    oracle)."""
    views(spark, sf_dir, "events")
    return spark.sql(_seasonality_sql("spark"))
