"""Statistical-signal operators — round-4 wave 3.

Model-prep and monitoring signals that sit between the profiling family
(chi2/KS/entropy in :mod:`dataset_ops` / :mod:`insight_ops`) and the LLM
curation family (:mod:`llm_ops`): an n-gram language-model quality score
(the CCNet-style perplexity filter), classical time-series decomposition
and rolling regression, PSI drift, mutual information, and multi-touch
attribution, plus the FILTER-clause aggregate surface.

All queries are two-dialect SQL templates (Spark + DuckDB oracle) under
the registry determinism contract: ln()/ratio terms rounded to 12
decimals and summed through DECIMAL, exact-DECIMAL sums divided once in
DOUBLE, floor() before every double→BIGINT cast (Spark truncates, DuckDB
rounds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .dialect import dec_sum, tbl, ts_str, views
from .registry import query

# ---------------------------------------------------------------------------
# llm_bigram_lm_score — add-one-smoothed bigram LM perplexity filter.
# ---------------------------------------------------------------------------


def _bigram_positions(d: str) -> str:
    """Per-document bigram positions (w1, w2). Spark arrays are 0-indexed,
    DuckDB lists 1-indexed — the index spine differs, the output agrees."""
    if d == "spark":
        return f"""
w AS (SELECT doc_id, split(text, ' ') AS ws FROM {tbl('documents', d)}),
pos AS (
  SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
  FROM (SELECT doc_id, ws, explode(sequence(0, size(ws) - 2)) AS i
        FROM w WHERE size(ws) >= 2)
)"""
    return f"""
w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM {tbl('documents', d)}),
pos AS (
  SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
  FROM (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i
        FROM w WHERE len(ws) >= 2)
)"""


def _bigram_lm_sql(d: str) -> str:
    tok = "explode(ws)" if d == "spark" else "unnest(ws)"
    return f"""
WITH {_bigram_positions(d)},
toks AS (SELECT {tok} AS tok FROM w),
vocab AS (SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS v FROM toks),
big_cnt AS (
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12 FROM pos GROUP BY w1, w2
),
ctx_cnt AS (
  SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1 FROM pos GROUP BY w1
),
scored AS (
  SELECT p.doc_id,
         round(-ln((CAST(b.c12 AS DOUBLE) + 1.0)
                   / (CAST(c.c1 AS DOUBLE) + CAST(vocab.v AS DOUBLE))), 12)
           AS neg_logp
  FROM pos p
  JOIN big_cnt b ON b.w1 = p.w1 AND b.w2 = p.w2
  JOIN ctx_cnt c ON c.w1 = p.w1
  CROSS JOIN vocab
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       round({dec_sum('neg_logp', 12)} / COUNT(*), 6) AS avg_neg_logp
FROM scored
GROUP BY doc_id
ORDER BY avg_neg_logp DESC, doc_id
LIMIT 20
"""


@query("llm_bigram_lm_score", oracle=_bigram_lm_sql("duck"), tags=("llm", "text"))
def llm_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained bigram language-model score per document — the
    classical LM quality filter (CCNet / Wenzek et al. 2020, public):
    train add-one-smoothed bigram counts on the corpus itself, score
    every document by its average negative log-probability, and surface
    the 20 least-fluent documents. 100 TB shape: the bigram and context
    count tables are map-side combinable GROUP BYs keyed on the n-gram
    hash; the scoring pass joins each bigram position to its two count
    rows by equi-key (1:1 fan-out — the count tables carry one row per
    key, so join output is exactly the position count); the vocab scalar
    broadcasts. Stop-word context keys are Zipf-hot — AQE skew-join
    splits them, and the per-doc reduce is again map-side combinable.
    No window, no cartesian, no Python."""
    views(spark, sf_dir, "documents")
    return spark.sql(_bigram_lm_sql("spark"))


# ---------------------------------------------------------------------------
# ts_stl_decompose — trend / seasonal / remainder decomposition.
# ---------------------------------------------------------------------------


def _stl_sql(d: str) -> str:
    # Centered 24-hour moving average (11 preceding .. 12 following) as
    # the trend; hour-of-day means of the detrended series as the
    # additive seasonal; remainder = value - trend - seasonal. All sums
    # exact-DECIMAL with one DOUBLE division, matching both engines.
    return f"""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS h,
         round(CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
               / COUNT(*), 6) AS v
  FROM {tbl('events', d)}
  GROUP BY event_type, date_trunc('hour', ts)
),
tr AS (
  SELECT event_type, h, v,
         CASE WHEN COUNT(*) OVER w24 = 24 THEN
           round(CAST(SUM(CAST(v AS DECIMAL(28,6))) OVER w24 AS DOUBLE)
                 / 24.0, 6)
         END AS trend
  FROM hourly
  WINDOW w24 AS (PARTITION BY event_type ORDER BY h
                 ROWS BETWEEN 11 PRECEDING AND 12 FOLLOWING)
),
seas AS (
  SELECT event_type, hour(h) AS hod,
         round({dec_sum('v - trend', 6)} / COUNT(*), 6) AS seasonal
  FROM tr WHERE trend IS NOT NULL
  GROUP BY event_type, hour(h)
)
SELECT t.event_type, {ts_str('t.h', d)} AS hour, t.v AS value, t.trend,
       s.seasonal,
       round(t.v - t.trend - s.seasonal, 6) AS remainder
FROM tr t
JOIN seas s ON s.event_type = t.event_type AND s.hod = hour(t.h)
WHERE t.trend IS NOT NULL AND t.h < TIMESTAMP '2024-01-05 00:00:00'
ORDER BY t.event_type, t.h
"""


@query("ts_stl_decompose", oracle=_stl_sql("duck"), tags=("timeseries",))
def ts_stl_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive time-series decomposition (STL-style moving-average
    variant, Cleveland et al. 1990, public): per-series hourly means →
    centered 24-hour moving-average trend → hour-of-day seasonal means
    of the detrended series → remainder. Complements
    ``ts_seasonality_profile`` (raw hour-of-day profile) by removing the
    trend before estimating seasonality, and feeds the anomaly family
    (``ts_zscore_anomaly`` on the remainder is the classical detector).
    100 TB shape: the hourly downsample is a map-side combinable
    aggregation that shrinks input to series-length rows; the trend
    window and the final sort both partition by series key; the seasonal
    table (|series| x 24 rows) joins back by equi-key and broadcasts.
    Output is the first-four-days slice, totally ordered."""
    views(spark, sf_dir, "events")
    return spark.sql(_stl_sql("spark"))


# ---------------------------------------------------------------------------
# ts_rolling_ols_slope — rolling-window least-squares trend.
# ---------------------------------------------------------------------------

_OLS_X0 = 473_000  # epoch-hour offset (dataset is Jan 2024): keeps x small


def _rolling_ols_sql(d: str) -> str:
    if d == "spark":
        eph = "CAST(unix_timestamp(h) AS BIGINT) DIV 3600"
    else:
        eph = "CAST(floor(epoch(h)) AS BIGINT) // 3600"
    return f"""
WITH hourly AS (
  SELECT event_type, h,
         CAST({eph} - {_OLS_X0} AS DOUBLE) AS x,
         round(CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
               / COUNT(*), 6) AS y
  FROM (SELECT event_type, date_trunc('hour', ts) AS h, value
        FROM {tbl('events', d)})
  GROUP BY event_type, h
),
sums AS (
  SELECT event_type, h,
         CAST(COUNT(*) OVER w AS DOUBLE) AS n,
         CAST(SUM(CAST(x AS DECIMAL(28,6))) OVER w AS DOUBLE) AS sx,
         CAST(SUM(CAST(y AS DECIMAL(28,6))) OVER w AS DOUBLE) AS sy,
         CAST(SUM(CAST(x * x AS DECIMAL(28,6))) OVER w AS DOUBLE) AS sxx,
         CAST(SUM(CAST(x * y AS DECIMAL(28,6))) OVER w AS DOUBLE) AS sxy
  FROM hourly
  WINDOW w AS (PARTITION BY event_type ORDER BY h
               ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
)
SELECT event_type, {ts_str('h', d)} AS hour,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope_per_hour
FROM sums
WHERE n = 24
  AND h >= TIMESTAMP '2024-01-05 00:00:00'
  AND h < TIMESTAMP '2024-01-08 00:00:00'
ORDER BY event_type, h
"""


@query("ts_rolling_ols_slope", oracle=_rolling_ols_sql("duck"), tags=("timeseries",))
def ts_rolling_ols_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 24-hour ordinary-least-squares trend slope per series —
    the windowed regression behind "is this metric trending" monitors,
    complementing ``ts_holt_linear`` (recursive smoother) with the
    closed-form regression over a sliding window. Slope comes from the
    standard normal-equation form (n·Σxy − Σx·Σy)/(n·Σx² − (Σx)²) with
    every Σ an exact-DECIMAL window sum and the final arithmetic one
    fixed DOUBLE expression; x is the epoch-hour recentred by a constant
    offset so x² stays well inside DECIMAL(28,6). 100 TB shape: the
    hourly downsample collapses raw rows before any window; all windows
    partition by series key; output is a bounded three-day slice."""
    views(spark, sf_dir, "events")
    return spark.sql(_rolling_ols_sql("spark"))


# ---------------------------------------------------------------------------
# profile_psi_drift — Population Stability Index between two cohorts.
# ---------------------------------------------------------------------------

_PSI_SPLIT = "2024-01-16 00:00:00"  # cohort A = first half of the month
_PSI_BINS = 10
_PSI_W = 50  # fixed bin width over value's [0, 500) range


def _psi_sql(d: str) -> str:
    if d == "spark":
        spine = f"""
  SELECT t.event_type, b.bin
  FROM (SELECT DISTINCT event_type FROM {tbl('events', d)}) t,
       (SELECT explode(sequence(0, {_PSI_BINS - 1})) AS bin) b"""
    else:
        spine = f"""
  SELECT t.event_type, b.bin
  FROM (SELECT DISTINCT event_type FROM {tbl('events', d)}) t,
       (SELECT unnest(generate_series(0, {_PSI_BINS - 1})) AS bin) b"""
    return f"""
WITH binned AS (
  SELECT event_type,
         CASE WHEN value >= {_PSI_BINS * _PSI_W} THEN {_PSI_BINS - 1}
              ELSE CAST(floor(value / {_PSI_W}) AS INT) END AS bin,
         CASE WHEN ts < TIMESTAMP '{_PSI_SPLIT}' THEN 1 ELSE 0 END AS in_a
  FROM {tbl('events', d)}
),
cnt AS (
  SELECT event_type, bin,
         CAST(SUM(in_a) AS BIGINT) AS ca,
         CAST(SUM(1 - in_a) AS BIGINT) AS cb
  FROM binned GROUP BY event_type, bin
),
spine AS ({spine}),
filled AS (
  SELECT s.event_type, s.bin,
         COALESCE(c.ca, 0) AS ca, COALESCE(c.cb, 0) AS cb
  FROM spine s LEFT JOIN cnt c
    ON c.event_type = s.event_type AND c.bin = s.bin
),
tot AS (
  SELECT event_type, CAST(SUM(ca) AS BIGINT) AS na,
         CAST(SUM(cb) AS BIGINT) AS nb
  FROM filled GROUP BY event_type
),
terms AS (
  SELECT f.event_type, t.na, t.nb,
         round(((CAST(f.ca AS DOUBLE) + 0.5)
                  / (CAST(t.na AS DOUBLE) + {_PSI_BINS} * 0.5)
                - (CAST(f.cb AS DOUBLE) + 0.5)
                  / (CAST(t.nb AS DOUBLE) + {_PSI_BINS} * 0.5))
               * ln(((CAST(f.ca AS DOUBLE) + 0.5)
                       / (CAST(t.na AS DOUBLE) + {_PSI_BINS} * 0.5))
                    / ((CAST(f.cb AS DOUBLE) + 0.5)
                       / (CAST(t.nb AS DOUBLE) + {_PSI_BINS} * 0.5))),
               12) AS term
  FROM filled f JOIN tot t ON t.event_type = f.event_type
)
SELECT event_type, MIN(na) AS n_first_half, MIN(nb) AS n_second_half,
       round({dec_sum('term', 12)}, 6) AS psi
FROM terms
GROUP BY event_type
ORDER BY event_type
"""


@query("profile_psi_drift", oracle=_psi_sql("duck"), tags=("quality", "profiling"))
def profile_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of each metric's value distribution
    between the first and second half of the month — the standard
    model-monitoring drift score (PSI < 0.1 stable, > 0.25 shifted),
    complementing ``profile_ks_drift`` (continuous ECDF) and
    ``profile_drift_chi2`` (categorical) with the binned-ratio form
    practitioners actually alert on. Fixed-width bins (floor before the
    int cast — Spark truncates, DuckDB rounds), a generated
    series×bin spine so empty bins survive, Laplace 0.5 smoothing so
    ln() never sees zero, per-term round-12 + DECIMAL sum. 100 TB
    shape: one scan, map-side combinable counts, everything after the
    first GROUP BY is |series|×10 rows."""
    views(spark, sf_dir, "events")
    return spark.sql(_psi_sql("spark"))


# ---------------------------------------------------------------------------
# profile_mutual_information — dependence between column pairs.
# ---------------------------------------------------------------------------


def _mi_pair(d: str, pair: str, x: str, y: str, table: str) -> str:
    return f"""
SELECT '{pair}' AS pair_name, {x} AS xv, {y} AS yv
FROM {tbl(table, d)}"""


def _mi_sql(d: str) -> str:
    hod = "CAST(hour(ts) AS STRING)" if d == "spark" else "CAST(hour(ts) AS VARCHAR)"
    return f"""
WITH src AS (
  {_mi_pair(d, 'events.event_type|hour_of_day', 'event_type', hod, 'events')}
  UNION ALL
  {_mi_pair(d, 'documents.lang|source', 'lang', 'source', 'documents')}
),
joint AS (
  SELECT pair_name, xv, yv, CAST(COUNT(*) AS BIGINT) AS nxy
  FROM src GROUP BY pair_name, xv, yv
),
mx AS (
  SELECT pair_name, xv, CAST(SUM(nxy) AS BIGINT) AS nx
  FROM joint GROUP BY pair_name, xv
),
my AS (
  SELECT pair_name, yv, CAST(SUM(nxy) AS BIGINT) AS ny
  FROM joint GROUP BY pair_name, yv
),
tot AS (
  SELECT pair_name, CAST(SUM(nxy) AS BIGINT) AS n
  FROM joint GROUP BY pair_name
),
terms AS (
  SELECT j.pair_name,
         round((CAST(j.nxy AS DOUBLE) / CAST(t.n AS DOUBLE))
               * ln(CAST(t.n AS DOUBLE) * CAST(j.nxy AS DOUBLE)
                    / (CAST(x.nx AS DOUBLE) * CAST(y.ny AS DOUBLE))),
               12) AS term
  FROM joint j
  JOIN mx x ON x.pair_name = j.pair_name AND x.xv = j.xv
  JOIN my y ON y.pair_name = j.pair_name AND y.yv = j.yv
  JOIN tot t ON t.pair_name = j.pair_name
)
SELECT pair_name, CAST(COUNT(*) AS BIGINT) AS n_cells,
       round({dec_sum('term', 12)}, 6) AS mi_nats
FROM terms
GROUP BY pair_name
ORDER BY pair_name
"""


@query(
    "profile_mutual_information",
    oracle=_mi_sql("duck"),
    tags=("quality", "profiling"),
)
def profile_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information (nats) between categorical column pairs — the
    dependence signal feature stores use for leakage and redundancy
    checks, completing the profiling family next to ``profile_entropy``
    (marginal uncertainty) and ``profile_correlation_matrix`` (linear,
    numeric-only): MI = Σ p(x,y)·ln(p(x,y)/(p(x)p(y))) over the joint
    contingency table. 100 TB shape: one scan per profiled pair feeding
    a map-side combinable joint count; marginals derive from the joint
    (cells, not rows); the term join runs over contingency cells only,
    so everything downstream of the first GROUP BY is
    cardinality-bounded, never row-bounded."""
    views(spark, sf_dir, "events", "documents")
    return spark.sql(_mi_sql("spark"))


# ---------------------------------------------------------------------------
# attribution_linear_multi_touch — equal-credit attribution.
# ---------------------------------------------------------------------------

_ATTR_LOOKBACK_S = 259_200  # 3 days, matching attribution_last_touch


def _linear_attr_epoch(ts: str, d: str) -> str:
    if d == "spark":
        return f"CAST(unix_timestamp({ts}) AS BIGINT)"
    return f"CAST(floor(epoch({ts})) AS BIGINT)"


def _linear_attr_sql(d: str) -> str:
    return f"""
WITH clicks AS (
  SELECT user_id, event_id AS click_id, {_linear_attr_epoch('ts', d)} AS cs
  FROM {tbl('events', d)} WHERE event_type = 'click'
),
purch AS (
  SELECT user_id, event_id AS purchase_id, value,
         {_linear_attr_epoch('ts', d)} AS ps
  FROM {tbl('events', d)} WHERE event_type = 'purchase'
),
pairs AS (
  SELECT p.user_id, p.purchase_id, p.value, c.click_id
  FROM purch p JOIN clicks c
    ON c.user_id = p.user_id
   AND c.cs <= p.ps AND c.cs > p.ps - {_ATTR_LOOKBACK_S}
),
per_purchase AS (
  SELECT user_id, purchase_id, MIN(value) AS value,
         CAST(COUNT(*) AS BIGINT) AS n_touches
  FROM pairs GROUP BY user_id, purchase_id
),
credited AS (
  SELECT user_id,
         round(CAST(value AS DOUBLE) / CAST(n_touches AS DOUBLE), 12)
           AS credit_per_touch,
         n_touches
  FROM per_purchase
)
SELECT p.user_id,
       CAST(COUNT(*) AS BIGINT) AS n_purchases,
       CAST(COALESCE(MIN(c.n_cred), 0) AS BIGINT) AS n_credited_purchases,
       round(COALESCE(MIN(c.credit), 0.0), 6) AS total_credited_value
FROM purch p
LEFT JOIN (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_cred,
         {dec_sum('credit_per_touch * n_touches', 12)} AS credit
  FROM credited GROUP BY user_id
) c ON c.user_id = p.user_id
GROUP BY p.user_id
ORDER BY total_credited_value DESC, p.user_id
LIMIT 50
"""


@query(
    "attribution_linear_multi_touch",
    oracle=_linear_attr_sql("duck"),
    tags=("analytics",),
)
def attribution_linear_multi_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear (equal-credit) multi-touch attribution: every click in the
    3-day lookback before a purchase shares the purchase value equally —
    the fractional-credit counterpart of ``attribution_last_touch``.
    The touch↔conversion pairing is an equi-join on user_id with the
    range predicate applied inside the matched key group, so fan-out is
    bounded by per-user activity in the lookback window (never a global
    inequality join); per-purchase touch counts and per-user rollups are
    map-side combinable. Credit shares are rounded to 12 decimals and
    summed through DECIMAL so the per-user total is order-independent.
    100 TB shape: shuffle keys are user_id — the natural partitioning of
    clickstream data — and the final top-50 is a TakeOrdered, not a
    global sort."""
    views(spark, sf_dir, "events")
    return spark.sql(_linear_attr_sql("spark"))


# ---------------------------------------------------------------------------
# sql_agg_filter_surface — FILTER-clause aggregate parity.
# ---------------------------------------------------------------------------


def _agg_filter_sql(d: str) -> str:
    ship = (
        "CAST(l_shipdate AS STRING)" if d == "spark" else "CAST(l_shipdate AS VARCHAR)"
    )
    return f"""
SELECT l_linestatus,
       CAST(COUNT(*) AS BIGINT) AS cnt_all,
       CAST(COUNT(*) FILTER (WHERE l_returnflag = 'R') AS BIGINT)
         AS cnt_returned,
       CAST(SUM(CAST(l_quantity AS DECIMAL(28,6)))
              FILTER (WHERE l_returnflag = 'R') AS DOUBLE) AS qty_returned,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6)))
              FILTER (WHERE l_discount > 0.05) AS DOUBLE)
         AS revenue_high_discount,
       MAX({ship}) FILTER (WHERE l_discount = 0) AS last_full_price_shipdate,
       CAST(MIN(l_orderkey) FILTER (WHERE l_tax = 0) AS BIGINT)
         AS first_untaxed_order
FROM {tbl('lineitem', d)}
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


@query("sql_agg_filter_surface", oracle=_agg_filter_sql("duck"), tags=("sql",))
def sql_agg_filter_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTER-clause aggregates (SQL:2003 T612, supported by Spark since
    3.0): conditional COUNT/SUM/MIN/MAX inside one grouped scan, the
    idiom that replaces N self-joins or CASE-WHEN pyramids for cohort
    metrics. One pass over lineitem, map-side combinable partials per
    filter, exact-DECIMAL money sums emitted as DOUBLE. The point of the
    probe is dialect parity of the FILTER clause itself — both engines
    must agree bit-for-bit on every conditional aggregate."""
    views(spark, sf_dir, "lineitem")
    return spark.sql(_agg_filter_sql("spark"))
