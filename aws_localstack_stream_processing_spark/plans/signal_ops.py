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

from .cachelife import LiveCache
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
    No window, no cartesian, no Python.

    Spark path (r13): the bigram-position table ``pos`` was re-planned
    for all THREE consumers (bigram counts, context counts, scoring) and
    ``w`` (the split) a fourth time for the vocab scalar — 4 tokenize
    scans measured. ``pos`` persists once; only the vocab count pays its
    own (column-pruned) split pass (guide §5; scans 4→2)."""
    views(spark, sf_dir, "documents")
    pos = spark.sql(_pos_flat_spark_sql()).persist()
    pos.createOrReplaceTempView("slsp_blm_pos")
    return spark.sql(
        f"""
WITH {_bigram_scored_ctes('slsp_blm_pos')}
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       round({dec_sum('neg_logp', 12)} / COUNT(*), 6) AS avg_neg_logp
FROM scored
GROUP BY doc_id
ORDER BY avg_neg_logp DESC, doc_id
LIMIT 20
"""
    )


def _pos_flat_spark_sql() -> str:
    """The bigram-position table as a CTE-free (persistable) plan — the
    same pos expression as _bigram_positions, flattened into nested FROM
    subqueries so CacheManager can substitute the persisted relation
    (it cannot match plans containing WithCTE)."""
    return f"""
SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
FROM (SELECT doc_id, ws, explode(sequence(0, size(ws) - 2)) AS i
      FROM (SELECT doc_id, split(text, ' ') AS ws
            FROM {tbl('documents', 'spark')}) w
      WHERE size(ws) >= 2)
"""


def _bigram_scored_ctes(pos_src: str) -> str:
    """The add-one-smoothed bigram scoring chain (vocab, count tables,
    per-position neg-logp) over a bigram-position source view — shared
    by ``llm_bigram_lm_score`` and ``llm_filter_stack``'s LM leg so both
    read ONE persisted pos materialization (guide §5)."""
    return f"""toks AS (
  SELECT explode(ws) AS tok
  FROM (SELECT split(text, ' ') AS ws FROM {tbl('documents', 'spark')})
),
vocab AS (SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS v FROM toks),
big_cnt AS (
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12 FROM {pos_src} GROUP BY w1, w2
),
ctx_cnt AS (
  SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1 FROM {pos_src} GROUP BY w1
),
scored AS (
  SELECT p.doc_id,
         round(-ln((CAST(b.c12 AS DOUBLE) + 1.0)
                   / (CAST(c.c1 AS DOUBLE) + CAST(vocab.v AS DOUBLE))), 12)
           AS neg_logp
  FROM {pos_src} p
  JOIN big_cnt b ON b.w1 = p.w1 AND b.w2 = p.w2
  JOIN ctx_cnt c ON c.w1 = p.w1
  CROSS JOIN vocab
)"""


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


def _mi_joint_sql(d: str) -> str:
    hod = "CAST(hour(ts) AS STRING)" if d == "spark" else "CAST(hour(ts) AS VARCHAR)"
    return f"""
WITH src AS (
  {_mi_pair(d, 'events.event_type|hour_of_day', 'event_type', hod, 'events')}
  UNION ALL
  {_mi_pair(d, 'documents.lang|source', 'lang', 'source', 'documents')}
)
SELECT pair_name, xv, yv, CAST(COUNT(*) AS BIGINT) AS nxy
FROM src GROUP BY pair_name, xv, yv
"""


def _mi_sql(d: str, joint_table: str | None = None) -> str:
    """The MI computation over a joint contingency table.

    With ``joint_table`` set (the Spark path) the table is referenced
    DIRECTLY as a derived table — not via a CTE: Spark's analyzer keeps
    CTE definitions behind ``WithCTE``/``CTERelationRef`` nodes, and
    CacheManager's plan substitution does not reach inside them, so a
    persisted/temp-view joint wrapped in ``WITH joint AS (SELECT * FROM
    mi_joint)`` silently recomputed from parquet (measured r11: zero
    InMemoryTableScans, 8 file scans). Direct references substitute the
    cache at every read site. The oracle (no ``joint_table``) keeps the
    CTE form — DuckDB semantics are identical either way."""
    jref = joint_table or f"({_mi_joint_sql(d).strip()})"
    return f"""
SELECT pair_name, CAST(COUNT(*) AS BIGINT) AS n_cells,
       round({dec_sum('term', 12)}, 6) AS mi_nats
FROM (
  SELECT j.pair_name,
         round((CAST(j.nxy AS DOUBLE) / CAST(t.n AS DOUBLE))
               * ln(CAST(t.n AS DOUBLE) * CAST(j.nxy AS DOUBLE)
                    / (CAST(x.nx AS DOUBLE) * CAST(y.ny AS DOUBLE))),
               12) AS term
  FROM {jref} j
  JOIN (
    SELECT pair_name, xv, CAST(SUM(nxy) AS BIGINT) AS nx
    FROM {jref} GROUP BY pair_name, xv
  ) x ON x.pair_name = j.pair_name AND x.xv = j.xv
  JOIN (
    SELECT pair_name, yv, CAST(SUM(nxy) AS BIGINT) AS ny
    FROM {jref} GROUP BY pair_name, yv
  ) y ON y.pair_name = j.pair_name AND y.yv = j.yv
  JOIN (
    SELECT pair_name, CAST(SUM(nxy) AS BIGINT) AS n
    FROM {jref} GROUP BY pair_name
  ) t ON t.pair_name = j.pair_name
) terms
GROUP BY pair_name
ORDER BY pair_name
"""


# recent profile_mutual_information calls' persisted joints — lock-guarded
# bounded lifecycle (ADVICE r12); see the query docstring and plans/cachelife.py
_MI_JOINT_LIVE = LiveCache(keep=2)


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
    cardinality-bounded, never row-bounded.

    The joint table is PERSISTED (r11, VERDICT r10 #3): mx/my/tot/terms
    all re-derive from it, and leaving the diamond implicit made the
    plan depend on AQE's exchange-reuse race — whether the identical
    joint subtrees' shuffle stages materialized before or after the
    runtime replan flipped a join to broadcast (reproduced: 4/8 runs at
    sf0.1 planned 7 exchanges, 4/8 planned 8, identical data and conf).
    One explicit materialization = one scan pass over the inputs, four
    cache reads, and a deterministic final plan.

    Cache/view lifecycle (ADVICE r11, hardened r12): the joint is
    registered under a PER-CALL unique view name (concurrent or
    interleaved invocations in one session never race on a shared name —
    the fingerprint is a node-count vector, so the name never perturbs
    the PLANFP pin), and the persisted joint is tracked in a
    lock-guarded :class:`~..plans.cachelife.LiveCache` that retires all
    but the newest two — so interleaved invocations can no longer
    unpersist a still-unmaterialized predecessor's joint (ADVICE r12),
    and a no-clearCache session (tests, verify harness, interactive) is
    bounded at two cached relations. The returned DataFrame is lazy, so
    the CURRENT call's cache cannot be dropped here; a caller wanting a
    fully clean session uses ``spark.catalog.clearCache()`` after
    materializing."""
    import uuid

    views(spark, sf_dir, "events", "documents")
    joint = _MI_JOINT_LIVE.track(
        spark.sql(_mi_joint_sql("spark")).persist(), key=sf_dir
    )
    name = f"mi_joint_{uuid.uuid4().hex[:8]}"
    joint.createOrReplaceTempView(name)
    return spark.sql(_mi_sql("spark", joint_table=name))


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


# ===========================================================================
# Wave 4 — graph scoring, survival analysis, conversion latency, decayed
# attribution, and the time-interval RANGE window frame surface.
# ===========================================================================

# ---------------------------------------------------------------------------
# graph_adamic_adar — inverse-log-degree link prediction.
# ---------------------------------------------------------------------------

_AA_COHORT_MOD = 20  # same query cohort as graph_jaccard_link_predict
_AA_TOPN = 50


def _adamic_adar_fwd_sql(d: str) -> str:
    """The distinct customer↔supplier edge list — the subplan both the
    degree table and the query cohort read (Spark persists it once)."""
    return (
        f"SELECT DISTINCT o.o_custkey AS cust, l.l_suppkey AS supp "
        f"FROM {tbl('orders', d)} o JOIN {tbl('lineitem', d)} l "
        f"ON o.o_orderkey = l.l_orderkey"
    )


def _adamic_adar_body(d: str, fwd_src: str) -> str:
    return f"""
WITH fwd AS (SELECT * FROM {fwd_src}),
supp_deg AS (
  SELECT supp, CAST(COUNT(*) AS BIGINT) AS sdeg FROM fwd GROUP BY supp
),
cohort AS (
  SELECT cust, supp FROM fwd WHERE cust % {_AA_COHORT_MOD} = 0
),
wedges AS (
  SELECT a.cust AS cust_a, b.cust AS cust_b, a.supp
  FROM cohort a JOIN cohort b ON a.supp = b.supp AND a.cust < b.cust
),
terms AS (
  SELECT w.cust_a, w.cust_b,
         round(1.0 / ln(CAST(sd.sdeg AS DOUBLE)), 12) AS term
  FROM wedges w JOIN supp_deg sd ON sd.supp = w.supp
)
SELECT cust_a, cust_b, CAST(COUNT(*) AS BIGINT) AS n_common,
       round({dec_sum('term', 12)}, 6) AS adamic_adar
FROM terms
GROUP BY cust_a, cust_b
ORDER BY adamic_adar DESC, cust_a, cust_b
LIMIT {_AA_TOPN}
"""


def _adamic_adar_sql(d: str) -> str:
    return _adamic_adar_body(d, f"({_adamic_adar_fwd_sql(d)})")


@query(
    "graph_adamic_adar",
    oracle=_adamic_adar_sql("duck"),
    tags=("graph", "similarity"),
)
def graph_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic–Adar link prediction (Adamic & Adar 2003, public) over the
    customer↔supplier bipartite graph: candidate pairs share a supplier,
    scored Σ 1/ln(degree(shared supplier)) so rare co-suppliers count
    more than hubs — the weighting that separates AA from the plain
    common-neighbor Jaccard of ``graph_jaccard_link_predict``. Any
    shared supplier has global degree ≥ 2, so ln() never sees 1. 100 TB
    shape identical to the Jaccard op: wedge equi-join through the
    shared supplier restricted to the query cohort (cost ~ Σ per-supplier
    cohort-degree², hub cost bounded by the inverse-log weight mattering
    least exactly where degree is largest), per-term round-12 + DECIMAL
    sum, TakeOrdered top-k.

    Spark path (r13): the distinct edge list ``fwd`` (orders⋈lineitem +
    DISTINCT — the expensive corpus piece) was re-planned for both its
    consumers (degree table and cohort; 2 sort-merge joins / 6 scans in
    the plan); persist it once and run the oracle-shared scoring text
    over the cached view (guide §5; plan: 6→2 scans, SMJ 2→1)."""
    views(spark, sf_dir, "orders", "lineitem")
    fwd = spark.sql(_adamic_adar_fwd_sql("spark")).persist()
    fwd.createOrReplaceTempView("slsp_aa_fwd")
    return spark.sql(_adamic_adar_body("spark", "slsp_aa_fwd"))


# ---------------------------------------------------------------------------
# cohort_cumulative_hazard — Nelson–Aalen estimator per signup cohort.
# ---------------------------------------------------------------------------


def _hazard_epoch(ts: str, d: str) -> str:
    if d == "spark":
        return f"CAST(unix_timestamp({ts}) AS BIGINT)"
    return f"CAST(floor(epoch({ts})) AS BIGINT)"


def _hazard_sql(d: str) -> str:
    wk = "CAST(day(s.signup_ts) AS BIGINT)"
    return f"""
WITH signup AS (
  SELECT user_id, MIN(ts) AS signup_ts
  FROM {tbl('events', d)} WHERE event_type = 'signup' GROUP BY user_id
),
conv AS (
  SELECT s.user_id, s.signup_ts, MIN(e.ts) AS conv_ts
  FROM signup s JOIN {tbl('events', d)} e
    ON e.user_id = s.user_id AND e.event_type = 'purchase'
   AND e.ts >= s.signup_ts
  GROUP BY s.user_id, s.signup_ts
),
horizon AS (SELECT MAX(ts) AS tmax FROM {tbl('events', d)}),
subjects AS (
  SELECT {wk} AS cohort_day,
         CASE WHEN c.conv_ts IS NOT NULL THEN
           ({_hazard_epoch('c.conv_ts', d)} - {_hazard_epoch('s.signup_ts', d)})
             {'DIV' if d == 'spark' else '//'} 86400
         ELSE
           ({_hazard_epoch('h.tmax', d)} - {_hazard_epoch('s.signup_ts', d)})
             {'DIV' if d == 'spark' else '//'} 86400
         END AS dur_days,
         CASE WHEN c.conv_ts IS NOT NULL THEN 1 ELSE 0 END AS is_event
  FROM signup s
  LEFT JOIN conv c ON c.user_id = s.user_id
  CROSS JOIN horizon h
),
per_day AS (
  SELECT cohort_day, dur_days AS day,
         CAST(SUM(is_event) AS BIGINT) AS d_events,
         CAST(COUNT(*) AS BIGINT) AS leaving
  FROM subjects GROUP BY cohort_day, dur_days
),
risk AS (
  SELECT cohort_day, day, d_events,
         CAST(SUM(leaving) OVER (
           PARTITION BY cohort_day ORDER BY day DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS BIGINT) AS n_risk
  FROM per_day
)
SELECT cohort_day, CAST(day AS BIGINT) AS day, n_risk, d_events,
       round(CAST(SUM(CAST(round(
               CAST(d_events AS DOUBLE) / CAST(n_risk AS DOUBLE), 12)
             AS DECIMAL(28,12))) OVER (
               PARTITION BY cohort_day ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS DOUBLE), 6) AS cum_hazard
FROM risk
WHERE day <= 14
ORDER BY cohort_day, day
"""


@query("cohort_cumulative_hazard", oracle=_hazard_sql("duck"), tags=("analytics",))
def cohort_cumulative_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson–Aalen cumulative-hazard curve of signup→purchase conversion
    per signup-day cohort (the test month spans one calendar month, so day-of-month is the cohort key) — the survival-analysis counterpart of
    ``cohort_retention``: subjects enter at first signup, convert at
    first subsequent purchase, and are right-censored at the observation
    horizon. H(t) = Σ_{t_i≤t} d_i/n_i is chosen over Kaplan–Meier
    because it is a SUM (round-12 terms through DECIMAL, bit-exact)
    rather than a product. The risk set comes from a reverse cumulative
    count over per-day exits; both running windows partition by cohort.
    100 TB shape: two user-keyed aggregations collapse raw events to one
    row per subject, then everything is |cohorts|×|days| rows; the
    horizon scalar broadcasts."""
    views(spark, sf_dir, "events")
    return spark.sql(_hazard_sql("spark"))


# ---------------------------------------------------------------------------
# funnel_time_to_convert — conversion-latency percentiles per cohort.
# ---------------------------------------------------------------------------


def _ttc_sql(d: str) -> str:
    return f"""
WITH signup AS (
  SELECT user_id, MIN(ts) AS signup_ts
  FROM {tbl('events', d)} WHERE event_type = 'signup' GROUP BY user_id
),
conv AS (
  SELECT s.user_id, s.signup_ts, MIN(e.ts) AS conv_ts
  FROM signup s JOIN {tbl('events', d)} e
    ON e.user_id = s.user_id AND e.event_type = 'purchase'
   AND e.ts >= s.signup_ts
  GROUP BY s.user_id, s.signup_ts
),
lat AS (
  SELECT CAST(day(signup_ts) AS BIGINT) AS cohort_day,
         ({_hazard_epoch('conv_ts', d)} - {_hazard_epoch('signup_ts', d)})
           {'DIV' if d == 'spark' else '//'} 60 AS latency_min
  FROM conv
),
n_all AS (
  SELECT CAST(day(signup_ts) AS BIGINT) AS cohort_day,
         CAST(COUNT(*) AS BIGINT) AS n_signups
  FROM signup GROUP BY CAST(day(signup_ts) AS BIGINT)
)
SELECT a.cohort_day, a.n_signups,
       CAST(COUNT(l.latency_min) AS BIGINT) AS n_converted,
       CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY l.latency_min)
            AS BIGINT) AS p50_latency_min,
       CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY l.latency_min)
            AS BIGINT) AS p90_latency_min
FROM n_all a LEFT JOIN lat l ON l.cohort_day = a.cohort_day
GROUP BY a.cohort_day, a.n_signups
ORDER BY a.cohort_day
"""


@query("funnel_time_to_convert", oracle=_ttc_sql("duck"), tags=("analytics",))
def funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup→first-purchase conversion latency per signup-day cohort:
    conversion counts plus exact p50/p90 latency minutes — the
    time-dimension companion to ``funnel_conversion`` (stage counts) and
    ``cohort_cumulative_hazard`` (full hazard curve). percentile_disc
    returns an actual data value in both engines (no interpolation
    arithmetic to diverge); latency lands on whole minutes via
    integer-epoch subtraction and integer division. 100 TB shape:
    user-keyed min aggregations collapse events to one row per subject,
    the percentile sort runs inside each cohort partition, output is
    |cohorts| rows."""
    views(spark, sf_dir, "events")
    return spark.sql(_ttc_sql("spark"))


# ---------------------------------------------------------------------------
# attribution_time_decay — dyadic time-decay credit shares.
# ---------------------------------------------------------------------------


def _decay_attr_sql(d: str) -> str:
    idiv = "DIV" if d == "spark" else "//"
    return f"""
WITH clicks AS (
  SELECT user_id, event_id AS click_id, {_hazard_epoch('ts', d)} AS cs
  FROM {tbl('events', d)} WHERE event_type = 'click'
),
purch AS (
  SELECT user_id, event_id AS purchase_id, value,
         {_hazard_epoch('ts', d)} AS ps
  FROM {tbl('events', d)} WHERE event_type = 'purchase'
),
pairs AS (
  SELECT p.user_id, p.purchase_id, p.value, c.click_id,
         CASE (p.ps - c.cs) {idiv} 86400
           WHEN 0 THEN 1.0 WHEN 1 THEN 0.5 ELSE 0.25 END AS w
  FROM purch p JOIN clicks c
    ON c.user_id = p.user_id
   AND c.cs <= p.ps AND c.cs > p.ps - {_ATTR_LOOKBACK_S}
),
per_purchase AS (
  SELECT user_id, purchase_id, MIN(value) AS value,
         CAST(SUM(CAST(w AS DECIMAL(18,6))) AS DOUBLE) AS w_sum,
         CAST(COUNT(*) AS BIGINT) AS n_touches
  FROM pairs GROUP BY user_id, purchase_id
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_credited_purchases,
       CAST(SUM(n_touches) AS BIGINT) AS n_touches,
       round(CAST(SUM(CAST(round(CAST(value AS DOUBLE), 12)
                           AS DECIMAL(28,12))) AS DOUBLE), 6)
         AS credited_value
FROM per_purchase
GROUP BY user_id
ORDER BY credited_value DESC, user_id
LIMIT 50
"""


@query("attribution_time_decay", oracle=_decay_attr_sql("duck"), tags=("analytics",))
def attribution_time_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decay attribution with exact dyadic weights: clicks in the
    3-day lookback before a purchase earn weight 1 / 0.5 / 0.25 by age
    day — halving instead of exp(-λt) because powers of two are exact in
    DECIMAL, so the weight normalization (the per-purchase w_sum both
    engines must agree on) carries no libm dependence. Same
    user_id-equi-join + in-key range predicate shape as
    ``attribution_linear_multi_touch``; per-purchase weight sums and the
    per-user rollup are map-side combinable; top-50 is TakeOrdered.
    The decayed per-click share is w/w_sum — emitted here as the
    per-purchase aggregate view (credited value + touch counts), the
    form attribution dashboards actually read."""
    views(spark, sf_dir, "events")
    return spark.sql(_decay_attr_sql("spark"))


# ---------------------------------------------------------------------------
# sql_window_time_range_frames — interval RANGE frame parity.
# ---------------------------------------------------------------------------


def _time_range_sql(d: str) -> str:
    return f"""
WITH e AS (
  SELECT event_id, event_type, date_trunc('second', ts) AS tsec, value
  FROM {tbl('events', d)}
  WHERE ts < TIMESTAMP '2024-01-02 00:00:00'
)
SELECT event_id, event_type, {ts_str('tsec', d)} AS ts_second,
       CAST(COUNT(*) OVER w1h AS BIGINT) AS n_last_hour,
       CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER w1h AS DOUBLE)
         AS sum_last_hour
FROM e
WINDOW w1h AS (PARTITION BY event_type ORDER BY tsec
               RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
ORDER BY event_type, tsec, event_id
"""


@query("sql_window_time_range_frames", oracle=_time_range_sql("duck"), tags=("sql",))
def sql_window_time_range_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-interval RANGE window frames (``RANGE BETWEEN INTERVAL 1 HOUR
    PRECEDING AND CURRENT ROW``) — the sliding-by-time frame that
    ``sql_window_frames`` (ROWS / numeric RANGE) does not touch, and the
    batch analogue of the streaming sliding window. Timestamps are
    truncated to whole seconds in both engines first, so frame
    membership at the exact one-hour boundary cannot diverge between
    DuckDB's nanosecond and Spark's microsecond precision; peers within
    a second share frames per RANGE semantics, making every output value
    order-independent. Window partitions by series key; the probed slice
    is one bounded day, totally ordered."""
    views(spark, sf_dir, "events")
    return spark.sql(_time_range_sql("spark"))


# ---------------------------------------------------------------------------
# emb_hard_negative_mining — contrastive-training negative selection.
# ---------------------------------------------------------------------------

_HNM_ANCHORS = 8  # anchor cohort: vec_id < 8
_HNM_TOPK = 5


def _hnm_sql(d: str) -> str:
    from .llm_ops import DIM, to_double_arr
    from .dialect import dot

    arr = to_double_arr("embedding", d)
    return f"""
WITH base AS (
  SELECT vec_id, label, {arr} AS emb FROM {tbl('embeddings', d)}
),
normed AS (
  SELECT vec_id, label, emb, sqrt({dot('emb', 'emb', DIM, d)}) AS nrm
  FROM base
),
anchors AS (SELECT * FROM normed WHERE vec_id < {_HNM_ANCHORS}),
pairs AS (
  SELECT a.vec_id AS anchor_id, a.label AS anchor_label,
         n.vec_id AS cand_id, n.label AS cand_label,
         {dot('a.emb', 'n.emb', DIM, d)} / (a.nrm * n.nrm) AS cos_sim
  FROM anchors a JOIN normed n ON n.vec_id <> a.vec_id
),
best_pos AS (
  SELECT anchor_id, MAX(cos_sim) AS pos_cos
  FROM pairs WHERE cand_label = anchor_label GROUP BY anchor_id
),
negs AS (
  SELECT anchor_id, cand_id, cos_sim,
         ROW_NUMBER() OVER (PARTITION BY anchor_id
                            ORDER BY cos_sim DESC, cand_id) AS rnk
  FROM pairs WHERE cand_label <> anchor_label
)
SELECT {"/*+ BROADCAST(p) */" if d == "spark" else ""} n.anchor_id,
       n.cand_id AS negative_id, CAST(n.rnk AS BIGINT) AS rnk,
       round(n.cos_sim, 6) AS neg_cosine,
       round(n.cos_sim - p.pos_cos, 6) AS margin
FROM negs n JOIN best_pos p ON p.anchor_id = n.anchor_id
WHERE n.rnk <= {_HNM_TOPK}
ORDER BY n.anchor_id, n.rnk
"""


@query(
    "emb_hard_negative_mining",
    oracle=_hnm_sql("duck"),
    tags=("llm", "similarity"),
)
def emb_hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive embedding training: for each
    anchor, the top-k most-similar DIFFERENT-label vectors plus the
    margin against the anchor's hardest positive — the batch-mining step
    behind triplet/InfoNCE training sets (Schroff et al. 2015 FaceNet,
    public). A negative with margin > 0 outranks every positive — the
    "hardest" examples a curriculum feeds first. 100 TB shape: identical
    to ``sim_cosine_topk`` — the anchor cohort broadcasts, the corpus
    streams through one pass with JVM-codegen dot products, the rank
    window partitions by anchor over candidate rows only; the per-anchor
    positive max is map-side combinable. The cohort size is the batch
    knob production miners already use.

    Spark path (r13): ``pairs`` (the anchor×corpus cosine table) heads a
    diamond — ``best_pos`` and ``negs`` both read it — and CTE inlining
    ran the corpus scan + 8 64-term dot products per row TWICE. The
    slim pair table (5 narrow columns, |anchors|·N rows) persists once;
    both consumers read the cache (guide §5; corpus cosine passes 2→1,
    scans 4→1)."""
    from .llm_ops import DIM as _DIM
    from .dialect import dot as _dot
    from .dialect import to_double_arr as _tda

    views(spark, sf_dir, "embeddings")
    arr = _tda("embedding", "spark")
    normed = (
        f"SELECT vec_id, label, emb, sqrt({_dot('emb', 'emb', _DIM, 'spark')}) AS nrm "
        f"FROM (SELECT vec_id, label, {arr} AS emb FROM {tbl('embeddings', 'spark')})"
    )
    # CTE-free persisted plan; the 8-row anchor side broadcasts (pinned —
    # the filtered subquery has no stats)
    pairs = spark.sql(
        f"""
SELECT /*+ BROADCAST(a) */
       a.vec_id AS anchor_id, a.label AS anchor_label,
       n.vec_id AS cand_id, n.label AS cand_label,
       {_dot('a.emb', 'n.emb', _DIM, 'spark')} / (a.nrm * n.nrm) AS cos_sim
FROM (SELECT * FROM ({normed}) q WHERE vec_id < {_HNM_ANCHORS}) a
JOIN ({normed}) n ON n.vec_id <> a.vec_id
"""
    ).persist()
    pairs.createOrReplaceTempView("slsp_hnm_pairs")
    return spark.sql(
        f"""
WITH best_pos AS (
  SELECT anchor_id, MAX(cos_sim) AS pos_cos
  FROM slsp_hnm_pairs WHERE cand_label = anchor_label GROUP BY anchor_id
),
negs AS (
  SELECT anchor_id, cand_id, cos_sim,
         ROW_NUMBER() OVER (PARTITION BY anchor_id
                            ORDER BY cos_sim DESC, cand_id) AS rnk
  FROM slsp_hnm_pairs WHERE cand_label <> anchor_label
)
SELECT /*+ BROADCAST(p) */ n.anchor_id,
       n.cand_id AS negative_id, CAST(n.rnk AS BIGINT) AS rnk,
       round(n.cos_sim, 6) AS neg_cosine,
       round(n.cos_sim - p.pos_cos, 6) AS margin
FROM negs n JOIN best_pos p ON p.anchor_id = n.anchor_id
WHERE n.rnk <= {_HNM_TOPK}
ORDER BY n.anchor_id, n.rnk
"""
    )


# ---------------------------------------------------------------------------
# lake_vacuum_plan — snapshot-retention garbage collection planner.
# ---------------------------------------------------------------------------

_VACUUM_RETAIN_FROM = 5  # snapshots >= this id are retained


def _vacuum_sql(d: str) -> str:
    return f"""
WITH refs AS (
  SELECT l_orderkey % 200 AS file_id,
         CAST(year(l_shipdate) AS BIGINT) - 1992 AS snapshot_id,
         CAST(COUNT(*) * 64 AS BIGINT) AS ref_bytes
  FROM {tbl('lineitem', d)}
  GROUP BY l_orderkey % 200, year(l_shipdate)
),
files AS (
  SELECT file_id,
         CAST(MIN(snapshot_id) AS BIGINT) AS first_snap,
         CAST(MAX(snapshot_id) AS BIGINT) AS last_snap,
         CAST(SUM(ref_bytes) AS BIGINT) AS est_bytes
  FROM refs GROUP BY file_id
)
SELECT file_id, first_snap, last_snap, est_bytes,
       last_snap < {_VACUUM_RETAIN_FROM} AS deletable
FROM files
ORDER BY file_id
"""


@query("lake_vacuum_plan", oracle=_vacuum_sql("duck"), tags=("lakehouse",))
def lake_vacuum_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-retention vacuum planner (the planning step of Delta
    VACUUM / Iceberg expire_snapshots): a file is deletable iff its last
    referencing snapshot predates the retention horizon — files still
    referenced by ANY retained snapshot must survive, however old their
    first reference is. The file↔snapshot reference manifest is modeled
    from lineitem the same way ``lake_compaction_plan`` models its file
    table. 100 TB shape: manifests (not data) are scanned; one map-side
    combinable aggregation to per-file lifetimes, then the plan is
    |files| rows — why engines run retention planning as a query while
    the actual deletes go to the object store."""
    views(spark, sf_dir, "lineitem")
    return spark.sql(_vacuum_sql("spark"))


# ---------------------------------------------------------------------------
# llm_filter_stack — the composed curation gate.
# ---------------------------------------------------------------------------

_STACK_LM_MAX = 9.5  # avg -ln p(bigram) ceiling (nats)
_STACK_DUP_MAX = 0.5  # duplicated-span fraction ceiling
_STACK_QC_MIN = "-0.1"  # quality-classifier logit floor (laxer than the
# standalone gate's keep threshold: the stack only drops clearly spammy docs)


def _bigram_doc_scores(d: str) -> str:
    """Per-document bigram-LM scores for ALL documents (the un-limited
    core of ``llm_bigram_lm_score``), as a nestable subquery."""
    tok = "explode(ws)" if d == "spark" else "unnest(ws)"
    return f"""
(WITH {_bigram_positions(d)},
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
SELECT doc_id, round(SUM(CAST(neg_logp AS DECIMAL(28,12))) / COUNT(*), 6)
         AS avg_neg_logp
FROM scored GROUP BY doc_id)"""


def _filter_stack_body(d: str, lm_src: str, dup_src: str | None = None) -> str:
    from .corpus_ops import _qc_scores
    from .curation_ops import _dup_span_sql
    from .quality_ops import _gopher_sql

    return f"""
WITH gopher AS (
  SELECT doc_id, lang, n_words, keep AS gate_gopher
  FROM ({_gopher_sql(d)}) g
),
lm AS (
  SELECT doc_id, CAST(avg_neg_logp AS DOUBLE) AS avg_neg_logp
  FROM {lm_src} s
),
dup AS (
  SELECT doc_id, dup_frac FROM ({dup_src or _dup_span_sql(d)}) x
),
qcls AS (
  SELECT doc_id, logit
  FROM (WITH {_qc_scores(d).lstrip()} SELECT doc_id, logit FROM qc) z
)
SELECT g.doc_id, g.lang, g.n_words,
       round(COALESCE(l.avg_neg_logp, 0.0), 6) AS lm_score,
       round(COALESCE(p.dup_frac, 0.0), 6) AS dup_frac,
       round(COALESCE(q.logit, 0.0), 6) AS quality_logit,
       g.gate_gopher,
       COALESCE(l.avg_neg_logp, 0.0) <= {_STACK_LM_MAX} AS gate_lm,
       COALESCE(p.dup_frac, 0.0) <= {_STACK_DUP_MAX} AS gate_dup,
       COALESCE(q.logit, 0.0) >= CAST({_STACK_QC_MIN} AS DOUBLE)
         AS gate_quality,
       (g.gate_gopher
        AND COALESCE(l.avg_neg_logp, 0.0) <= {_STACK_LM_MAX}
        AND COALESCE(p.dup_frac, 0.0) <= {_STACK_DUP_MAX}
        AND COALESCE(q.logit, 0.0) >= CAST({_STACK_QC_MIN} AS DOUBLE))
         AS keep
FROM gopher g
LEFT JOIN lm l ON l.doc_id = g.doc_id
LEFT JOIN dup p ON p.doc_id = g.doc_id
LEFT JOIN qcls q ON q.doc_id = g.doc_id
ORDER BY g.doc_id
"""


def _filter_stack_sql(d: str) -> str:
    return _filter_stack_body(d, _bigram_doc_scores(d))


@query("llm_filter_stack", oracle=_filter_stack_sql("duck"), tags=("llm", "text", "quality"))
def llm_filter_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed pretraining curation gate — the filter stack real
    pipelines run as one job (Gopher rules + LM perplexity filter +
    exact-substring duplication ceiling, the RefinedWeb/FineWeb recipe,
    public): every document gets its three metric values, the three gate
    verdicts, and the final keep decision, so downstream mix sampling
    (``llm_mix_sample``) consumes a single boolean. Composition reuses
    the registered building blocks verbatim (``text_gopher_rules``,
    ``llm_bigram_lm_score``'s scoring core, ``text_dup_span_fraction``)
    as nested subqueries — same 100 TB shapes as the parts: three
    independent map-side-combinable passes over documents joined back on
    doc_id, the natural partition key. Documents too short to emit
    bigrams or spans pass those gates trivially (LEFT JOIN + COALESCE),
    matching production semantics where length is the word-count gate's
    job.

    Spark path (r13): the LM leg's bigram-position table ``pos`` was
    re-planned three times inside the nested ``_bigram_doc_scores``
    subquery (bigram counts, context counts, scoring — each a full
    split+explode tokenize pass), on top of the gopher/dup/qc passes.
    ``pos`` now persists once (the same shared scoring CTEs as
    ``llm_bigram_lm_score``) and the LM leg reads the cache; the dup
    leg's span table likewise re-expanded twice inside its nested
    diamond and now reads one persisted per-(doc, span) count table
    (the ``text_dup_span_fraction`` restructure). Guide §5; tokenize/
    expansion passes 7→4."""
    from .curation_ops import _dup_span_over_groups, _span_group_spark_sql

    views(spark, sf_dir, "documents")
    pos = spark.sql(_pos_flat_spark_sql()).persist()
    pos.createOrReplaceTempView("slsp_fs_pos")
    spans_g = spark.sql(_span_group_spark_sql()).persist()
    spans_g.createOrReplaceTempView("slsp_fs_span_g")
    # the per-doc aggregate below is _bigram_doc_scores' literal DECIMAL
    # division (NOT dec_sum, whose extra DOUBLE cast changes the rounding)
    lm_src = f"""(WITH {_bigram_scored_ctes('slsp_fs_pos')}
  SELECT doc_id, round(SUM(CAST(neg_logp AS DECIMAL(28,12))) / COUNT(*), 6)
           AS avg_neg_logp
  FROM scored GROUP BY doc_id)"""
    dup_src = _dup_span_over_groups("slsp_fs_span_g")
    return spark.sql(_filter_stack_body("spark", lm_src, dup_src))


# ---------------------------------------------------------------------------
# graph_clustering_coefficient — local transitivity per node.
# ---------------------------------------------------------------------------

_CC_TOPN = 50


def _clustering_coeff_sql(
    d: str, pairs_src: str | None = None, or_src: str | None = None
) -> str:
    # Compose the shared pairs/deg/oriented/tri prologue (a real function,
    # not a string-split of the rendered triangle SQL — ADVICE r4) and
    # append the normalized local clustering coefficient
    # 2T(v) / (deg(v)·(deg(v)−1)) as the final SELECT.
    from .graph_ops import _tri_node_rows, _triangle_prologue

    tri_head = _triangle_prologue(d, pairs_src, or_src)
    node_rows = _tri_node_rows(d)
    deg_cte = (
        "SELECT node, CAST(COUNT(*) AS BIGINT) AS dg FROM ("
        "SELECT u AS node FROM pairs UNION ALL SELECT v AS node FROM pairs"
        ") b GROUP BY node"
    )
    return f"""{tri_head.rstrip()},
tcnt AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS n_tri
  FROM ({node_rows}) x GROUP BY node
),
dg2 AS ({deg_cte})
SELECT g.node, g.dg AS degree, COALESCE(t.n_tri, 0) AS n_triangles,
       round(CAST(2 AS DOUBLE) * COALESCE(t.n_tri, 0) / (g.dg * (g.dg - 1)), 6)
         AS clustering_coeff
FROM dg2 g LEFT JOIN tcnt t ON t.node = g.node
WHERE g.dg >= 2
ORDER BY clustering_coeff DESC, g.node
LIMIT {_CC_TOPN}
"""


@query(
    "graph_clustering_coefficient",
    oracle=_clustering_coeff_sql("duck"),
    tags=("graph",),
)
def graph_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient (Watts & Strogatz 1998, public) per
    node of the co-purchase graph: 2·T(v)/(deg(v)·(deg(v)−1)) — the
    transitivity signal community detectors and fraud models read, and
    the normalized companion of ``graph_triangle_count``'s raw counts.
    Triangles come from the same degree-oriented wedge join (found once
    at the lowest-degree corner, O(E^1.5) bound); on the Spark side the
    distinct edge list and oriented table are persisted views shared by
    all three join legs, exactly like the triangle op. The coefficient
    is one fixed double expression over exact counts; top-k is
    TakeOrdered."""
    from pyspark.sql import functions as F

    views(spark, sf_dir, "lineitem")
    pairs = spark.sql(
        f"""SELECT DISTINCT l1.l_partkey AS u, l2.l_partkey AS v
FROM {tbl('lineitem', 'spark')} l1 JOIN {tbl('lineitem', 'spark')} l2
  ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey"""
    ).persist()
    pairs.createOrReplaceTempView("slsp_cc_pairs")
    deg = (
        pairs.selectExpr("u AS node")
        .unionAll(pairs.selectExpr("v AS node"))
        .groupBy("node")
        .agg(F.count("*").alias("dg"))
    )
    deg.createOrReplaceTempView("slsp_cc_deg")
    oriented = spark.sql(
        """SELECT CASE WHEN du.dg < dv.dg OR (du.dg = dv.dg AND p.u < p.v)
              THEN p.u ELSE p.v END AS src,
         CASE WHEN du.dg < dv.dg OR (du.dg = dv.dg AND p.u < p.v)
              THEN p.v ELSE p.u END AS dst,
         CASE WHEN du.dg < dv.dg OR (du.dg = dv.dg AND p.u < p.v)
              THEN dv.dg ELSE du.dg END AS dst_deg
FROM slsp_cc_pairs p
JOIN slsp_cc_deg du ON du.node = p.u
JOIN slsp_cc_deg dv ON dv.node = p.v"""
    ).persist()
    oriented.createOrReplaceTempView("slsp_cc_oriented")
    return spark.sql(
        _clustering_coeff_sql(
            "spark", pairs_src="slsp_cc_pairs", or_src="slsp_cc_oriented"
        )
    )


# ---------------------------------------------------------------------------
# ts_stl_anomaly — anomaly gate on the decomposition remainder.
# ---------------------------------------------------------------------------

_STL_Z = 2.0


def _stl_anomaly_body(d: str, decomp_src: str) -> str:
    return f"""
WITH decomp AS (SELECT * FROM {decomp_src}),
stats AS (
  SELECT event_type,
         {dec_sum('remainder', 6)} / COUNT(*) AS mu,
         sqrt({dec_sum('remainder * remainder', 6)} / COUNT(*)
              - ({dec_sum('remainder', 6)} / COUNT(*))
                * ({dec_sum('remainder', 6)} / COUNT(*))) AS sigma,
         CAST(COUNT(*) AS BIGINT) AS n_obs
  FROM decomp GROUP BY event_type
)
SELECT d.event_type, d.hour, d.value, d.remainder,
       round((d.remainder - s.mu) / s.sigma, 6) AS z,
       s.n_obs
FROM decomp d JOIN stats s ON s.event_type = d.event_type
WHERE abs(d.remainder - s.mu) > {_STL_Z} * s.sigma
ORDER BY d.event_type, d.hour
"""


def _stl_anomaly_sql(d: str) -> str:
    decomp = (
        f"(SELECT event_type, hour, value, trend, seasonal, remainder "
        f"FROM ({_stl_sql(d)}) s)"
    )
    return _stl_anomaly_body(d, decomp)


@query("ts_stl_anomaly", oracle=_stl_anomaly_sql("duck"), tags=("timeseries",))
def ts_stl_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-adjusted anomaly detection — the detector the
    ``ts_stl_decompose`` docstring promises: z-score the decomposition
    REMAINDER (trend and daily seasonality already removed), so a
    morning spike that is merely "every morning" no longer alarms, which
    is precisely what raw-value detectors like ``ts_zscore_anomaly`` get
    wrong on seasonal series. The decomposition nests as a subquery
    (same engine-pair semantics proven by ``llm_filter_stack``);
    per-series moment stats are one map-side-combinable aggregation over
    exact-DECIMAL sums; the gate compares |remainder − μ| against 2σ in
    sigma-space (no division) and the reported z divides once. Output is
    the anomalous rows of the probed slice, totally ordered.

    Spark path (r13): the nested decomposition (two windowed passes) was
    re-planned for both consumers — the moment stats AND the gate join —
    doubling every window exchange (plan: 4 Window ops / 9 exchanges).
    Persist the decomposition once; stats and gate read the cache
    (guide §5; plan: 4→2 Window ops, scans 4→1)."""
    views(spark, sf_dir, "events")
    # localCheckpoint, not persist: the decomposition's plan contains
    # WithCTE, which CacheManager cannot match for substitution (measured:
    # a persist here still re-ran both windowed passes per consumer); the
    # eager checkpoint materializes the hourly-grid-sized frame once
    decomp = spark.sql(
        f"SELECT event_type, hour, value, trend, seasonal, remainder "
        f"FROM ({_stl_sql('spark')}) s"
    ).localCheckpoint(eager=True)
    decomp.createOrReplaceTempView("slsp_stl_decomp")
    return spark.sql(_stl_anomaly_body("spark", "slsp_stl_decomp"))


# ---------------------------------------------------------------------------
# profile_freshness_lag — data-freshness monitor.
# ---------------------------------------------------------------------------

_FRESH_SLO_S = 7_200  # 2 h staleness SLO


def _freshness_sql(d: str) -> str:
    return f"""
WITH horizon AS (
  SELECT MAX(ts) AS tmax FROM {tbl('events', d)}
),
per_series AS (
  SELECT event_type, MAX(ts) AS last_seen,
         CAST(COUNT(*) AS BIGINT) AS n_rows
  FROM {tbl('events', d)} GROUP BY event_type
)
SELECT p.event_type, {ts_str('p.last_seen', d)} AS last_seen,
       p.n_rows,
       {_hazard_epoch('h.tmax', d)} - {_hazard_epoch('p.last_seen', d)}
         AS lag_seconds,
       ({_hazard_epoch('h.tmax', d)} - {_hazard_epoch('p.last_seen', d)})
         > {_FRESH_SLO_S} AS stale
FROM per_series p CROSS JOIN horizon h
ORDER BY p.event_type
"""


@query(
    "profile_freshness_lag", oracle=_freshness_sql("duck"), tags=("quality", "profiling")
)
def profile_freshness_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series data freshness — the first panel of every pipeline
    dashboard: how far each series' latest event lags the table horizon,
    flagged against a staleness SLO. The reference system's queue-age
    alarm (SURVEY §2 A3) is the streaming cousin; this is the batch/lake
    form run over ingested data. One scan, two map-side-combinable MAX
    aggregations, a one-row horizon broadcast — |series| output rows at
    any table size."""
    views(spark, sf_dir, "events")
    return spark.sql(_freshness_sql("spark"))


# ---------------------------------------------------------------------------
# text_langid_eval — classifier quality as a driver-checked query.
# ---------------------------------------------------------------------------


def _langid_eval_sql(d: str) -> str:
    from .llm_ops import _langid_sql

    return f"""
WITH pred AS (
  SELECT actual_lang, predicted_lang FROM ({_langid_sql(d)}) p
),
cells AS (
  SELECT actual_lang, predicted_lang, CAST(COUNT(*) AS BIGINT) AS n
  FROM pred GROUP BY actual_lang, predicted_lang
),
actual_tot AS (
  SELECT actual_lang, CAST(SUM(n) AS BIGINT) AS n_actual
  FROM cells GROUP BY actual_lang
),
pred_tot AS (
  SELECT predicted_lang, CAST(SUM(n) AS BIGINT) AS n_pred
  FROM cells GROUP BY predicted_lang
),
diag AS (
  SELECT actual_lang, n AS n_correct FROM cells
  WHERE actual_lang = predicted_lang
)
SELECT a.actual_lang AS lang, a.n_actual,
       COALESCE(dg.n_correct, 0) AS n_correct,
       round(CAST(COALESCE(dg.n_correct, 0) AS DOUBLE) / a.n_actual, 6)
         AS recall,
       round(CAST(COALESCE(dg.n_correct, 0) AS DOUBLE)
             / COALESCE(p.n_pred, 1), 6) AS precis
FROM actual_tot a
LEFT JOIN diag dg ON dg.actual_lang = a.actual_lang
LEFT JOIN pred_tot p ON p.predicted_lang = a.actual_lang
ORDER BY a.actual_lang
"""


@query("text_langid_eval", oracle=_langid_eval_sql("duck"), tags=("llm", "text", "quality"))
def text_langid_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language precision/recall of the ``text_langid`` classifier
    against the corpus's labeled ``lang`` column — classifier quality as
    a driver-hash-checked query, the same eval-as-first-class-operator
    pattern as ``sim_ann_recall_eval`` (the judge-checked ANN recall
    floors). Keeping the eval in-engine means a marker-profile change
    that silently degrades a language shows up as a failed hash, not a
    drifted dashboard. 100 TB shape: the prediction subquery is the
    zero-shuffle codegen scorer; everything after the first GROUP BY is
    |langs|² contingency cells."""
    views(spark, sf_dir, "documents")
    return spark.sql(_langid_eval_sql("spark"))
