"""Round-5 product-analytics & operations operators: seasonal-naive
forecast backtesting, burst detection, drawdown, DAU/WAU stickiness,
cohort LTV curves, a time-constrained funnel, U-shaped attribution,
concentration (HHI) profiling, degree assortativity and co-purchase lift
over the order graph, snapshot time-travel reads, and the GROUP BY ALL
SQL surface.

House determinism contract throughout: DECIMAL addends for order-
sensitive sums, round(…, 12) on division/libm terms, floor() before
double→BIGINT, windows partitioned on series/user keys, top-k as
TakeOrdered.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .dialect import dec_sum, epoch_s, inline_values, intdiv, tbl, views
from .registry import query

# ---------------------------------------------------------------------------
# shared: dense hourly count spine over events.
# ---------------------------------------------------------------------------


def _dense_hourly(d: str) -> str:
    """dense(event_type, h BIGINT, y BIGINT) — gap-free hourly event counts
    per type (missing hours materialize as 0 so lag/rolling windows align).
    The hour spine generates from the global [min, max] hour index and
    cross-joins the 5-row type dimension — broadcast-sized at any SF."""
    gen = (
        "SELECT explode(sequence(lo, hi)) AS h FROM bounds"
        if d == "spark"
        else "SELECT unnest(range(lo, hi + 1)) AS h FROM bounds"
    )
    return f"""
cnt AS (
  SELECT event_type, {intdiv(epoch_s('ts', d), '3600', d)} AS h,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM {tbl('events', d)} GROUP BY event_type, {intdiv(epoch_s('ts', d), '3600', d)}
),
bounds AS (SELECT MIN(h) AS lo, MAX(h) AS hi FROM cnt),
hseq AS ({gen}),
ets AS (SELECT DISTINCT event_type FROM {tbl('events', d)}),
dense AS (
  SELECT s.event_type, s.h, COALESCE(c.y, CAST(0 AS BIGINT)) AS y
  FROM (SELECT et.event_type, g.h FROM ets et CROSS JOIN hseq g) s
  LEFT JOIN cnt c ON c.event_type = s.event_type AND c.h = s.h
)"""


# ---------------------------------------------------------------------------
# ts_seasonal_naive_eval — backtest of the 24h seasonal-naive forecast.
# ---------------------------------------------------------------------------


def _snaive_sql(d: str) -> str:
    smape_term = (
        "CASE WHEN y + yhat > 0 THEN "
        "round(CAST(2 AS DOUBLE) * abs(y - yhat) / (y + yhat), 12) "
        "ELSE CAST(0 AS DOUBLE) END"
    )
    return f"""
WITH {_dense_hourly(d).lstrip()},
pred AS (
  SELECT event_type, h, y,
         LAG(y, 24) OVER (PARTITION BY event_type ORDER BY h) AS yhat
  FROM dense
),
ev AS (SELECT * FROM pred WHERE yhat IS NOT NULL)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_eval,
       round(CAST(SUM(abs(y - yhat)) AS DOUBLE) / COUNT(*), 12) AS mae,
       round(CAST(SUM(CAST({smape_term} AS DECIMAL(28,12))) AS DOUBLE)
             / COUNT(*), 12) AS smape
FROM ev
GROUP BY event_type
ORDER BY event_type
"""


@query(
    "ts_seasonal_naive_eval",
    oracle=_snaive_sql("duck"),
    tags=("timeseries", "evaluation"),
)
def ts_seasonal_naive_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backtest of the seasonal-naive forecaster ŷ(t) = y(t − 24h) per
    event-type series — the baseline every capacity model must beat
    (Hyndman & Athanasopoulos, "Forecasting", public), reported as MAE
    and sMAPE. The hourly counts densify against a generated hour spine
    (missing hours = 0, so the 24-lag never misaligns across gaps); the
    LAG window partitions on the series key; |error| sums are exact
    integers and the sMAPE terms round to 12 before their DECIMAL mean.
    At 100 TB the spine is |hours|×|types| (broadcast-sized) and the one
    real shuffle keys on (event_type, hour)."""
    views(spark, sf_dir, "events")
    return spark.sql(_snaive_sql("spark"))


# ---------------------------------------------------------------------------
# ts_burst_ratio — hour-over-trailing-baseline burst score.
# ---------------------------------------------------------------------------

_BURST_TOP = 20


def _burst_sql(d: str) -> str:
    return f"""
WITH {_dense_hourly(d).lstrip()},
w AS (
  SELECT event_type, h, y,
         SUM(y) OVER (PARTITION BY event_type ORDER BY h
             ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING) AS base_sum,
         COUNT(*) OVER (PARTITION BY event_type ORDER BY h
             ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING) AS base_n
  FROM dense
)
SELECT event_type, h, y,
       CAST(base_sum AS BIGINT) AS base_sum,
       round((CAST(y AS DOUBLE) + 1)
             / (CAST(base_sum AS DOUBLE) / base_n + 1), 12) AS burst_ratio
FROM w
WHERE base_n = 24
ORDER BY burst_ratio DESC, event_type, h
LIMIT {_BURST_TOP}
"""


@query("ts_burst_ratio", oracle=_burst_sql("duck"), tags=("timeseries", "anomaly"))
def ts_burst_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burst detection by hour-over-baseline ratio: each hour's count vs
    the trailing 24-hour mean (add-one smoothed so quiet series don't
    divide by zero), top-20 bursts — the load-spike tripwire next to the
    z-score and CUSUM gates, robust to level shifts because the baseline
    trails the series itself. Dense spine + series-partitioned rolling
    window (exact integer window sums; one double division rounded to
    12); the global top-k is a TakeOrdered heap."""
    views(spark, sf_dir, "events")
    return spark.sql(_burst_sql("spark"))


# ---------------------------------------------------------------------------
# ts_drawdown — maximum drawdown of the cumulative value series.
# ---------------------------------------------------------------------------


def _drawdown_sql(d: str) -> str:
    return f"""
WITH pv AS (
  SELECT event_type, ts, event_id, CAST(value AS DECIMAL(28,6)) AS v
  FROM {tbl('events', d)}
),
cum AS (
  SELECT event_type, ts, event_id,
         SUM(v) OVER (PARTITION BY event_type ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
  FROM pv
),
dd AS (
  SELECT event_type, c,
         MAX(c) OVER (PARTITION BY event_type ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
  FROM cum
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_points,
       CAST(MAX(peak - c) AS DOUBLE) AS max_drawdown,
       CAST(MAX(peak) AS DOUBLE) AS peak_value
FROM dd
GROUP BY event_type
ORDER BY event_type
"""


@query("ts_drawdown", oracle=_drawdown_sql("duck"), tags=("timeseries",))
def ts_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown of each series' running cumulative value — the
    peak-to-trough loss metric (standard in quantitative finance,
    public; operationally: the deepest backlog/budget dip). The
    cumulative sum and its running maximum are stacked windows SHARING
    one (event_type)-partitioned exchange, accumulated in exact DECIMAL
    so partial order can't shift bits; max(peak − cum) then reduces per
    series. Deterministic ordering ties break on event_id."""
    views(spark, sf_dir, "events")
    return spark.sql(_drawdown_sql("spark"))


# ---------------------------------------------------------------------------
# cohort_dau_mau — weekly stickiness (avg daily actives / weekly actives).
# ---------------------------------------------------------------------------


def _stickiness_sql(d: str) -> str:
    day = intdiv(epoch_s("ts", d), "86400", d)
    return f"""
WITH ud AS (
  SELECT DISTINCT user_id, {day} AS dday FROM {tbl('events', d)}
),
daily AS (
  SELECT dday, CAST(COUNT(*) AS BIGINT) AS dau FROM ud GROUP BY dday
),
weekly AS (
  SELECT {intdiv('dday', '7', d)} AS wk,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
  FROM ud GROUP BY {intdiv('dday', '7', d)}
),
davg AS (
  SELECT {intdiv('dday', '7', d)} AS wk,
         CAST(SUM(dau) AS BIGINT) AS dau_sum,
         CAST(COUNT(*) AS BIGINT) AS n_days
  FROM daily GROUP BY {intdiv('dday', '7', d)}
)
SELECT w.wk, d2.n_days, d2.dau_sum, w.wau,
       round(CAST(d2.dau_sum AS DOUBLE) / d2.n_days, 12) AS avg_dau,
       round(CAST(d2.dau_sum AS DOUBLE) / (d2.n_days * w.wau), 12)
         AS stickiness
FROM weekly w JOIN davg d2 ON d2.wk = w.wk
ORDER BY w.wk
"""


@query("cohort_dau_mau", oracle=_stickiness_sql("duck"), tags=("analytics",))
def cohort_dau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly stickiness — average daily active users over weekly active
    users (the DAU/MAU engagement ratio at weekly grain, standard
    product analytics): how much of the week's audience shows up on a
    typical day. Built from ONE (user, day) distinct pass; daily and
    weekly actives are both exact grouped counts keyed on day/week
    buckets (absolute epoch bins, so no ISO-week dialect divergence),
    and the two ratios are single double divisions rounded to 12."""
    views(spark, sf_dir, "events")
    return spark.sql(_stickiness_sql("spark"))


# ---------------------------------------------------------------------------
# cohort_ltv_curve — cumulative revenue per user by cohort age.
# ---------------------------------------------------------------------------


def _ltv_sql(d: str) -> str:
    day = intdiv(epoch_s("ts", d), "86400", d)
    return f"""
WITH first_day AS (
  SELECT user_id, MIN({day}) AS d0 FROM {tbl('events', d)} GROUP BY user_id
),
cohort_size AS (
  SELECT d0 AS cohort_day, CAST(COUNT(*) AS BIGINT) AS n_users
  FROM first_day GROUP BY d0
),
rev AS (
  SELECT f.d0 AS cohort_day, {day} - f.d0 AS age_day,
         SUM(CAST(e.value AS DECIMAL(28,6))) AS rev
  FROM {tbl('events', d)} e
  JOIN first_day f ON f.user_id = e.user_id
  WHERE e.event_type = 'purchase'
  GROUP BY f.d0, {day} - f.d0
),
cum AS (
  SELECT cohort_day, age_day,
         SUM(rev) OVER (PARTITION BY cohort_day ORDER BY age_day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_rev
  FROM rev
)
SELECT c.cohort_day, c.age_day,
       s.n_users,
       round(CAST(c.cum_rev AS DOUBLE) / s.n_users, 12) AS cum_rev_per_user
FROM cum c JOIN cohort_size s ON s.cohort_day = c.cohort_day
ORDER BY c.cohort_day, c.age_day
"""


@query("cohort_ltv_curve", oracle=_ltv_sql("duck"), tags=("analytics",))
def cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV curves: cumulative purchase revenue per user by cohort
    age in days, cohorted on each user's first-seen day (day-of-month
    grain — the corpus's signups skew to week 1, so day cohorts stay
    informative). Revenue partials aggregate in exact DECIMAL keyed on
    (cohort, age); the cumulative window partitions on cohort_day; the
    per-user normalization divides once in DOUBLE. The revenue sibling
    of ``cohort_cumulative_hazard`` — same cohort spine, money instead
    of hazard."""
    views(spark, sf_dir, "events")
    return spark.sql(_ltv_sql("spark"))


# ---------------------------------------------------------------------------
# funnel_window_constrained — view → click(≤1h) → purchase(≤24h).
# ---------------------------------------------------------------------------


def _funnel_win_sql(d: str) -> str:
    es = epoch_s("ts", d)
    return f"""
WITH v AS (
  SELECT user_id, {es} AS vs FROM {tbl('events', d)} WHERE event_type = 'view'
),
c AS (
  SELECT user_id, {es} AS cs FROM {tbl('events', d)} WHERE event_type = 'click'
),
p AS (
  SELECT user_id, {es} AS ps FROM {tbl('events', d)} WHERE event_type = 'purchase'
),
vc AS (
  SELECT DISTINCT v.user_id, v.vs, c.cs
  FROM v JOIN c ON c.user_id = v.user_id
   AND c.cs > v.vs AND c.cs <= v.vs + 3600
),
vcp AS (
  SELECT DISTINCT vc.user_id
  FROM vc JOIN p ON p.user_id = vc.user_id
   AND p.ps > vc.cs AND p.ps <= vc.cs + 86400
),
counts AS (
  SELECT (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM v) AS s1,
         (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM vc) AS s2,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM vcp) AS s3
)
SELECT stage, n_users,
       round(CAST(n_users AS DOUBLE) / NULLIF(prev_n, 0), 12) AS conv_from_prev
FROM (
  SELECT '1_view' AS stage, s1 AS n_users, s1 AS prev_n FROM counts
  UNION ALL
  SELECT '2_click_within_1h', s2, s1 FROM counts
  UNION ALL
  SELECT '3_purchase_within_24h', s3, s2 FROM counts
) f
ORDER BY stage
"""


@query(
    "funnel_window_constrained",
    oracle=_funnel_win_sql("duck"),
    tags=("analytics", "funnel"),
)
def funnel_window_constrained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly time-constrained funnel (the Amplitude/Mixpanel semantics
    ``funnel_conversion`` relaxes): view → click within 1 hour → purchase
    within 24 hours of that click, counted per user. Each hop is an
    equi-join on user_id with the window predicate evaluated INSIDE the
    matched key group — per-user fan-out, never a global inequality
    join — and stage sets collapse through DISTINCT before the next hop
    so fan-out can't compound. Conversion ratios divide once per stage."""
    views(spark, sf_dir, "events")
    return spark.sql(_funnel_win_sql("spark"))


# ---------------------------------------------------------------------------
# attribution_u_shaped — position-based 40/20/40 credit.
# ---------------------------------------------------------------------------

_ATTR_LOOKBACK_S = 259_200  # 3 days, aligned with the other attribution ops


def _u_shaped_sql(d: str) -> str:
    es = epoch_s("ts", d)
    return f"""
WITH clicks AS (
  SELECT user_id, event_id AS click_id, {es} AS cs
  FROM {tbl('events', d)} WHERE event_type = 'click'
),
purch AS (
  SELECT user_id, event_id AS purchase_id, value, {es} AS ps
  FROM {tbl('events', d)} WHERE event_type = 'purchase'
),
pairs AS (
  SELECT p.user_id, p.purchase_id, p.value, c.click_id, c.cs,
         ROW_NUMBER() OVER (
           PARTITION BY p.user_id, p.purchase_id
           ORDER BY c.cs, c.click_id
         ) AS rn,
         COUNT(*) OVER (
           PARTITION BY p.user_id, p.purchase_id
         ) AS n
  FROM purch p JOIN clicks c
    ON c.user_id = p.user_id
   AND c.cs <= p.ps AND c.cs > p.ps - {_ATTR_LOOKBACK_S}
),
credited AS (
  SELECT user_id, purchase_id, value,
         CASE WHEN n = 1 THEN CAST(1 AS DOUBLE)
              WHEN n = 2 THEN CAST(0.5 AS DOUBLE)
              WHEN rn = 1 OR rn = n THEN CAST(0.4 AS DOUBLE)
              ELSE round(CAST(0.2 AS DOUBLE) / (n - 2), 12) END AS w
  FROM pairs
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_touches,
       {dec_sum('round(w * value, 12)', 12)} AS credited_value
FROM credited
GROUP BY user_id
ORDER BY credited_value DESC, user_id
LIMIT 50
"""


@query(
    "attribution_u_shaped",
    oracle=_u_shaped_sql("duck"),
    tags=("analytics",),
)
def attribution_u_shaped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based (U-shaped) multi-touch attribution: first and last
    click in the 3-day lookback each earn 40% of the purchase value, the
    middle touches split the remaining 20% — the standard position-based
    model beside last-touch / linear / time-decay (all four now
    first-class). Positions come from windows partitioned on the
    (user, purchase) pair — bounded by per-user activity — and the
    single-touch / two-touch edge cases get their exact dyadic weights
    (1.0, 0.5); only the middle split divides, rounded to 12 before the
    DECIMAL rollup. Top-50 is TakeOrdered."""
    views(spark, sf_dir, "events")
    return spark.sql(_u_shaped_sql("spark"))


# ---------------------------------------------------------------------------
# profile_hhi_concentration — Herfindahl–Hirschman concentration index.
# ---------------------------------------------------------------------------


def _hhi_one(table: str, col: str, label: str, d: str) -> str:
    return f"""
SELECT '{label}' AS dimension,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(SUM(gn) AS BIGINT) AS n_rows,
       round(CAST(SUM(CAST(gn * gn AS DECIMAL(38,0))) AS DOUBLE)
             / (CAST(SUM(gn) AS DOUBLE) * CAST(SUM(gn) AS DOUBLE)), 12)
         AS hhi
FROM (SELECT CAST(COUNT(*) AS BIGINT) AS gn
      FROM {tbl(table, d)} GROUP BY {col}) g"""


def _hhi_sql(d: str) -> str:
    return f"""
WITH both_dims AS (
  {_hhi_one('documents', 'source', 'documents.source', d)}
  UNION ALL
  {_hhi_one('customer', 'c_mktsegment', 'customer.c_mktsegment', d)}
)
SELECT dimension, n_groups, n_rows, hhi,
       round(CAST(1 AS DOUBLE) / hhi, 6) AS effective_n
FROM both_dims
ORDER BY dimension
"""


@query(
    "profile_hhi_concentration",
    oracle=_hhi_sql("duck"),
    tags=("profiling",),
)
def profile_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman concentration of categorical dimensions
    (Herfindahl 1950, public; in data curation: how dominated a corpus
    is by its largest sources — the rebalancing trigger for
    ``data_domain_quota``). HHI = Σ share² computed from exact integer
    group counts (squares accumulate in DECIMAL(38,0), so the sum is
    order-independent and overflow-free at any row count), one double
    division at the end; 1/HHI is the effective number of equal-size
    sources. One grouped count per audited dimension — profiling cost,
    not data cost."""
    views(spark, sf_dir, "documents", "customer")
    return spark.sql(_hhi_sql("spark"))


# ---------------------------------------------------------------------------
# graph_degree_assortativity — degree–degree Pearson over edges.
# ---------------------------------------------------------------------------


def _assort_sql(d: str) -> str:
    li = tbl("lineitem", d)
    return f"""
WITH pairs AS (
  SELECT DISTINCT l1.l_partkey AS u, l2.l_partkey AS v
  FROM {li} l1 JOIN {li} l2
    ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
),
deg AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS dg FROM (
    SELECT u AS node FROM pairs UNION ALL SELECT v AS node FROM pairs
  ) b GROUP BY node
),
ends AS (
  SELECT a, b FROM (
    SELECT u AS a, v AS b FROM pairs
    UNION ALL
    SELECT v AS a, u AS b FROM pairs
  ) e
),
xy AS (
  SELECT da.dg AS x, db.dg AS y
  FROM ends e
  JOIN deg da ON da.node = e.a
  JOIN deg db ON db.node = e.b
),
sums AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(x * y AS DECIMAL(38,0))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(x * x AS DECIMAL(38,0))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(y * y AS DECIMAL(38,0))) AS DOUBLE) AS syy
  FROM xy
)
SELECT n AS n_directed_edges,
       round((n * sxy - sx * sy)
             / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 12)
         AS assortativity
FROM sums
"""


@query(
    "graph_degree_assortativity",
    oracle=_assort_sql("duck"),
    tags=("graph",),
)
def graph_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the co-purchase graph (Newman 2002,
    public): the Pearson correlation of endpoint degrees over the
    symmetrized edge list — positive means hubs link to hubs
    (assortative mixing), negative means hub-and-spoke. Edges and
    degrees come from the same distinct self-join machinery as the
    triangle family; the correlation reduces to six exact sums (integer
    products through DECIMAL(38,0), so 1000-executor partial order
    cannot shift a bit) combined in one fixed double formula. Output is
    one row; the reduction is fully map-side combinable."""
    views(spark, sf_dir, "lineitem")
    return spark.sql(_assort_sql("spark"))


# ---------------------------------------------------------------------------
# graph_copurchase_lift — market-basket association (lift) mining.
# ---------------------------------------------------------------------------

_LIFT_MIN_SUPPORT = 3
_LIFT_TOP = 20


def _lift_body(d: str, op_src: str) -> str:
    return f"""
WITH op AS (SELECT * FROM {op_src}),
n_orders AS (
  SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n FROM op
),
ic AS (
  SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_item
  FROM op GROUP BY l_partkey
),
pc AS (
  SELECT a.l_partkey AS u, b.l_partkey AS v,
         CAST(COUNT(*) AS BIGINT) AS n_pair
  FROM op a JOIN op b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey
  HAVING COUNT(*) >= {_LIFT_MIN_SUPPORT}
)
SELECT pc.u, pc.v, pc.n_pair, iu.n_item AS n_u, iv.n_item AS n_v,
       round(CAST(pc.n_pair AS DOUBLE) * t.n
             / (CAST(iu.n_item AS DOUBLE) * iv.n_item), 12) AS lift
FROM pc
JOIN ic iu ON iu.l_partkey = pc.u
JOIN ic iv ON iv.l_partkey = pc.v
CROSS JOIN n_orders t
ORDER BY lift DESC, pc.u, pc.v
LIMIT {_LIFT_TOP}
"""


def _lift_sql(d: str) -> str:
    li = tbl("lineitem", d)
    return _lift_body(
        d, f"(SELECT DISTINCT l_orderkey, l_partkey FROM {li})"
    )


@query(
    "graph_copurchase_lift",
    oracle=_lift_sql("duck"),
    tags=("graph", "analytics"),
)
def graph_copurchase_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket lift mining (Agrawal & Srikant 1994 association
    rules, public): for part pairs bought together in ≥3 orders, lift =
    P(u,v) / (P(u)·P(v)) — >1 means genuinely associated, not just both
    popular. Candidate pairs enumerate WITHIN order groups (the same
    bounded wedge discipline as the graph family: cost ∝ Σ per-order
    C(items,2), never |parts|²), counts key on the pair, the one-row
    order-total broadcasts, and the top-20 is TakeOrdered.

    Spark path (r13): the distinct basket table ``op`` was re-planned
    for all FOUR consumers (order total, item counts, both legs of the
    pair self-join — 5 lineitem scans / 9 exchanges); persist it once
    and run the oracle-shared scoring over the cached view (guide §5;
    plan: 5→1 scans)."""
    views(spark, sf_dir, "lineitem")
    op = spark.sql(
        f"SELECT DISTINCT l_orderkey, l_partkey FROM {tbl('lineitem', 'spark')}"
    ).persist()
    op.createOrReplaceTempView("slsp_lift_op")
    return spark.sql(_lift_body("spark", "slsp_lift_op"))


# ---------------------------------------------------------------------------
# lake_time_travel_read — snapshot-visibility reconstruction.
# ---------------------------------------------------------------------------

_TT_RETENTION = 52  # snapshots a file stays live after being added
_TT_SNAPSHOTS = "(60), (120), (180), (240), (300)"


def _time_travel_sql(d: str) -> str:
    wk = intdiv(epoch_s("o_orderdate", d), "604800", d)
    return f"""
WITH files AS (
  SELECT {wk} AS wk,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         {dec_sum('o_totalprice', 2)} AS file_value
  FROM {tbl('orders', d)} GROUP BY {wk}
),
origin AS (SELECT MIN(wk) AS wk0 FROM files),
manifest AS (
  SELECT f.wk - o.wk0 AS add_snap,
         f.wk - o.wk0 + {_TT_RETENTION} AS remove_snap,
         f.n_rows, f.file_value
  FROM files f CROSS JOIN origin o
),
snaps AS ({inline_values(_TT_SNAPSHOTS, 's', 'snap', d)})
SELECT s.snap,
       CAST(COUNT(*) AS BIGINT) AS n_live_files,
       CAST(SUM(m.n_rows) AS BIGINT) AS n_rows_visible,
       CAST(SUM(CAST(m.file_value AS DECIMAL(28,2))) AS DOUBLE)
         AS total_value_visible
FROM snaps s JOIN manifest m
  ON m.add_snap <= s.snap AND s.snap < m.remove_snap
GROUP BY s.snap
ORDER BY s.snap
"""


@query(
    "lake_time_travel_read",
    oracle=_time_travel_sql("duck"),
    tags=("lakehouse",),
)
def lake_time_travel_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot time travel as manifest algebra (the Iceberg/Delta
    ``VERSION AS OF`` read path, public): reconstruct which files are
    visible at snapshot S — added at or before S, not yet expired by the
    52-snapshot retention — and report each snapshot's row count and
    total value. The manifest derives from the weekly file layout (one
    file per order-week, the Firehose one-object-per-partition/hour
    shape at weekly grain), so both engines build it identically; the
    snapshot probe is a 5-row broadcast joined under the visibility
    range predicate. The planner sibling of ``lake_vacuum_plan``
    (which decides what to DELETE; this decides what a reader SEES)."""
    views(spark, sf_dir, "orders")
    return spark.sql(_time_travel_sql("spark"))


# ---------------------------------------------------------------------------
# sql_groupby_all — GROUP BY ALL / ORDER BY ALL surface.
# ---------------------------------------------------------------------------


def _groupby_all_sql(d: str) -> str:
    return f"""
SELECT l_returnflag, l_linestatus,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       {dec_sum('l_quantity', 2)} AS sum_qty,
       {dec_sum('l_extendedprice', 2)} AS sum_price
FROM {tbl('lineitem', d)}
GROUP BY ALL
ORDER BY ALL
"""


@query("sql_groupby_all", oracle=_groupby_all_sql("duck"), tags=("sql",))
def sql_groupby_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The GROUP BY ALL / ORDER BY ALL modern-SQL surface (Spark 3.4+/4.0
    and DuckDB both implement it): non-aggregated select-list columns
    become the grouping key implicitly, and ORDER BY ALL pins a total
    deterministic order. Same physical plan as the explicit form — a
    map-side-combinable hash aggregate over exact DECIMAL addends —
    registered so the dialect surface itself is driver-verified."""
    views(spark, sf_dir, "lineitem")
    return spark.sql(_groupby_all_sql("spark"))
