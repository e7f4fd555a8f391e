"""Time-series / interval operators the reference's event pipeline implies
but never generalizes (SURVEY §2.3: the reference has only RPC lookup joins;
§2.6 T6 extensions): as-of join, interval range join, quantile monitoring.

Spark-first designs:
- as-of join = union + partitioned window scan (one shuffle on the join key,
  no range explosion) — the standard distributed formulation.
- range join = broadcast nested-loop against the tiny interval side.
- quantiles = exact interpolated percentiles per group (same interpolation
  formula as the DuckDB oracle's quantile_cont).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .dialect import tbl, ts_str, views
from .registry import query


def _asof_sql(d: str) -> str:
    # Oracle uses DuckDB's native ASOF JOIN (inclusive t_left >= t_right);
    # right side pre-aggregated to one row per (user_id, ts) so the match is
    # unambiguous under timestamp ties.
    right_agg = (
        "SELECT user_id, ts, max_by(value, event_id) AS p_value"
        if d == "spark"
        else "SELECT user_id, ts, arg_max(value, event_id) AS p_value"
    )
    if d == "duck":
        return f"""
WITH clicks AS (
  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click'
),
purchases AS (
  {right_agg} FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
)
SELECT c.event_id, c.user_id, {ts_str('c.ts', d)} AS click_ts,
       c.value AS click_value, p.p_value AS last_purchase_value,
       CAST(date_diff('second', p.ts, c.ts) AS BIGINT) AS lag_sec
FROM clicks c
ASOF JOIN purchases p ON c.user_id = p.user_id AND c.ts >= p.ts
"""
    raise ValueError("spark side is DataFrame-native")


@query("ts_asof_join", oracle=_asof_sql("duck"), tags=("timeseries", "join"))
def ts_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each click joins the most recent purchase (ts <=
    click.ts) of the same user. Distributed formulation: tag and union both
    sides, one hash shuffle on user_id, then a running last_value(ignore
    nulls) ordered by (ts, side) — right rows sort before left rows at equal
    ts, giving inclusive as-of semantics. No per-row range scan, no
    broadcast requirement: scales to arbitrarily large both sides."""
    ev = views(spark, sf_dir, "events")["events"]
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.expr("max_by(value, event_id)").alias("p_value"))
    )
    tagged = clicks.select(
        "user_id",
        "ts",
        F.lit(1).alias("is_left"),
        "event_id",
        "value",
        F.lit(None).cast("double").alias("p_value"),
        F.lit(None).cast("timestamp").alias("p_ts"),
    ).unionByName(
        purchases.select(
            "user_id",
            "ts",
            F.lit(0).alias("is_left"),
            F.lit(None).cast("long").alias("event_id"),
            F.lit(None).cast("double").alias("value"),
            "p_value",
            F.col("ts").alias("p_ts"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_left")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = tagged.withColumn(
        "last_p_value", F.last("p_value", ignorenulls=True).over(w)
    ).withColumn("last_p_ts", F.last("p_ts", ignorenulls=True).over(w))
    return (
        joined.filter((F.col("is_left") == 1) & F.col("last_p_value").isNotNull())
        .select(
            "event_id",
            "user_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
            F.col("value").alias("click_value"),
            F.col("last_p_value").alias("last_purchase_value"),
            (F.unix_timestamp("ts") - F.unix_timestamp("last_p_ts"))
            .cast("bigint")
            .alias("lag_sec"),
        )
    )


_BANDS = [
    (0, 0.0, 50_000.0),
    (1, 50_000.0, 150_000.0),
    (2, 150_000.0, 300_000.0),
    (3, 300_000.0, 450_000.0),
    (4, 450_000.0, 1_000_000.0),
]


def _band_values(d: str) -> str:
    rows = ", ".join(f"({i}, {lo}, {hi})" for i, lo, hi in _BANDS)
    return f"(VALUES {rows}) AS b(band_id, lo, hi)"


def _range_band_sql(d: str) -> str:
    return f"""
SELECT b.band_id, CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS total
FROM {tbl('orders', d)} o
JOIN {_band_values(d)} ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
GROUP BY b.band_id
"""


@query("ts_range_band_join", oracle=_range_band_sql("duck"), tags=("timeseries", "join"))
def ts_range_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval (range) join: orders against a tiny static band table on a
    lo <= x < hi predicate. Physically a broadcast nested-loop join — the
    correct plan when one side is a handful of intervals; the fact table
    never shuffles."""
    orders = views(spark, sf_dir, "orders")["orders"]
    bands = spark.createDataFrame(_BANDS, ["band_id", "lo", "hi"])
    j = orders.join(
        F.broadcast(bands),
        (orders.o_totalprice >= bands.lo) & (orders.o_totalprice < bands.hi),
    )
    return (
        j.groupBy("band_id")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(28,6)"))
            .cast("double")
            .alias("total"),
        )
    )


_PCT_ORACLE = """
SELECT event_type,
       round(quantile_cont(value, 0.5), 6) AS p50,
       round(quantile_cont(value, 0.95), 6) AS p95,
       round(quantile_cont(value, 0.99), 6) AS p99,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events
GROUP BY event_type
"""


@query("ts_percentile_monitor", oracle=_PCT_ORACLE, tags=("timeseries", "agg"))
def ts_percentile_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLO quantiles per metric stream (A3 generalized): exact interpolated
    p50/p95/p99 of event values. Spark's `percentile` and DuckDB's
    `quantile_cont` share the (n-1)*q linear-interpolation definition. At
    ingest scale the same query swaps to `approx_percentile` (t-digest,
    single-pass mergeable sketch) with identical shape."""
    views(spark, sf_dir, "events")
    return spark.sql(
        f"""
SELECT event_type,
       round(pct[0], 6) AS p50, round(pct[1], 6) AS p95, round(pct[2], 6) AS p99, n
FROM (
  SELECT event_type,
         percentile(value, array(0.5D, 0.95D, 0.99D)) AS pct,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM {tbl('events', 'spark')}
  GROUP BY event_type
)
"""
    )


def _ohlc_sql(d: str) -> str:
    # composite BIGINT tick-order key: second epoch * 1e8 + event_id
    # (unique, sortable, same arithmetic both engines; floor() before the
    # DuckDB cast — epoch() is DOUBLE and CAST rounds there, while Spark's
    # unix_timestamp truncates, which would shift keys for ticks with
    # fractional seconds >= .5)
    key = (
        "CAST(unix_timestamp(ts) AS BIGINT) * 100000000 + event_id"
        if d == "spark"
        else "CAST(floor(epoch(ts)) AS BIGINT) * 100000000 + event_id"
    )
    o = f"min_by(value, {key})" if d == "spark" else f"arg_min(value, {key})"
    c = f"max_by(value, {key})" if d == "spark" else f"arg_max(value, {key})"
    return f"""
SELECT event_type, {ts_str("date_trunc('hour', ts)", d)} AS bar_hour,
       {o} AS open, MAX(value) AS high, MIN(value) AS low, {c} AS close,
       CAST(COUNT(*) AS BIGINT) AS n_ticks
FROM {tbl('events', d)}
GROUP BY event_type, date_trunc('hour', ts)
"""


@query("ts_ohlc_bars", oracle=_ohlc_sql("duck"), tags=("timeseries", "agg"))
def ts_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC bar aggregation: open/close via min_by/max_by on the (ts,
    event_id) order key — single hash aggregate, no window sort; the
    hypertable-rollup shape for tick data."""
    views(spark, sf_dir, "events")
    return spark.sql(_ohlc_sql("spark"))


def _gap_fill_sql(d: str) -> str:
    # hourly spine per event_type over the observed range, forward-filled
    last_ignore_nulls = (
        "last(v, true)" if d == "spark" else "last_value(v IGNORE NULLS)"
    )
    if d == "spark":
        spine = """
  SELECT event_type, explode(sequence(h0, h1, INTERVAL 1 HOUR)) AS h
  FROM bounds"""
    else:
        spine = """
  SELECT event_type, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
  FROM bounds"""
    return f"""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS h,
         CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS v
  FROM {tbl('events', d)}
  WHERE event_type IN ('click', 'purchase')
  GROUP BY event_type, date_trunc('hour', ts)
),
bounds AS (
  SELECT event_type, MIN(h) AS h0, MAX(h) AS h1 FROM hourly GROUP BY event_type
),
spine AS ({spine}),
joined AS (
  SELECT s.event_type, s.h, hr.v,
         CASE WHEN hr.v IS NULL THEN 1 ELSE 0 END AS was_gap
  FROM spine s LEFT JOIN hourly hr
    ON hr.event_type = s.event_type AND hr.h = s.h
)
SELECT event_type, {ts_str('h', d)} AS hour,
       {last_ignore_nulls} OVER (
         PARTITION BY event_type ORDER BY h
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS v_filled,
       CAST(was_gap AS BIGINT) AS was_gap
FROM joined
"""


@query("ts_gap_fill", oracle=_gap_fill_sql("duck"), tags=("timeseries", "window"))
def ts_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling: a generated hourly spine per series
    (sequence/explode — no driver loop) left-joined to observations, gaps
    forward-filled with a running last-non-null window. One shuffle for the
    join, one sort per series partition."""
    views(spark, sf_dir, "events")
    return spark.sql(_gap_fill_sql("spark"))


# ---------------------------------------------------------------------------
# Large-x-large interval overlap join via bin bucketing.
# ---------------------------------------------------------------------------

_BIN_W = 3600  # seconds per bin; interval durations are capped at 2h -> <=3 bins


def _iv_epoch(d: str) -> str:
    # floor() on the DuckDB side: epoch(ts) is a DOUBLE with fractional
    # seconds and CAST(double AS BIGINT) ROUNDS in DuckDB, while Spark's
    # unix_timestamp truncates to whole seconds
    if d == "spark":
        return "CAST(unix_timestamp(ts) AS BIGINT)"
    return "CAST(floor(epoch(ts)) AS BIGINT)"


def _iv_side(d: str, etype: str) -> str:
    # duration = floor(value * 37) % 7200 seconds: floor() before the BIGINT
    # cast because Spark CAST(double) truncates while DuckDB rounds
    return f"""
  SELECT user_id, event_id, {_iv_epoch(d)} AS s,
         {_iv_epoch(d)} + (CAST(floor(value * 37) AS BIGINT) % 7200) AS e
  FROM {tbl('events', d)} WHERE event_type = '{etype}'
"""


def _interval_overlap_oracle(d: str) -> str:
    """The oracle is the NAIVE inequality join — the binned Spark plan must
    produce identical semantics."""
    return f"""
WITH c AS ({_iv_side(d, 'click')}), p AS ({_iv_side(d, 'purchase')})
SELECT c.user_id, CAST(COUNT(*) AS BIGINT) AS n_overlaps,
       CAST(SUM(LEAST(c.e, p.e) - GREATEST(c.s, p.s)) AS BIGINT) AS overlap_sec
FROM c JOIN p ON c.user_id = p.user_id AND c.s <= p.e AND p.s <= c.e
GROUP BY c.user_id
"""


@query(
    "ts_interval_overlap_join",
    oracle=_interval_overlap_oracle("duck"),
    tags=("timeseries", "join", "scale"),
)
def ts_interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval overlap join where BOTH sides are large (neither
    broadcastable): click activity windows x purchase activity windows per
    user. Each interval is replicated to the fixed-width time bins it
    covers (<=3 bins at the 2 h duration cap), the join is a pure equi-join
    on (user_id, bin), and a pair is credited only in the bin containing
    its overlap start — the standard dedup trick that avoids a DISTINCT
    shuffle over the pair universe. The oracle runs the naive inequality
    join, proving the binned plan's semantics; the band-join sibling
    (ts_range_band_join) remains the right plan when one side is tiny."""
    views(spark, sf_dir, "events")
    bins = (
        "LATERAL VIEW explode(sequence(s DIV {w}, e DIV {w})) t AS bin"
    ).format(w=_BIN_W)
    return spark.sql(
        f"""
WITH c AS ({_iv_side('spark', 'click')}), p AS ({_iv_side('spark', 'purchase')}),
cb AS (SELECT user_id, s, e, bin FROM c {bins}),
pb AS (SELECT user_id, s, e, bin FROM p {bins})
SELECT cb.user_id, CAST(COUNT(*) AS BIGINT) AS n_overlaps,
       CAST(SUM(LEAST(cb.e, pb.e) - GREATEST(cb.s, pb.s)) AS BIGINT) AS overlap_sec
FROM cb JOIN pb
  ON cb.user_id = pb.user_id AND cb.bin = pb.bin
 AND cb.s <= pb.e AND pb.s <= cb.e
 AND cb.bin = (GREATEST(cb.s, pb.s) DIV {_BIN_W})
GROUP BY cb.user_id
"""
    )


# ---------------------------------------------------------------------------
# Linear interpolation over the gap-filled spine.
# ---------------------------------------------------------------------------


def _interp_sql(d: str) -> str:
    if d == "spark":
        prev_v = "last(v, true)"
        prev_h = "last(CASE WHEN v IS NOT NULL THEN eh END, true)"
        next_v = "first(v, true)"
        next_h = "first(CASE WHEN v IS NOT NULL THEN eh END, true)"
        spine = """
  SELECT event_type, explode(sequence(h0, h1, INTERVAL 1 HOUR)) AS h
  FROM bounds"""
        epoch = "CAST(unix_timestamp(h) AS BIGINT)"
    else:
        prev_v = "last_value(v IGNORE NULLS)"
        prev_h = "last_value(CASE WHEN v IS NOT NULL THEN eh END IGNORE NULLS)"
        next_v = "first_value(v IGNORE NULLS)"
        next_h = "first_value(CASE WHEN v IS NOT NULL THEN eh END IGNORE NULLS)"
        spine = """
  SELECT event_type, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
  FROM bounds"""
        epoch = "CAST(floor(epoch(h)) AS BIGINT)"
    back = "PARTITION BY event_type ORDER BY eh ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
    fwd = "PARTITION BY event_type ORDER BY eh ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING"
    return f"""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS h,
         CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS v
  FROM {tbl('events', d)}
  WHERE event_type IN ('click', 'purchase')
  GROUP BY event_type, date_trunc('hour', ts)
),
bounds AS (
  SELECT event_type, MIN(h) AS h0, MAX(h) AS h1 FROM hourly GROUP BY event_type
),
spine AS ({spine}),
joined AS (
  SELECT s.event_type, {epoch.replace('(h)', '(s.h)')} AS eh, s.h, hr.v
  FROM spine s LEFT JOIN hourly hr
    ON hr.event_type = s.event_type AND hr.h = s.h
),
ctx AS (
  SELECT event_type, eh, h, v,
         {prev_v} OVER ({back}) AS pv,
         {prev_h} OVER ({back}) AS ph,
         {next_v} OVER ({fwd}) AS nv,
         {next_h} OVER ({fwd}) AS nh
  FROM joined
)
SELECT event_type, {ts_str('h', d)} AS hour,
       round(CASE
         WHEN v IS NOT NULL THEN v
         WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
           pv + (nv - pv) * (CAST(eh - ph AS DOUBLE) / CAST(nh - ph AS DOUBLE))
         ELSE COALESCE(pv, nv)
       END, 6) AS v_interp,
       CAST(CASE WHEN v IS NULL THEN 1 ELSE 0 END AS BIGINT) AS was_gap
FROM ctx
"""


@query("ts_interpolate_linear", oracle=_interp_sql("duck"), tags=("timeseries", "window"))
def ts_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation over the hourly spine: interior gaps take
    ``prev + (next - prev) * elapsed/gap_len`` from ignore-nulls running
    windows in both directions; boundary gaps fall back to the nearest
    observation. Same shuffle budget as forward fill — one join, one sort
    per series partition reused by both window directions. The arithmetic
    is the same double expression over identical decimal-summed inputs in
    both engines."""
    views(spark, sf_dir, "events")
    return spark.sql(_interp_sql("spark"))
