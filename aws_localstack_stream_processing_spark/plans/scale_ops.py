"""Skew- and scale-management operators.

These queries compute ordinary relational answers, but with the physical
strategies a 100 TB deployment needs when keys are hot: two-phase salted
aggregation and salted replicate-joins. The DuckDB oracle runs the plain
(unsalted) query — results must be identical, proving the rewrite is
semantics-preserving. AQE's skew-join splitting handles post-shuffle skew
automatically; explicit salting is the tool when a *single grouping key*
dominates (pre-aggregation) or the dimension side must be replicated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dialect import tbl, views
from .registry import query

_N_SALTS = 16


def _hot_key_sql(d: str) -> str:
    return f"""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM {tbl('events', d)}
GROUP BY event_type
"""


@query("scale_salted_hot_key_agg", oracle=_hot_key_sql("duck"), tags=("scale", "agg", "skew"))
def scale_salted_hot_key_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation for hot grouping keys: phase 1 groups by
    (key, salt) so a dominant key spreads over N_SALTS reducers; phase 2
    merges the partials. COUNT(DISTINCT user_id) stays exact via a
    two-level aggregation — level 1 groups by (key, user_id), so a hot key
    spreads across reducers by user_id and NO per-group set is ever
    materialized (every aggregation state is a counter); level 2 counts the
    surviving distinct pairs per key. Unbounded per-key user cardinality
    costs rows, never executor memory. Identical result to the plain
    GROUP BY oracle."""
    ev = views(spark, sf_dir, "events")["events"]
    salted = ev.withColumn("salt", F.pmod(F.xxhash64("event_id"), F.lit(_N_SALTS)))
    phase1 = salted.groupBy("event_type", "salt").agg(
        F.count("*").alias("pn"),
        F.sum(F.col("value").cast("decimal(28,6)")).alias("psum"),
    )
    sums = phase1.groupBy("event_type").agg(
        F.sum("pn").cast("bigint").alias("n_events"),
        F.sum("psum").cast("double").alias("sum_value"),
    )
    distinct_users = (
        ev.groupBy("event_type", "user_id")
        .agg(F.lit(1))
        .groupBy("event_type")
        .agg(F.count("*").cast("bigint").alias("n_users"))
    )
    return sums.join(distinct_users, "event_type")


def _skew_join_sql(d: str) -> str:
    return f"""
WITH user_dim AS (
  SELECT user_id, MIN(ts) AS first_seen
  FROM {tbl('events', d)} GROUP BY user_id
)
SELECT e.event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(e.value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value,
       CAST(MIN(u.first_seen = e.ts) AS {'BOOLEAN' if d == 'duck' else 'BOOLEAN'}) AS any_first
FROM {tbl('events', d)} e
JOIN user_dim u ON e.user_id = u.user_id
GROUP BY e.event_type
"""


@query("scale_salted_skew_join", oracle=_skew_join_sql("duck"), tags=("scale", "join", "skew"))
def scale_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted replicate-join for a skewed fact key: the fact side gets a
    random-but-deterministic salt in [0, N); the dimension side is
    replicated N ways with `explode(sequence(...))`; the join key becomes
    (user_id, salt) so one hot user spreads across N tasks. Same rows as
    the plain equi-join oracle."""
    ev = views(spark, sf_dir, "events")["events"]
    user_dim = ev.groupBy("user_id").agg(F.min("ts").alias("first_seen"))
    fact = ev.withColumn("salt", F.pmod(F.xxhash64("event_id"), F.lit(_N_SALTS)))
    dim_rep = user_dim.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(_N_SALTS - 1)))
    ).withColumn("salt", F.col("salt").cast("long"))
    j = fact.join(dim_rep, ["user_id", "salt"])
    return (
        j.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(28,6)")).cast("double").alias("sum_value"),
            F.min(F.col("first_seen") == F.col("ts")).alias("any_first"),
        )
    )


def _mode_sql(d: str) -> str:
    return f"""
SELECT user_id, event_type AS top_type, CAST(n AS BIGINT) AS n
FROM (
  SELECT user_id, event_type, COUNT(*) AS n,
         ROW_NUMBER() OVER (
           PARTITION BY user_id ORDER BY COUNT(*) DESC, event_type
         ) AS rn
  FROM {tbl('events', d)}
  GROUP BY user_id, event_type
) t
WHERE rn = 1
"""


@query("grouped_map_mode", oracle=_mode_sql("duck"), tags=("scale", "udf", "grouped-map"))
def grouped_map_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDAF-shaped grouped-map: per-user modal event type via
    ``applyInPandas`` (whole group as one Arrow batch → one output row;
    deterministic lexicographic tie-break). The oracle is the pure-SQL
    window formulation — proving the Python operator matches relational
    semantics. Shuffle profile: one hash partition on the group key, same
    as the SQL plan."""
    ev = views(spark, sf_dir, "events")["events"]

    def mode_fn(pdf):
        import pandas as pd

        counts = (
            pdf.groupby("event_type").size().reset_index(name="n")
            .sort_values(["n", "event_type"], ascending=[False, True])
        )
        top = counts.iloc[0]
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "top_type": [top["event_type"]],
                "n": [int(top["n"])],
            }
        )

    return ev.select("user_id", "event_type").groupBy("user_id").applyInPandas(
        mode_fn, "user_id bigint, top_type string, n bigint"
    )


def _trimmed_sql(d: str) -> str:
    return f"""
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(CAST(SUM(iv) - MIN(iv) - MAX(iv) AS DOUBLE)
            / (COUNT(*) - 1 - 1) / 1000000.0 AS DOUBLE) AS trimmed_mean
FROM (
  SELECT event_type, CAST(round(value * 1000000) AS BIGINT) AS iv
  FROM {tbl('events', d)}
) t
GROUP BY event_type
"""


@query("grouped_agg_udaf", oracle=_trimmed_sql("duck"), tags=("scale", "udf", "grouped-agg"))
def grouped_agg_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED_AGG pandas_udf (the vectorized UDAF surface, distinct from
    applyInPandas grouped-map): per-type trimmed mean — drop one min and one
    max micro-unit observation, average the rest. Values are integerized to
    micro-units on both sides so the Python sum is exact int64 and the final
    double division is the same IEEE operation as the oracle's. Plan: one
    hash exchange on the group key feeding an Arrow-batched aggregation —
    same shuffle profile as the SQL form."""
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    ev = views(spark, sf_dir, "events")["events"]

    # explicit GROUPED_AGG functionType: postponed annotations (PEP 563,
    # module-wide here) stringify type hints, so signature inference can't
    # see pd.Series -> float
    @pandas_udf("double", PandasUDFType.GROUPED_AGG)
    def trimmed_mean(v):
        iv = (v * 1_000_000).round().astype("int64")
        s = int(iv.sum()) - int(iv.min()) - int(iv.max())
        return float(s) / (len(iv) - 2) / 1_000_000.0

    # Spark disallows mixing group-agg pandas UDFs with non-pandas
    # aggregates in one Aggregate, so the row count is a pandas agg too
    @pandas_udf("long", PandasUDFType.GROUPED_AGG)
    def n_rows(v):
        return len(v)

    return (
        ev.groupBy("event_type")
        .agg(
            n_rows("value").alias("n"),
            trimmed_mean("value").alias("trimmed_mean"),
        )
        .select("event_type", "n", "trimmed_mean")
    )
