"""Round-4 analytics operators: gaps-and-islands sessionology, CDC
latest-row compaction, Kolmogorov–Smirnov drift, BPE merge-candidate
mining, stratified sampling, and last-touch attribution.

Each is a named two-dialect query with a DuckDB oracle. Scale notes per
operator; the family-wide rules: windows always carry a partition spec,
arg-max compactions are aggregations (map-side combinable), and the one
global extremum (the KS statistic) is a TakeOrdered top-1, never a
global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .dialect import intdiv, tbl, ts_str_us, unnest_fn, views
from .registry import query

# ---------------------------------------------------------------------------
# sql_gaps_islands — consecutive-run detection via the rn-difference trick.
# ---------------------------------------------------------------------------


def _islands_sql(d: str) -> str:
    return f"""
WITH seq AS (
  SELECT user_id, event_type, event_id,
         ROW_NUMBER() OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS rn_all,
         ROW_NUMBER() OVER (
           PARTITION BY user_id, event_type ORDER BY ts, event_id
         ) AS rn_type
  FROM {tbl('events', d)}
),
islands AS (
  SELECT user_id, event_type,
         rn_all - rn_type AS grp,
         CAST(COUNT(*) AS BIGINT) AS island_len,
         MIN(event_id) AS first_event_id,
         MAX(event_id) AS last_event_id
  FROM seq
  GROUP BY user_id, event_type, rn_all - rn_type
)
SELECT user_id, event_type, island_len, first_event_id, last_event_id
FROM islands
WHERE island_len >= 3
ORDER BY user_id, first_event_id, event_type
"""


@query("sql_gaps_islands", oracle=_islands_sql("duck"), tags=("sql", "sessionize"))
def sql_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: find maximal runs of ≥3 consecutive same-type
    events per user with the classic row-number-difference construction
    (rn_all − rn_per_type is constant exactly while the type doesn't
    change). The canonical relational answer to "how many times did a
    user do X three times in a row?" — streak detection without any
    self-join or iterative pass. Both windows and the island aggregation
    partition on user_id, so one hash shuffle covers all three steps and
    a 100× user count just spreads across executors; no state grows past
    a single user's history."""
    views(spark, sf_dir, "events")
    return spark.sql(_islands_sql("spark"))


# ---------------------------------------------------------------------------
# cdc_latest_compact — latest-row-per-key compaction as an aggregation.
# ---------------------------------------------------------------------------


def _latest_compact_sql(d: str) -> str:
    # single BIGINT recency key (event ids are unique): second epoch
    # * 2^20 + event_id — the repo's second-precision epoch idiom
    # (unix_timestamp / floor(epoch)), id as the within-second tiebreak
    if d == "spark":
        ordk = "(CAST(unix_timestamp(ts) AS BIGINT) * 1048576 + event_id)"
        pick = "max_by"
    else:
        ordk = "(CAST(floor(epoch(ts)) AS BIGINT) * 1048576 + event_id)"
        pick = "arg_max"
    return f"""
SELECT user_id,
       {pick}(event_id, {ordk}) AS last_event_id,
       {pick}(event_type, {ordk}) AS last_event_type,
       round({pick}(value, {ordk}), 6) AS last_value,
       CAST(COUNT(*) AS BIGINT) AS n_versions
FROM {tbl('events', d)}
GROUP BY user_id
ORDER BY user_id
"""


@query("cdc_latest_compact", oracle=_latest_compact_sql("duck"), tags=("cdc", "lakehouse"))
def cdc_latest_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-row-per-key compaction — the read-side collapse of a CDC
    changelog into current state (the other half of ``cdc_merge_upsert``).
    Implemented as ``max_by``/``arg_max`` AGGREGATION on a single BIGINT
    recency key, not the usual ROW_NUMBER-=-1 window: the aggregate is
    map-side combinable, so each executor reduces its partitions to one
    candidate row per key before the shuffle — on a 100 TB changelog
    with billions of updates per key that is the difference between
    shuffling the changelog and shuffling the (much smaller) key set.
    The recency key folds (event-time, event-id) into one comparable so
    ties are impossible by construction."""
    views(spark, sf_dir, "events")
    return spark.sql(_latest_compact_sql("spark"))


# ---------------------------------------------------------------------------
# profile_ks_drift — two-sample Kolmogorov–Smirnov distance, integer-exact.
# ---------------------------------------------------------------------------

_KS_BUCKET = 50.0  # value-range bucket width for the two-phase ECDF


def _ks_drift_sql(d: str) -> str:
    return f"""
WITH tagged AS (
  SELECT CAST(value AS DOUBLE) AS v,
         CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS is_a
  FROM {tbl('events', d)}
),
tot AS (
  SELECT CAST(SUM(is_a) AS BIGINT) AS na,
         CAST(SUM(1 - is_a) AS BIGINT) AS nb
  FROM tagged
),
pts AS (
  SELECT v, CAST(floor(v / {_KS_BUCKET}) AS BIGINT) AS bkt,
         CAST(SUM(is_a) AS BIGINT) AS ca,
         CAST(SUM(1 - is_a) AS BIGINT) AS cb
  FROM tagged GROUP BY v
),
bucket_tot AS (
  SELECT bkt, CAST(SUM(ca) AS BIGINT) AS bca, CAST(SUM(cb) AS BIGINT) AS bcb
  FROM pts GROUP BY bkt
),
offsets AS (
  SELECT a.bkt,
         CAST(COALESCE(SUM(CASE WHEN b.bkt < a.bkt THEN b.bca END), 0)
              AS BIGINT) AS oa,
         CAST(COALESCE(SUM(CASE WHEN b.bkt < a.bkt THEN b.bcb END), 0)
              AS BIGINT) AS ob
  FROM bucket_tot a LEFT JOIN bucket_tot b ON b.bkt < a.bkt
  GROUP BY a.bkt
),
ecdf AS (
  SELECT p.v,
         o.oa + SUM(p.ca) OVER (PARTITION BY p.bkt ORDER BY p.v) AS cum_a,
         o.ob + SUM(p.cb) OVER (PARTITION BY p.bkt ORDER BY p.v) AS cum_b
  FROM pts p JOIN offsets o ON o.bkt = p.bkt
)
SELECT round(CAST(diff_num AS DOUBLE) / (na * nb), 6) AS ks_stat,
       round(at_value, 6) AS at_value, na, nb
FROM (
  SELECT CASE WHEN e.cum_a * t.nb >= e.cum_b * t.na
              THEN e.cum_a * t.nb - e.cum_b * t.na
              ELSE e.cum_b * t.na - e.cum_a * t.nb END AS diff_num,
         e.v AS at_value, t.na, t.nb
  FROM ecdf e CROSS JOIN tot t
) scored
ORDER BY diff_num DESC, at_value
LIMIT 1
"""


@query("profile_ks_drift", oracle=_ks_drift_sql("duck"), tags=("quality", "profiling"))
def profile_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov distance between the value
    distributions of two user cohorts — the continuous-distribution
    drift test beside ``profile_drift_chi2``'s categorical one. The
    ECDFs come from the two-phase construction (value-bucket partial
    counts → prefix-sum offsets → within-bucket running sums), so no
    window ever sees more than one bucket and the plan has no global
    sort; the statistic itself is computed on INTEGER cross-products
    (|ca·nb − cb·na|, exact in BIGINT) so the argmax cannot flip on
    float rounding, and the final division happens once, on the single
    surviving row of a TakeOrdered top-1."""
    views(spark, sf_dir, "events")
    return spark.sql(_ks_drift_sql("spark"))


# ---------------------------------------------------------------------------
# text_bpe_merge_candidates — byte-pair-encoding first-merge mining.
# ---------------------------------------------------------------------------

_BPE_TOP = 20


def _bpe_pairs(d: str) -> str:
    if d == "spark":
        return f"""
pairs AS (
  SELECT explode(transform(sequence(1, length(word) - 1),
                           i -> substring(word, i, 2))) AS pair
  FROM (SELECT {unnest_fn(d)}(split(text, ' ')) AS word
        FROM {tbl('documents', d)}) w
  WHERE length(word) >= 2
)"""
    return f"""
pairs AS (
  SELECT unnest(list_transform(range(1, length(word)),
                               i -> substring(word, i, 2))) AS pair
  FROM (SELECT unnest(string_split(text, ' ')) AS word
        FROM {tbl('documents', d)}) w
  WHERE length(word) >= 2
)"""


def _bpe_sql(d: str) -> str:
    return f"""
WITH {_bpe_pairs(d)}
SELECT pair, CAST(COUNT(*) AS BIGINT) AS n_occ
FROM pairs
GROUP BY pair
ORDER BY n_occ DESC, pair
LIMIT {_BPE_TOP}
"""


@query("text_bpe_merge_candidates", oracle=_bpe_sql("duck"), tags=("llm", "text"))
def text_bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first iteration of byte-pair encoding (Sennrich et al. 2016,
    public — the tokenizer-training algorithm behind GPT/Llama vocabs):
    count every adjacent character pair inside every word of the corpus
    and rank the merge candidates. Training a real BPE vocabulary is
    this exact query iterated with a growing symbol table, so its cost
    model IS the tokenizer-training cost model: the pair expansion is a
    narrow map keyed nowhere, the count is a map-side-combinable
    aggregation on the pair (a few hundred distinct keys regardless of
    corpus size — partial aggregation collapses each executor's output
    to its local vocabulary), and the top-k is a per-partition heap."""
    views(spark, sf_dir, "documents")
    return spark.sql(_bpe_sql("spark"))


# ---------------------------------------------------------------------------
# data_stratified_sample — per-stratum deterministic uniform k-sample.
# ---------------------------------------------------------------------------

_STRAT_K = 15


def _stratified_sql(d: str) -> str:
    doc_str = (
        "CAST(doc_id AS STRING)" if d == "spark" else "CAST(doc_id AS VARCHAR)"
    )
    return f"""
WITH keyed AS (
  SELECT doc_id, lang, source, n_chars, md5({doc_str}) AS sample_key
  FROM {tbl('documents', d)}
),
ranked AS (
  SELECT doc_id, lang, source, n_chars, sample_key,
         ROW_NUMBER() OVER (
           PARTITION BY lang ORDER BY sample_key, doc_id
         ) AS rnk
  FROM keyed
)
SELECT lang, doc_id, source, n_chars, CAST(rnk AS BIGINT) AS rnk
FROM ranked WHERE rnk <= {_STRAT_K}
ORDER BY lang, rnk
"""


@query("data_stratified_sample", oracle=_stratified_sql("duck"), tags=("llm", "sampling"))
def data_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified uniform sampling: k documents per language, drawn by
    hash rank — the evaluation-set builder that guarantees every stratum
    is represented no matter how skewed the corpus (a 99%-English crawl
    still yields k Chinese docs). Deterministic and replayable like
    ``sketch_reservoir_sample``, but the rank window partitions on the
    stratum, so each language's heap is independent; contrast with
    ``data_domain_quota``, which ranks by a quality proxy — this one is
    a uniform draw (hash order is independent of any document
    property). One shuffle on lang; skew bounded by WindowGroupLimit
    pushing the k-row cut into each partition before the sort."""
    views(spark, sf_dir, "documents")
    return spark.sql(_stratified_sql("spark"))


# ---------------------------------------------------------------------------
# attribution_last_touch — conversion credit via partitioned asof logic.
# ---------------------------------------------------------------------------


def _attribution_sql(d: str) -> str:
    # last click at-or-before each purchase, within a 3-day lookback —
    # the union + running-max construction (no inequality join): clicks
    # and purchases interleave on (ts, event_id); a running max over the
    # click rows carries (click_ts, click_id) forward onto purchases.
    if d == "spark":
        pack = "CAST(unix_timestamp(ts) AS BIGINT) * 1048576 + event_id"
        unpack_id = "CAST(last_click % 1048576 AS BIGINT)"
        unpack_s = "CAST(last_click AS BIGINT) DIV 1048576"
        win_3d = 259200  # 3 days in seconds
        now_s = "CAST(unix_timestamp(ts) AS BIGINT)"
    else:
        pack = "CAST(floor(epoch(ts)) AS BIGINT) * 1048576 + event_id"
        unpack_id = "CAST(last_click % 1048576 AS BIGINT)"
        unpack_s = "CAST(last_click AS BIGINT) // 1048576"
        win_3d = 259200
        now_s = "CAST(floor(epoch(ts)) AS BIGINT)"
    return f"""
WITH touches AS (
  SELECT user_id, ts, event_id, value, event_type,
         CASE WHEN event_type = 'click' THEN {pack} END AS click_key
  FROM {tbl('events', d)}
  WHERE event_type = 'click' OR event_type = 'purchase'
),
carried AS (
  SELECT user_id, ts, event_id, value, event_type,
         MAX(click_key) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS last_click
  FROM touches
),
attributed AS (
  SELECT user_id, event_id AS purchase_id, value,
         {unpack_id} AS click_id,
         {now_s} - ({unpack_s}) AS age_s
  FROM carried
  WHERE event_type = 'purchase' AND last_click IS NOT NULL
)
SELECT user_id, CAST(click_id AS BIGINT) AS click_id,
       CAST(COUNT(*) AS BIGINT) AS n_conversions,
       CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS attributed_value
FROM attributed
WHERE age_s <= {win_3d}
GROUP BY user_id, click_id
ORDER BY user_id, click_id
"""


@query("attribution_last_touch", oracle=_attribution_sql("duck"), tags=("analytics",))
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: credit each purchase to the user's most
    recent click within a 3-day lookback, then roll conversion count and
    revenue up to the credited click. The click→purchase matching is the
    union + running-max construction (clicks and purchases interleave in
    one per-user ordered pass; a running MAX over a packed
    (time, click-id) key carries the latest click forward), so there is
    NO inequality join anywhere — the shape that stays a single
    user-partitioned window at 100 TB where a time-range join would
    explode. The packed BIGINT key makes carry and unpack exact; the
    revenue rollup sums in DECIMAL for order independence."""
    views(spark, sf_dir, "events")
    return spark.sql(_attribution_sql("spark"))
