"""Round-6 wave 2: governance/operations audits and retrieval polish —
t-closeness (completing the k-anonymity / l-diversity privacy triad),
SRE multi-window error-budget burn rate (the paging rule behind the
reference's alarms), MMR diversity re-ranking, per-source unigram-KL
mixture drift, commit-manifest health, embedding pairwise-cosine
geometry, and user path mining.

House determinism contract throughout (registry docstring): exact
integer/DECIMAL numerators with ONE trailing DOUBLE division, ln() terms
round(…, 12) into DECIMAL sums, floor() before BIGINT casts, every COUNT
/ SUM output CAST to BIGINT (DuckDB widens), windows partitioned on
high-cardinality keys or replaced by bounded LIMIT argmax.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .dialect import (
    dec_sum,
    dot,
    epoch_s,
    inline_values,
    intdiv,
    qsample,
    tbl,
    to_double_arr,
    ts_str,
    views,
)
from .llm_ops import DIM
from .registry import query

# ---------------------------------------------------------------------------
# privacy_t_closeness — distribution distance per QI class (Li et al. 2007).
# ---------------------------------------------------------------------------

_TC_BUCKET_W = 50  # sensitive attribute = value bucket of width 50 (0..9)
_TC_FLAG = 0.25  # t threshold


def _t_closeness_sql(d: str) -> str:
    bucket = intdiv("CAST(floor(value) AS BIGINT)", _TC_BUCKET_W, d)
    day = "CAST(day(ts) AS BIGINT)"
    dec = "DECIMAL(19,0)"
    return f"""
WITH base AS (
  SELECT event_type, {day} AS qday, {bucket} AS b FROM {tbl('events', d)}
),
g AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS gb FROM base GROUP BY b),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM base),
cls AS (
  SELECT event_type, qday, b, CAST(COUNT(*) AS BIGINT) AS ncb
  FROM base GROUP BY event_type, qday, b
),
csize AS (
  SELECT event_type, qday, CAST(SUM(ncb) AS BIGINT) AS nc
  FROM cls GROUP BY event_type, qday
),
grid AS (
  SELECT c.event_type, c.qday, c.nc, g.b, g.gb,
         COALESCE(x.ncb, CAST(0 AS BIGINT)) AS ncb
  FROM csize c CROSS JOIN g
  LEFT JOIN cls x
    ON x.event_type = c.event_type AND x.qday = c.qday AND x.b = g.b
),
tvd AS (
  -- |ncb/nc - gb/n| = |ncb*n - gb*nc| / (nc*n): exact integer numerators
  -- as DECIMAL(19,0)x(19,0) products (result precision caps at 38 in BOTH
  -- engines — overflow-free at any row count), ONE division at the end
  SELECT g.event_type, g.qday, g.nc,
         SUM(abs(CAST(g.ncb AS {dec}) * CAST(t.n AS {dec})
                 - CAST(g.gb AS {dec}) * CAST(g.nc AS {dec}))) AS num,
         MIN(t.n) AS n
  FROM grid g CROSS JOIN tot t
  GROUP BY g.event_type, g.qday, g.nc
)
SELECT event_type, qday AS qi_day, nc AS class_size,
       round(CAST(num AS DOUBLE) / (CAST(2 AS DOUBLE) * nc * n), 6)
         AS t_distance,
       CAST(num AS DOUBLE) / (CAST(2 AS DOUBLE) * nc * n) > {_TC_FLAG}
         AS exceeds_t
FROM tvd
ORDER BY t_distance DESC, event_type, qi_day
LIMIT 50
"""


@query("privacy_t_closeness", oracle=_t_closeness_sql("duck"), tags=("privacy", "governance"))
def privacy_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian 2007) — the third
    leg of the privacy triad after ``privacy_k_anonymity`` and
    ``privacy_l_diversity``: a QI class leaks even when diverse if its
    SENSITIVE-ATTRIBUTE DISTRIBUTION deviates from the global one. The
    distance is total variation over value buckets, computed as exact
    integer cross-products |ncb·N − gb·Nc| in DECIMAL(38,0) with one
    trailing division — bit-stable at any scale. Class×bucket grid is
    |classes|×10 rows; the only shuffles are two keyed aggregations."""
    views(spark, sf_dir, "events")
    return spark.sql(_t_closeness_sql("spark"))


# ---------------------------------------------------------------------------
# ref_slo_burn_rate — SRE multi-window error-budget burn (paging rule).
# ---------------------------------------------------------------------------

# Replay mapping (documented like slo_ops): the 'error' event type is the
# failed-request signal; the SLO budgets a 10% error fraction. burn =
# (observed error fraction) / (budget fraction) = 100*err/y/budget_pct —
# the SRE-workbook definition, so burn 1.0x means "consuming budget
# exactly at the sustainable rate". The test stream's types are
# ~uniform (error rate ≈ 20%), so a 10% budget sits below the base rate
# and the 2.0x fast-burn gate pages exactly on genuine error bursts.
# Fast-burn pages when BOTH the 1h burn exceeds 2.0x and the
# trailing-24h burn exceeds 1.2x budget — the two-window rule that
# suppresses single-spike false pages; a 5-event hourly volume floor
# keeps one-event hours from paging.
_BURN_BUDGET_PCT = 10
_BURN_LANES = 5  # the reference's 5 partition lanes


def _burn_rate_sql(d: str) -> str:
    lane = f"(user_id % {_BURN_LANES})"
    hour = intdiv(epoch_s("ts", d), "3600", d)
    gen = (
        "SELECT explode(sequence(lo, hi)) AS h FROM bounds"
        if d == "spark"
        else "SELECT unnest(range(lo, hi + 1)) AS h FROM bounds"
    )
    w = "PARTITION BY lane ORDER BY h ROWS BETWEEN 23 PRECEDING AND CURRENT ROW"
    return f"""
WITH cnt AS (
  SELECT {lane} AS lane, {hour} AS h,
         CAST(COUNT(*) AS BIGINT) AS y,
         CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
           AS err
  FROM {tbl('events', d)}
  GROUP BY {lane}, {hour}
),
bounds AS (SELECT MIN(h) AS lo, MAX(h) AS hi FROM cnt),
hseq AS ({gen}),
lanes AS (SELECT DISTINCT lane FROM cnt),
dense AS (
  SELECT sp.lane, sp.h,
         COALESCE(c.y, CAST(0 AS BIGINT)) AS y,
         COALESCE(c.err, CAST(0 AS BIGINT)) AS err
  FROM (SELECT l.lane, g.h FROM lanes l CROSS JOIN hseq g) sp
  LEFT JOIN cnt c ON c.lane = sp.lane AND c.h = sp.h
),
rolled AS (
  SELECT lane, h, y, err,
         CAST(SUM(y) OVER ({w}) AS BIGINT) AS y24,
         CAST(SUM(err) OVER ({w}) AS BIGINT) AS err24
  FROM dense
)
SELECT lane, {'timestamp_seconds(h * 3600)' if d == 'spark' else 'to_timestamp(h * 3600)'} AS hh,
       y, err,
       round(CAST(100 AS DOUBLE) * err / y / {_BURN_BUDGET_PCT}, 6)
         AS burn_1h,
       round(CAST(100 AS DOUBLE) * err24 / y24 / {_BURN_BUDGET_PCT}, 6)
         AS burn_24h
FROM rolled
WHERE y >= 5
  AND err * 50 > {_BURN_BUDGET_PCT} * y
  AND err24 * 250 > {_BURN_BUDGET_PCT} * y24 * 3
ORDER BY lane, h
LIMIT 200
"""


def _burn_rate_outer(d: str) -> str:
    # hh formatted AFTER the filter so both engines stringify identically
    return f"""
SELECT lane, {ts_str('hh', d)} AS hour, y AS n_events, err AS n_errors,
       burn_1h, burn_24h
FROM ({_burn_rate_sql(d)}) q
"""


@query("ref_slo_burn_rate", oracle=_burn_rate_outer("duck"), tags=("reference", "slo", "windows"))
def ref_slo_burn_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-window error-budget burn-rate paging (Google SRE Workbook
    ch. 5, public) over the reference's 5 partition lanes: a lane pages
    only when BOTH the 1-hour burn exceeds 2.0× and the trailing-24-hour
    burn exceeds 1.2× of budget — the two-window rule that keeps single
    spikes from paging while catching sustained budget exhaustion (the
    batch sibling of ``stream_alarm_actions``; reference alarm surface
    app.ts:547-588). Counts densify on a generated hour spine per lane
    (with a 5-event hourly volume floor); the rolling sums ride ONE
    lane-partitioned exchange; breach tests are pure integer
    cross-multiplications, display ratios divide once; the first-200 cap
    keeps the alert table bounded at any time range."""
    views(spark, sf_dir, "events")
    return spark.sql(_burn_rate_outer("spark"))


# ---------------------------------------------------------------------------
# rag_mmr_rerank — maximal marginal relevance (Carbonell & Goldstein 1998).
# ---------------------------------------------------------------------------

_MMR_CAND = 8
_MMR_PICKS = 4  # unrolled greedy selections (λ = 1/2 — exact halving)


def _mmr_cand_sql(d: str) -> str:
    """Top-``_MMR_CAND`` candidates by cosine to the hash-rank query vector
    — the only corpus-scale piece of the MMR plan (TakeOrdered, no window)."""
    base = f"SELECT vec_id, {to_double_arr('embedding', d)} AS emb FROM {tbl('embeddings', d)}"
    return f"""
WITH base AS ({base}),
normed AS (SELECT vec_id, emb, sqrt({dot('emb', 'emb', DIM, d)}) AS nrm FROM base),
qs AS ({qsample('normed', 'vec_id', 1)}),
q AS (SELECT n.* FROM normed n JOIN qs ON qs.vec_id = n.vec_id)
SELECT n.vec_id AS nid, n.emb, n.nrm,
       {dot('q.emb', 'n.emb', DIM, d)} / (q.nrm * n.nrm) AS rel
FROM q JOIN normed n ON n.vec_id <> q.vec_id
ORDER BY {dot('q.emb', 'n.emb', DIM, d)} / (q.nrm * n.nrm) DESC, n.vec_id
LIMIT {_MMR_CAND}"""


def _mmr_sql(d: str) -> str:
    cos = dot("a.emb", "b.emb", DIM, d)
    pick = []
    prev_sims = []
    for i in range(2, _MMR_PICKS + 1):
        prev = ", ".join(f"p{j}" for j in range(1, i))
        sim_joins = " ".join(
            f"JOIN sims s{j} ON s{j}.x = r.nid AND s{j}.y = p{j}.nid" for j in range(1, i)
        )
        maxsim = (
            f"greatest({', '.join(f's{j}.sim' for j in range(1, i))})"
            if i > 2
            else "s1.sim"
        )
        excl = " AND ".join(f"r.nid <> p{j}.nid" for j in range(1, i))
        pick.append(
            f"""p{i} AS (
  SELECT r.nid, r.rel FROM cand r CROSS JOIN {prev.replace(', ', ' CROSS JOIN ')}
  {sim_joins}
  WHERE {excl}
  ORDER BY (r.rel / 2 - {maxsim} / 2) DESC, r.nid LIMIT 1
)"""
        )
        prev_sims.append(i)
    picks_sql = ",\n".join(pick)
    outs = ["SELECT CAST(1 AS BIGINT) AS rnk, nid AS doc_id, round(rel, 6) AS relevance FROM p1"]
    for i in range(2, _MMR_PICKS + 1):
        outs.append(
            f"SELECT CAST({i} AS BIGINT), nid, round(rel, 6) FROM p{i}"
        )
    union = "\nUNION ALL\n".join(outs)
    return f"""
WITH cand AS ({_mmr_cand_sql(d)}),
sims AS (
  SELECT a.nid AS x, b.nid AS y, {cos} / (a.nrm * b.nrm) AS sim
  FROM cand a JOIN cand b ON a.nid <> b.nid
),
p1 AS (SELECT nid, rel FROM cand ORDER BY rel DESC, nid LIMIT 1),
{picks_sql}
SELECT * FROM ({union}) u
ORDER BY rnk
"""


@query("rag_mmr_rerank", oracle=_mmr_sql("duck"), tags=("rag", "similarity", "topk"))
def rag_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-marginal-relevance re-ranking (Carbonell & Goldstein 1998)
    — the diversity pass between retrieval and the context window: greedy
    picks maximize λ·relevance − (1−λ)·max-similarity-to-already-picked
    (λ = 1/2, an exact halving). The candidate set is the top-8 by cosine
    (LIMIT over one corpus pass — TakeOrdered, no window), so the greedy
    unroll touches only an 8×8 similarity table: each of the 4 picks is a
    bounded ORDER-BY-LIMIT-1 argmax, never a corpus operation. At 100 TB
    only the candidate retrieval scales; the rerank stays constant-size.

    Execution shape: only the candidate retrieval is a corpus operation;
    the greedy rerank runs on the CONSTANT-size candidate set (``_MMR_CAND``
    rows regardless of corpus scale), collected to the coordinator exactly
    as a production reranker would — the same documented bounded-collect
    pattern as ``stream_lru_keyring``. Expressing the unrolled picks as one
    SQL text was measured at 7.5 s (sf0.1): Catalyst inlines the ``cand``
    CTE into every pick and every sims reference, re-running the corpus
    scan combinatorially many times; a lazy DataFrame unroll still pays
    ~10 s of tiny-stage scheduling. Driver-side greedy over 8 rows is
    bit-faithful to the oracle (index-ordered IEEE dot folds, exact /2
    halving) and the final round(…, 6) happens engine-side."""
    views(spark, sf_dir, "embeddings")
    cand_df = spark.sql(_mmr_cand_sql("spark"))
    rows = cand_df.collect()  # exactly _MMR_CAND rows at any corpus size

    def cos(a, b) -> float:
        acc = 0.0
        for k in range(DIM):  # same index-ordered IEEE fold as dialect.dot
            acc += a.emb[k] * b.emb[k]
        return acc / (a.nrm * b.nrm)

    sims = {
        (a.nid, b.nid): cos(a, b) for a in rows for b in rows if a.nid != b.nid
    }
    first = min(rows, key=lambda r: (-r.rel, r.nid))
    picked = [first.nid]
    out = [(1, first.nid, first.rel)]
    for i in range(2, _MMR_PICKS + 1):
        best = min(
            (r for r in rows if r.nid not in picked),
            key=lambda r: (
                -(r.rel / 2 - max(sims[(r.nid, p)] for p in picked) / 2),
                r.nid,
            ),
        )
        picked.append(best.nid)
        out.append((i, best.nid, best.rel))

    schema = T.StructType(
        [
            T.StructField("rnk", T.LongType(), False),
            T.StructField("doc_id", cand_df.schema["nid"].dataType, True),
            T.StructField("relevance", T.DoubleType(), True),
        ]
    )
    return spark.createDataFrame(out, schema).select(
        "rnk", "doc_id", F.round("relevance", 6).alias("relevance")
    )


# ---------------------------------------------------------------------------
# text_unigram_kl_mix — per-source KL divergence vs the corpus unigram LM.
# ---------------------------------------------------------------------------

_KL_VOCAB = 200


def _kl_mix_sql(d: str) -> str:
    gen = "explode" if d == "spark" else "unnest"
    return f"""
WITH toks AS (
  SELECT source, {gen}(split(text, ' ')) AS word FROM {tbl('documents', d)}
),
tv AS (SELECT source, word FROM toks WHERE word <> ''),
gcnt AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS gw FROM tv GROUP BY word),
vocab AS (SELECT word, gw FROM gcnt ORDER BY gw DESC, word LIMIT {_KL_VOCAB}),
-- smoothing mass must use the ACTUAL vocabulary size (≤ the cap), else
-- Σp ≠ 1 and the "KL" can go negative
gtot AS (
  SELECT CAST(SUM(gw) AS BIGINT) AS gn, CAST(COUNT(*) AS BIGINT) AS v
  FROM vocab
),
scnt AS (
  SELECT t.source, t.word, CAST(COUNT(*) AS BIGINT) AS sw
  FROM tv t JOIN vocab v ON v.word = t.word
  GROUP BY t.source, t.word
),
stot AS (SELECT source, CAST(SUM(sw) AS BIGINT) AS sn FROM scnt GROUP BY source),
grid AS (
  SELECT st.source, st.sn, v.word, v.gw,
         COALESCE(sc.sw, CAST(0 AS BIGINT)) AS sw
  FROM stot st CROSS JOIN vocab v
  LEFT JOIN scnt sc ON sc.source = st.source AND sc.word = v.word
),
terms AS (
  -- add-one smoothed p·ln(p/q); each libm term round-12 before the
  -- DECIMAL sum (house rule for order-independent float folds)
  SELECT g.source,
         round(((CAST(g.sw AS DOUBLE) + 1) / (g.sn + t.v))
               * ln(((CAST(g.sw AS DOUBLE) + 1) / (g.sn + t.v))
                    / ((CAST(g.gw AS DOUBLE) + 1) / (t.gn + t.v))),
               12) AS term,
         g.sn
  FROM grid g CROSS JOIN gtot t
)
SELECT source,
       CAST(MIN(sn) AS BIGINT) AS n_vocab_tokens,
       round({dec_sum('term', 12)}, 6) AS kl_nats
FROM terms
GROUP BY source
ORDER BY kl_nats DESC, source
"""


@query("text_unigram_kl_mix", oracle=_kl_mix_sql("duck"), tags=("llm", "text", "profiling"))
def text_unigram_kl_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source unigram KL divergence against the corpus language model
    — the mixture-drift audit behind data-mix dashboards (a source whose
    token distribution diverges from the pool is over/under-represented
    or off-domain; CCNet uses the same statistic with a reference LM).
    Vocabulary = top-200 terms by count (ORDER BY + LIMIT — a bounded
    TakeOrdered, no window); the source×vocab grid is |sources|×200 rows;
    smoothed p·ln(p/q) terms round-12 into a DECIMAL sum.

    r13 note: a one-tokenize-pass restructure with a persisted
    (source, word) count table was tried and REVERTED — at bench scale
    this query is job-overhead-bound (the whole query ≈ one tokenize
    pass ≈ 0.5 s) and the persist's materialization barrier measured
    SLOWER than the oracle text's re-planned passes (0.553 → 0.635 s
    window-normalized at sf0.1). The flat oracle-shared text stands."""
    views(spark, sf_dir, "documents")
    return spark.sql(_kl_mix_sql("spark"))


# ---------------------------------------------------------------------------
# lake_manifest_health — commit-manifest small-file / debt audit.
# ---------------------------------------------------------------------------

_MH_SMALL_BYTES = 25_000_000  # "small file" threshold in modeled bytes


def _manifest_health_sql(d: str) -> str:
    commit = "CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT)"
    fbytes = "CAST(floor(o_totalprice) AS BIGINT) * 500"
    return f"""
WITH files AS (
  SELECT {commit} AS commit_id, o_orderkey AS file_id, {fbytes} AS bytes
  FROM {tbl('orders', d)}
)
SELECT commit_id,
       CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(SUM(bytes) AS BIGINT) AS total_bytes,
       CAST(SUM(CASE WHEN bytes < {_MH_SMALL_BYTES} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_small,
       round(CAST(SUM(CASE WHEN bytes < {_MH_SMALL_BYTES} THEN 1 ELSE 0 END)
                  AS DOUBLE) / COUNT(*), 6) AS small_frac,
       {intdiv('CAST(SUM(bytes) AS BIGINT)', 'COUNT(*)', d)} AS avg_bytes,
       CAST(SUM(CASE WHEN bytes < {_MH_SMALL_BYTES} THEN 1 ELSE 0 END)
            AS DOUBLE) / COUNT(*) > 0.5 AS compaction_needed
FROM files
GROUP BY commit_id
ORDER BY commit_id
"""


@query("lake_manifest_health", oracle=_manifest_health_sql("duck"), tags=("lakehouse", "profiling"))
def lake_manifest_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Commit-manifest health audit — the monitoring view over the
    manifest pattern `manifest_lake` reads and `lake_compaction_plan`
    remediates: per commit, file counts, bytes, the small-file fraction
    (the scan-parallelism killer), and a compaction-debt flag. Work is
    manifest-sized (|files| rows, one keyed aggregation) — at 100 TB this
    reads commit metadata, never data. Modeled over the orders table as
    the house lake_* convention (one order = one committed file)."""
    views(spark, sf_dir, "orders")
    return spark.sql(_manifest_health_sql("spark"))


# ---------------------------------------------------------------------------
# emb_pair_cosine_hist — pairwise-cosine geometry histogram.
# ---------------------------------------------------------------------------

_PCH_SAMPLE = 32  # hash-rank sample → 32·31/2 = 496 exact pairs


def _pair_hist_sql(d: str) -> str:
    bins = ", ".join(f"({i})" for i in range(10))
    return f"""
WITH base AS (
  SELECT vec_id, {to_double_arr('embedding', d)} AS emb FROM {tbl('embeddings', d)}
),
normed AS (SELECT vec_id, emb, sqrt({dot('emb', 'emb', DIM, d)}) AS nrm FROM base),
qs AS ({qsample('normed', 'vec_id', _PCH_SAMPLE)}),
smp AS (SELECT n.* FROM normed n JOIN qs ON qs.vec_id = n.vec_id),
pairs AS (
  -- BROADCAST hint: the sampled side is a fixed 32 rows but TakeOrdered
  -- output carries no stats, so Catalyst would otherwise plan the tiny
  -- non-equi self-join as a CartesianProduct (a comment to DuckDB)
  SELECT /*+ BROADCAST(a) */
         least(CAST(floor(({dot('a.emb', 'b.emb', DIM, d)} / (a.nrm * b.nrm) + 1)
                    * 5) AS BIGINT), CAST(9 AS BIGINT)) AS bin
  FROM smp a JOIN smp b ON a.vec_id < b.vec_id
),
spine AS ({inline_values(bins, 'bn', 'bin', d)}),
cnt AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS n FROM pairs GROUP BY bin)
SELECT CAST(sp.bin AS BIGINT) AS bin,
       round(CAST(sp.bin AS DOUBLE) / 5 - 1, 1) AS cos_lo,
       COALESCE(c.n, CAST(0 AS BIGINT)) AS n_pairs
FROM spine sp LEFT JOIN cnt c ON c.bin = sp.bin
ORDER BY bin
"""


@query("emb_pair_cosine_hist", oracle=_pair_hist_sql("duck"), tags=("llm", "similarity", "profiling"))
def emb_pair_cosine_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise-cosine histogram over a fixed hash-rank sample — the
    embedding-space geometry check (Ethayarajh 2019's anisotropy
    observation, public): healthy spaces spread mass across bins; a
    collapsed or anisotropic space piles into the top bins and ANN
    recall/dedup thresholds silently degrade. The sample is fixed-k
    (496 exact pairs at any corpus size — same qsample machinery as the
    recall evals); floor() precedes the BIGINT bin cast; a 10-row literal
    bin spine keeps empty bins visible."""
    views(spark, sf_dir, "embeddings")
    return spark.sql(_pair_hist_sql("spark"))


# ---------------------------------------------------------------------------
# seq_user_path_topk — most common 3-step event paths.
# ---------------------------------------------------------------------------


def _path_topk_sql(d: str) -> str:
    w = "PARTITION BY user_id ORDER BY ts, event_id"
    return f"""
WITH seq AS (
  SELECT user_id, event_type AS e1,
         LEAD(event_type, 1) OVER ({w}) AS e2,
         LEAD(event_type, 2) OVER ({w}) AS e3
  FROM {tbl('events', d)}
),
paths AS (
  SELECT concat(e1, '>', e2, '>', e3) AS path
  FROM seq WHERE e2 IS NOT NULL AND e3 IS NOT NULL
)
SELECT path, CAST(COUNT(*) AS BIGINT) AS n_occurrences
FROM paths
GROUP BY path
ORDER BY n_occurrences DESC, path
LIMIT 10
"""


@query("seq_user_path_topk", oracle=_path_topk_sql("duck"), tags=("sequence", "agg", "topk"))
def seq_user_path_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 most frequent 3-step user paths — the path-mining view next
    to ``seq_markov_transitions`` (which models pairs; this surfaces the
    actual frequent trigram journeys product teams read). Two stacked
    LEADs ride ONE user-partitioned exchange; the path space collapses to
    ≤ |types|³ groups before the TakeOrdered top-10."""
    views(spark, sf_dir, "events")
    return spark.sql(_path_topk_sql("spark"))


# ---------------------------------------------------------------------------
# dedup_cluster_size_hist — duplicate-cluster size distribution.
# ---------------------------------------------------------------------------


def _cluster_hist_sql(d: str) -> str:
    from ..functions import hashing
    from .llm_ops import _doc_corpus

    return f"""
WITH corpus AS ({_doc_corpus(d)}),
cl AS (
  SELECT {hashing.sha256_hex('text', d)} AS h, CAST(COUNT(*) AS BIGINT) AS sz
  FROM corpus GROUP BY {hashing.sha256_hex('text', d)}
)
SELECT sz AS cluster_size,
       CAST(COUNT(*) AS BIGINT) AS n_clusters,
       CAST(SUM(sz) AS BIGINT) AS n_docs
FROM cl GROUP BY sz ORDER BY sz
"""


@query("dedup_cluster_size_hist", oracle=_cluster_hist_sql("duck"), tags=("llm", "dedup", "profiling"))
def dedup_cluster_size_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster size distribution — the audit that tells a dedup
    campaign WHAT it is up against (web corpora show a power law: a few
    megaclusters hold most duplicate mass, Lee et al. 2022 §4): exact-hash
    clusters over the planted-dup verification corpus, folded twice
    (content key → cluster sizes → size histogram). Two map-side-
    combinable aggregations, no window, no join — at 100 TB this is the
    cheapest question you can ask about duplication."""
    views(spark, sf_dir, "documents")
    return spark.sql(_cluster_hist_sql("spark"))


# ---------------------------------------------------------------------------
# data_epoch_mix_plan — temperature-weighted token budget / epoch planner.
# ---------------------------------------------------------------------------

_MIX_BUDGET = 1_000_000  # planned training tokens


def _epoch_mix_sql(d: str) -> str:
    gen = "explode" if d == "spark" else "unnest"
    return f"""
WITH toks AS (
  SELECT source, {gen}(split(text, ' ')) AS word FROM {tbl('documents', d)}
),
n AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_tokens
  FROM toks WHERE word <> '' GROUP BY source
),
w AS (
  -- sqrt is IEEE-correctly-rounded (exact across engines); round-12 into
  -- DECIMAL so the normalizing sum is order-independent
  SELECT source, n_tokens,
         CAST(round(sqrt(CAST(n_tokens AS DOUBLE)), 12) AS DECIMAL(28,12)) AS wt
  FROM n
),
tot AS (SELECT SUM(wt) AS sw FROM w)
SELECT w.source, w.n_tokens,
       round(CAST(w.wt AS DOUBLE) / CAST(t.sw AS DOUBLE), 6) AS share,
       CAST(floor({_MIX_BUDGET} * (CAST(w.wt AS DOUBLE) / CAST(t.sw AS DOUBLE)))
            AS BIGINT) AS planned_tokens,
       {intdiv(
           f"(CAST(floor({_MIX_BUDGET} * (CAST(w.wt AS DOUBLE) / CAST(t.sw AS DOUBLE))) AS BIGINT) * 1000 + w.n_tokens - 1)",
           "w.n_tokens", d)} AS epochs_x1000
FROM w CROSS JOIN tot t
ORDER BY w.source
"""


@query("data_epoch_mix_plan", oracle=_epoch_mix_sql("duck"), tags=("llm", "curation", "planning"))
def data_epoch_mix_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix epoch planner: given a token budget and temperature-
    weighted source shares (w ∝ n^0.5 — the multilingual rebalancing rule
    of data_temperature_sample, here applied to SOURCES), how many tokens
    are drawn from each source and how many epochs of it does that imply
    (epochs > 1000‰ = the source repeats — the over-epoching signal the
    mix designer watches, per the data-constrained scaling literature).
    sqrt is correctly-rounded IEEE (exact both engines); weights round-12
    into a DECIMAL normalizing sum; floor() before every BIGINT cast;
    the ceil is an integer (a+b-1) DIV b. One token-count aggregation,
    one broadcast-sized weight table."""
    views(spark, sf_dir, "documents")
    return spark.sql(_epoch_mix_sql("spark"))


# ---------------------------------------------------------------------------
# llm_quality_calibration — classifier score vs rule-gate agreement.
# ---------------------------------------------------------------------------


def _quality_calibration_sql(d: str) -> str:
    from .corpus_ops import _qc_scores
    from .quality_ops import _gopher_sql

    # bin width 0.004 logit units: the length-normalized logits of the
    # 20-term model live in roughly [-0.02, 0.05], so ~250x resolves them
    bin_ = "least(CAST(12 AS BIGINT), greatest(CAST(-5 AS BIGINT), CAST(floor(logit * 250) AS BIGINT)))"
    return f"""
WITH {_qc_scores(d).lstrip()},
gop AS (SELECT doc_id, keep AS gate_keep FROM ({_gopher_sql(d)}) g)
SELECT {bin_} AS logit_bin,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN gate_keep THEN 1 ELSE 0 END) AS BIGINT) AS n_gate_pass,
       round(CAST(SUM(CASE WHEN gate_keep THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS gate_pass_rate
FROM qc JOIN gop ON gop.doc_id = qc.doc_id
GROUP BY {bin_}
ORDER BY logit_bin
"""


@query("llm_quality_calibration", oracle=_quality_calibration_sql("duck"), tags=("llm", "quality", "evaluation"))
def llm_quality_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier-vs-rules calibration: bucket the linear quality
    classifier's length-normalized logit into fixed-width bins and
    measure the Gopher rule-gate pass rate per bin — the reliability
    diagram that tells a curation team whether the cheap learned score
    AGREES with the expensive rule stack before they swap one for the
    other (CCNet pairs its fastText filter with rule gates the same
    way). Fixed-width bins, not NTILE: no global window, just two
    composed doc-level subqueries joined on the doc key."""
    views(spark, sf_dir, "documents")
    return spark.sql(_quality_calibration_sql("spark"))


# ---------------------------------------------------------------------------
# privacy_pii_density — PII hits per 1k tokens per source.
# ---------------------------------------------------------------------------


def _pii_density_sql(d: str) -> str:
    from .rag_ops import _EMAIL_PAT, _PHONE_PAT
    from .dialect import s as _s

    seeded = (
        f"CASE WHEN doc_id % 7 = 0 THEN concat(text, ' contact user', "
        f"{_s('doc_id', d)}, '@mail.example or call 555-01', "
        f"{_s('doc_id % 100', d)}) ELSE text END"
    )
    if d == "spark":
        def cnt(expr: str, pat: str) -> str:
            return f"regexp_count({expr}, '{pat}')"
    else:
        def cnt(expr: str, pat: str) -> str:
            return f"len(regexp_extract_all({expr}, '{pat}'))"

    ntok = "size(split(seeded, ' '))" if d == "spark" else "len(string_split(seeded, ' '))"
    return f"""
WITH seeded_t AS (
  SELECT doc_id, source, {seeded} AS seeded FROM {tbl('documents', d)}
),
per_doc AS (
  SELECT source,
         CAST({cnt('seeded', _EMAIL_PAT)} + {cnt('seeded', _PHONE_PAT)} AS BIGINT)
           AS n_pii,
         CAST({ntok} AS BIGINT) AS n_tokens
  FROM seeded_t
)
SELECT source,
       CAST(SUM(n_pii) AS BIGINT) AS n_pii,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       round(CAST(1000 AS DOUBLE) * SUM(n_pii) / SUM(n_tokens), 6)
         AS pii_per_1k_tokens
FROM per_doc
GROUP BY source
ORDER BY source
"""


@query("privacy_pii_density", oracle=_pii_density_sql("duck"), tags=("privacy", "text", "profiling"))
def privacy_pii_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII density per source — the triage view BEFORE ``text_pii_redact``
    runs: hits per 1000 tokens, per source, using the same email/phone
    patterns (and the same deterministic seeding) as the redaction
    operator, so the two queries reconcile exactly. A source whose
    density spikes gets routed to the scrubber first; sources at zero
    skip the regex pass entirely at 100 TB. One regexp projection +
    one source-keyed aggregation; the only division is the final rate."""
    views(spark, sf_dir, "documents")
    return spark.sql(_pii_density_sql("spark"))
