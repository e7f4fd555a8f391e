"""Round-5 corpus-curation operators: corpus-level exact-substring dedup
(the removal step of Lee et al. 2022), a codegen quality classifier (the
fastText-style gate of CCNet/RefinedWeb), temperature-scaled mixture
sampling, readability scoring, Zipf-fit corpus health, label-based
retrieval evals (NDCG, k-NN accuracy), and a k-anonymity audit.

Every query follows the house determinism contract (registry docstring):
two-dialect SQL with a DuckDB oracle, DECIMAL addends for every
order-sensitive sum, round(…, 12) on libm terms, floor() before
double→BIGINT casts, and 100 TB plan shapes — windows partitioned on
high-cardinality keys, tiny dimensions broadcast, top-k as TakeOrdered.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .dialect import inline_values, tbl, to_double_arr, dot, views
from .llm_ops import DIM
from .registry import query

# ---------------------------------------------------------------------------
# text_exact_substring_dedup — corpus-level removal spans (Lee et al. 2022).
# ---------------------------------------------------------------------------

_ESD_W = 8  # tokens per shingle — the paper's 50-token threshold scaled down


def _esd_positions(d: str) -> str:
    """occp(doc_id, pos BIGINT 0-based, span) — every stride-1 shingle WITH
    its position (text_dup_span_fraction's spine, plus the position the
    span-merge needs)."""
    if d == "spark":
        return f"""
occp AS (
  SELECT doc_id, CAST(i AS BIGINT) AS pos,
         concat_ws(' ', slice(w, i + 1, {_ESD_W})) AS span
  FROM (SELECT doc_id, split(text, ' ') AS w FROM {tbl('documents', d)}
        WHERE size(split(text, ' ')) >= {_ESD_W}) b
  LATERAL VIEW explode(sequence(0, size(w) - {_ESD_W})) t AS i
)"""
    return f"""
occp AS (
  SELECT doc_id, CAST(i AS BIGINT) AS pos,
         array_to_string(list_slice(w, i + 1, i + {_ESD_W}), ' ') AS span
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM {tbl('documents', d)}
        WHERE len(string_split(text, ' ')) >= {_ESD_W}) b,
       unnest(range(0, len(w) - {_ESD_W} + 1)) AS t(i)
)"""


def _esd_sql(d: str) -> str:
    arrlen = "size" if d == "spark" else "len"
    split = "split" if d == "spark" else "string_split"
    return f"""
WITH {_esd_positions(d)},
shared AS (
  SELECT span FROM occp GROUP BY span HAVING COUNT(DISTINCT doc_id) > 1
),
occ AS (
  SELECT o.doc_id, o.pos FROM occp o JOIN shared s ON s.span = o.span
),
flagged AS (
  SELECT doc_id, pos,
         CASE WHEN pos > COALESCE(MAX(pos + {_ESD_W}) OVER (
                  PARTITION BY doc_id ORDER BY pos
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                CAST(-1 AS BIGINT))
              THEN 1 ELSE 0 END AS new_span
  FROM occ
),
islands AS (
  SELECT doc_id, pos,
         SUM(new_span) OVER (PARTITION BY doc_id ORDER BY pos
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span_id
  FROM flagged
),
merged AS (
  SELECT doc_id, span_id,
         MIN(pos) AS span_start, MAX(pos) + {_ESD_W} AS span_end
  FROM islands GROUP BY doc_id, span_id
),
toks AS (
  SELECT doc_id, CAST({arrlen}({split}(text, ' ')) AS BIGINT) AS n_tokens
  FROM {tbl('documents', d)}
)
SELECT m.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_removal_spans,
       CAST(SUM(m.span_end - m.span_start) AS BIGINT) AS tokens_removed,
       t.n_tokens,
       round(CAST(SUM(m.span_end - m.span_start) AS DOUBLE) / t.n_tokens, 6)
         AS removed_frac
FROM merged m JOIN toks t ON t.doc_id = m.doc_id
GROUP BY m.doc_id, t.n_tokens
ORDER BY m.doc_id
"""


@query(
    "text_exact_substring_dedup",
    oracle=_esd_sql("duck"),
    tags=("llm", "text", "dedup"),
)
def text_exact_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level exact-substring dedup (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better", public) — the REMOVAL
    step, not just the statistic (`text_dup_span_fraction`): find every
    8-token span shared ACROSS documents and merge each document's hit
    positions into maximal removal spans (the interval-union a
    suffix-array dedup would cut out), reporting per-document span count,
    tokens removed, and removed fraction. Shape: stride-1 shingles with
    positions (cost ∝ tokens) → span-hash groupBy keeping cross-document
    spans only (map-side combinable, keys are high-cardinality span text)
    → per-document interval merge via the classic islands construction
    (running MAX(pos+w) over a doc_id-partitioned window — never a global
    window). At 100 TB every shuffle keys on span text or doc_id; nothing
    is quadratic in corpus size."""
    views(spark, sf_dir, "documents")
    return spark.sql(_esd_sql("spark"))


# ---------------------------------------------------------------------------
# llm_quality_classifier — linear (fastText-style) quality gate as codegen.
# ---------------------------------------------------------------------------

# A linear text-quality model: hand-pinned weights over lexical features —
# prose function words vote up, boilerplate/webspam markers vote down
# (the shape of CCNet's fastText filter / RefinedWeb's URL+content rules).
# Weights are exact DECIMAL literals so per-document score sums are
# order-independent.
_QC_WEIGHTS: list[tuple[str, str]] = [
    ("the", "0.4"), ("and", "0.3"), ("of", "0.3"), ("to", "0.25"),
    ("a", "0.2"), ("in", "0.2"), ("is", "0.15"), ("that", "0.15"),
    ("with", "0.1"), ("for", "0.1"),
    ("click", "-1.5"), ("subscribe", "-1.5"), ("javascript", "-1.25"),
    ("buy", "-1.0"), ("free", "-1.0"), ("cookie", "-0.75"),
    ("login", "-0.75"), ("copyright", "-0.5"), ("http", "-0.5"),
    ("www", "-0.5"),
]
_QC_TAU = "0.02"  # keep gate on the length-normalized logit


def _qc_weight_rows() -> str:
    return ", ".join(
        f"('{t}', CAST({w} AS DECIMAL(10,6)))" for t, w in _QC_WEIGHTS
    )


def _qc_toks(d: str) -> str:
    if d == "spark":
        return f"""
toks AS (
  SELECT doc_id, lower(word) AS term
  FROM (SELECT doc_id, explode(split(text, ' ')) AS word
        FROM {tbl('documents', d)})
)"""
    return f"""
toks AS (
  SELECT doc_id, lower(word) AS term
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
        FROM {tbl('documents', d)})
)"""


def _qc_scores(d: str) -> str:
    """doc-level CTE chain ending in qc(doc_id, n_tokens, n_matched, logit)
    — shared verbatim by the standalone query and the llm_filter_stack
    composition."""
    return f"""
qweights AS ({inline_values(_qc_weight_rows(), 'w', 'term, wt', d)}),
{_qc_toks(d).lstrip()},
qnt AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens FROM toks GROUP BY doc_id
),
qhits AS (
  SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_matched,
         CAST(SUM(w.wt) AS DECIMAL(18,6)) AS raw
  FROM toks t JOIN qweights w ON w.term = t.term
  GROUP BY t.doc_id
),
qc AS (
  SELECT n.doc_id, n.n_tokens,
         CAST(COALESCE(h.n_matched, 0) AS BIGINT) AS n_matched,
         round(CAST(COALESCE(h.raw, CAST(0 AS DECIMAL(18,6))) AS DOUBLE)
               / n.n_tokens, 12) AS logit
  FROM qnt n LEFT JOIN qhits h ON h.doc_id = n.doc_id
)"""


def _qc_sql(d: str) -> str:
    return f"""
WITH {_qc_scores(d).lstrip()}
SELECT doc_id, n_tokens, n_matched, logit,
       logit > CAST({_QC_TAU} AS DOUBLE) AS keep
FROM qc
ORDER BY doc_id
"""


@query(
    "llm_quality_classifier",
    oracle=_qc_sql("duck"),
    tags=("llm", "quality"),
)
def llm_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear quality-classifier scoring as pure codegen — the last big
    curation-stack gate (CCNet applies a fastText model the same way:
    w·x over token counts, Wenzek et al. 2020, public). The 20-term
    weight table is an inline literal dimension that BROADCASTS into the
    token stream; the dot product is the grouped SUM of matched weights
    (map-side combinable, exact DECIMAL addends); the length-normalized
    logit is one double division rounded to 12. No Python anywhere, no
    window over the corpus — per-document cost is token count, the
    shuffle keys on doc_id. The same CTE chain plugs into
    ``llm_filter_stack`` as its fourth gate."""
    views(spark, sf_dir, "documents")
    return spark.sql(_qc_sql("spark"))


# ---------------------------------------------------------------------------
# data_temperature_sample — temperature-scaled mixture weights.
# ---------------------------------------------------------------------------

_TS_BUDGET = 100_000  # documents per 100k drawn under the tempered mixture


def _temp_sample_sql(d: str) -> str:
    # alpha = 0.5: w_l = n_l^0.5 = sqrt(n_l). sqrt is IEEE correctly-rounded
    # (bit-identical across libms, unlike pow), so the tempered weight needs
    # no epsilon discipline; the single normalizing division happens once in
    # DOUBLE, addends cross the sum as exact DECIMALs.
    return f"""
WITH lc AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM {tbl('documents', d)} GROUP BY lang
),
w AS (
  SELECT lang, n_docs,
         CAST(round(sqrt(CAST(n_docs AS DOUBLE)), 12) AS DECIMAL(28,12)) AS wt
  FROM lc
),
tot AS (
  SELECT SUM(wt) AS wsum, SUM(n_docs) AS n_total FROM w
)
SELECT w.lang, w.n_docs,
       round(CAST(w.n_docs AS DOUBLE) / t.n_total, 12) AS natural_share,
       round(CAST(w.wt AS DOUBLE) / CAST(t.wsum AS DOUBLE), 12)
         AS tempered_share,
       CAST(floor(CAST(w.wt AS DOUBLE) / CAST(t.wsum AS DOUBLE)
                  * {_TS_BUDGET}) AS BIGINT) AS quota_per_100k
FROM w CROSS JOIN tot t
ORDER BY w.lang
"""


@query(
    "data_temperature_sample",
    oracle=_temp_sample_sql("duck"),
    tags=("llm", "sampling"),
)
def data_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixture weights (alpha = 0.5) per language — the
    standard multilingual-corpus rebalancing (w_l ∝ p_l^alpha, used by
    mBERT/XLM-R and LLM data mixes, public) that upsamples tail languages
    without letting the head dominate. One grouped count, one broadcast
    of the one-row normalizer (CROSS JOIN of a scalar aggregate → BNLJ),
    exact DECIMAL weight sums, floor() before the BIGINT quota cast. The
    deterministic quota column is what a downstream sampler (e.g.
    ``data_stratified_sample``) consumes."""
    views(spark, sf_dir, "documents")
    return spark.sql(_temp_sample_sql("spark"))


# ---------------------------------------------------------------------------
# text_readability_score — Flesch reading ease from count features.
# ---------------------------------------------------------------------------


def _readability_sql(d: str) -> str:
    if d == "spark":
        n_words = "CAST(size(split(text, ' ')) AS BIGINT)"
        n_sent = "CAST(size(regexp_extract_all(text, '[.!?]', 0)) AS BIGINT)"
        n_syll = "CAST(size(regexp_extract_all(lower(text), '[aeiouy]+', 0)) AS BIGINT)"
    else:
        n_words = "CAST(len(string_split(text, ' ')) AS BIGINT)"
        n_sent = "CAST(len(regexp_extract_all(text, '[.!?]')) AS BIGINT)"
        n_syll = "CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT)"
    return f"""
WITH feats AS (
  SELECT doc_id, {n_words} AS n_words,
         GREATEST({n_sent}, CAST(1 AS BIGINT)) AS n_sentences,
         GREATEST({n_syll}, CAST(1 AS BIGINT)) AS n_syllables
  FROM {tbl('documents', d)}
),
scored AS (
  SELECT doc_id, n_words, n_sentences, n_syllables,
         round(CAST(206.835 AS DOUBLE)
               - CAST(1.015 AS DOUBLE)
                 * (CAST(n_words AS DOUBLE) / n_sentences)
               - CAST(84.6 AS DOUBLE)
                 * (CAST(n_syllables AS DOUBLE) / n_words), 6) AS flesch
  FROM feats WHERE n_words > 0
)
SELECT doc_id, n_words, n_sentences, n_syllables, flesch,
       CASE WHEN flesch >= CAST(60 AS DOUBLE) THEN 'easy'
            WHEN flesch >= CAST(30 AS DOUBLE) THEN 'standard'
            ELSE 'difficult' END AS band
FROM scored
ORDER BY doc_id
"""


@query(
    "text_readability_score",
    oracle=_readability_sql("duck"),
    tags=("llm", "text", "quality"),
)
def text_readability_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease score per document (Flesch 1948, public) from
    three count features — words (whitespace tokens), sentences
    (terminal-punctuation matches), syllables (vowel-group proxy, the
    standard heuristic). The formula is a fixed-parenthesization double
    expression over exact integer counts, so both engines produce
    identical bits; the band CASE compares the ROUNDED score. Zero-
    shuffle codegen: one projection over the corpus scan — readability
    is a common pretraining quality signal next to the Gopher gates."""
    views(spark, sf_dir, "documents")
    return spark.sql(_readability_sql("spark"))


# ---------------------------------------------------------------------------
# text_zipf_fit — rank-frequency power-law fit (corpus health check).
# ---------------------------------------------------------------------------

_ZIPF_V = 100  # top-V vocabulary used for the fit


def _zipf_sql(d: str) -> str:
    unnest = (
        f"SELECT doc_id, explode(split(text, ' ')) AS word FROM {tbl('documents', d)}"
        if d == "spark"
        else f"SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM {tbl('documents', d)}"
    )
    dsum = "SUM(CAST(round({x}, 12) AS DECIMAL(28,12)))"
    return f"""
WITH tf AS (
  SELECT lower(word) AS term, CAST(COUNT(*) AS BIGINT) AS freq
  FROM ({unnest}) t GROUP BY lower(word)
),
top AS (
  SELECT term, freq FROM tf ORDER BY freq DESC, term LIMIT {_ZIPF_V}
),
ranked AS (
  SELECT freq,
         ROW_NUMBER() OVER (ORDER BY freq DESC, term) AS rnk
  FROM top
),
pts AS (
  SELECT round(ln(CAST(rnk AS DOUBLE)), 12) AS x,
         round(ln(CAST(freq AS DOUBLE)), 12) AS y
  FROM ranked
),
sums AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST({dsum.format(x='x')} AS DOUBLE) AS sx,
         CAST({dsum.format(x='y')} AS DOUBLE) AS sy,
         CAST({dsum.format(x='x * y')} AS DOUBLE) AS sxy,
         CAST({dsum.format(x='x * x')} AS DOUBLE) AS sxx
  FROM pts
),
fit AS (
  SELECT n,
         (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
         sx, sy
  FROM sums
)
SELECT n AS n_terms,
       round(slope, 12) AS zipf_slope,
       round((sy - slope * sx) / n, 6) AS intercept
FROM fit
"""


@query("text_zipf_fit", oracle=_zipf_sql("duck"), tags=("llm", "text", "profiling"))
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency fit over the top-100 vocabulary: OLS slope of
    ln(freq) on ln(rank) — natural text sits near −1; synthetic, boiler-
    plate-heavy, or template-generated corpora drift off it, making the
    slope a cheap corpus-health tripwire (Zipf 1949; used as a data-
    quality diagnostic in corpus linguistics, public). The term-frequency
    aggregation is map-side combinable on the high-cardinality term key;
    the global ORDER BY+LIMIT is a TakeOrdered heap, and the only global
    rank window runs over those 100 candidate rows (bounded, allowlisted
    in the plan lint like the RRF fusions). ln() terms round to 12 and
    cross the regression sums as exact DECIMALs."""
    views(spark, sf_dir, "documents")
    return spark.sql(_zipf_sql("spark"))


# ---------------------------------------------------------------------------
# rag_ndcg_eval — label-relevance NDCG@10 of the cosine ranking.
# ---------------------------------------------------------------------------

_NDCG_K = 10
_NDCG_QMOD = 25  # query cohort: vec_id % 25 == 0 (mirrors the other evals)


def _ndcg_sql(d: str) -> str:
    series = (
        f"LATERAL VIEW explode(sequence(1, {_NDCG_K})) t AS i"
        if d == "spark"
        else f", unnest(range(1, {_NDCG_K} + 1)) AS t(i)"
    )
    log2 = "(ln(CAST(i + 1 AS DOUBLE)) / ln(CAST(2 AS DOUBLE)))"
    rlog2 = "(ln(CAST(rnk + 1 AS DOUBLE)) / ln(CAST(2 AS DOUBLE)))"
    return f"""
WITH base AS (
  SELECT vec_id, label, {to_double_arr('embedding', d)} AS emb
  FROM {tbl('embeddings', d)}
),
normed AS (
  SELECT vec_id, label, emb, sqrt({dot('emb', 'emb', DIM, d)}) AS nrm
  FROM base
),
ranked AS (
  SELECT q.vec_id AS query_id, q.label AS query_label, n.label AS nb_label,
         ROW_NUMBER() OVER (
           PARTITION BY q.vec_id
           ORDER BY {dot('q.emb', 'n.emb', DIM, d)} / (q.nrm * n.nrm) DESC,
                    n.vec_id
         ) AS rnk
  FROM normed q JOIN normed n ON q.vec_id <> n.vec_id
  WHERE q.vec_id % {_NDCG_QMOD} = 0
),
dcg AS (
  SELECT query_id,
         CAST(SUM(CASE WHEN nb_label = query_label
                       THEN CAST(round(CAST(1 AS DOUBLE) / {rlog2}, 12)
                                 AS DECIMAL(28,12))
                       ELSE CAST(0 AS DECIMAL(28,12)) END) AS DOUBLE) AS dcg_v,
         CAST(SUM(CASE WHEN nb_label = query_label THEN 1 ELSE 0 END)
              AS BIGINT) AS n_rel_at_k
  FROM ranked WHERE rnk <= {_NDCG_K}
  GROUP BY query_id
),
nrel AS (
  SELECT q.vec_id AS query_id,
         CAST(COUNT(*) AS BIGINT) AS m
  FROM normed q JOIN normed n
    ON n.label = q.label AND n.vec_id <> q.vec_id
  WHERE q.vec_id % {_NDCG_QMOD} = 0
  GROUP BY q.vec_id
),
idcg AS (
  SELECT r.query_id,
         CAST(SUM(CAST(round(CAST(1 AS DOUBLE) / {log2}, 12)
                       AS DECIMAL(28,12))) AS DOUBLE) AS idcg_v
  FROM (SELECT query_id, m FROM nrel) r
  {series}
  WHERE i <= LEAST(r.m, CAST({_NDCG_K} AS BIGINT))
  GROUP BY r.query_id
)
SELECT d2.query_id, d2.n_rel_at_k,
       round(d2.dcg_v / i2.idcg_v, 12) AS ndcg_at_10
FROM dcg d2 JOIN idcg i2 ON i2.query_id = d2.query_id
ORDER BY d2.query_id
"""


@query(
    "rag_ndcg_eval",
    oracle=_ndcg_sql("duck"),
    tags=("llm", "similarity", "evaluation"),
)
def rag_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 of the cosine ranking under label relevance (Järvelin &
    Kekäläinen 2002, public): for each query vector, a retrieved
    neighbor is relevant iff it shares the query's class label — the
    standard labeled-retrieval eval that complements the self-recall
    floors (``sim_ann_recall_eval`` measures index fidelity; this
    measures whether the EMBEDDING SPACE ranks semantically). One
    query×corpus pass (documented exact eval baseline, query side
    filtered to the 1/25 cohort), rank windows partitioned by query_id;
    the per-rank 1/log2 gains round to 12 and sum through DECIMAL; the
    ideal DCG comes from a 10-row generated series joined under the
    per-query relevant-count cap — O(queries·k), broadcast-sized.

    Spark path (r13): ``normed`` persists once (the oracle text re-plans
    the scan + 64-term norm for all four references), and the
    relevant-count side derives from a per-label histogram — m =
    count(label) − 1 — instead of the oracle's same-label self-join
    (identical integers: each query's same-label non-self row count IS
    its label count minus itself; a query whose label is unique drops
    out of idcg in both forms via the i <= m filter). Guide §2.3/§5;
    plan: 8→1 scans, the label self-join exchange removed."""
    views(spark, sf_dir, "embeddings")
    normed = spark.sql(
        f"""
SELECT vec_id, label, emb, sqrt({dot('emb', 'emb', DIM, 'spark')}) AS nrm
FROM (SELECT vec_id, label, {to_double_arr('embedding', 'spark')} AS emb
      FROM {tbl('embeddings', 'spark')})
"""
    ).persist()
    normed.createOrReplaceTempView("slsp_ndcg_normed")
    log2 = "(ln(CAST(i + 1 AS DOUBLE)) / ln(CAST(2 AS DOUBLE)))"
    rlog2 = "(ln(CAST(rnk + 1 AS DOUBLE)) / ln(CAST(2 AS DOUBLE)))"
    series = f"LATERAL VIEW explode(sequence(1, {_NDCG_K})) t AS i"
    return spark.sql(
        f"""
WITH normed AS (SELECT * FROM slsp_ndcg_normed),
ranked AS (
  SELECT q.vec_id AS query_id, q.label AS query_label, n.label AS nb_label,
         ROW_NUMBER() OVER (
           PARTITION BY q.vec_id
           ORDER BY {dot('q.emb', 'n.emb', DIM, 'spark')} / (q.nrm * n.nrm) DESC,
                    n.vec_id
         ) AS rnk
  FROM normed q JOIN normed n ON q.vec_id <> n.vec_id
  WHERE q.vec_id % {_NDCG_QMOD} = 0
),
dcg AS (
  SELECT query_id,
         CAST(SUM(CASE WHEN nb_label = query_label
                       THEN CAST(round(CAST(1 AS DOUBLE) / {rlog2}, 12)
                                 AS DECIMAL(28,12))
                       ELSE CAST(0 AS DECIMAL(28,12)) END) AS DOUBLE) AS dcg_v,
         CAST(SUM(CASE WHEN nb_label = query_label THEN 1 ELSE 0 END)
              AS BIGINT) AS n_rel_at_k
  FROM ranked WHERE rnk <= {_NDCG_K}
  GROUP BY query_id
),
lc AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS c FROM normed GROUP BY label),
nrel AS (
  SELECT q.vec_id AS query_id, lc.c - 1 AS m
  FROM normed q JOIN lc ON lc.label = q.label
  WHERE q.vec_id % {_NDCG_QMOD} = 0
),
idcg AS (
  SELECT r.query_id,
         CAST(SUM(CAST(round(CAST(1 AS DOUBLE) / {log2}, 12)
                       AS DECIMAL(28,12))) AS DOUBLE) AS idcg_v
  FROM (SELECT query_id, m FROM nrel) r
  {series}
  WHERE i <= LEAST(r.m, CAST({_NDCG_K} AS BIGINT))
  GROUP BY r.query_id
)
SELECT d2.query_id, d2.n_rel_at_k,
       round(d2.dcg_v / i2.idcg_v, 12) AS ndcg_at_10
FROM dcg d2 JOIN idcg i2 ON i2.query_id = d2.query_id
ORDER BY d2.query_id
"""
    )


# ---------------------------------------------------------------------------
# sim_knn_label_accuracy — k-NN classification accuracy of the space.
# ---------------------------------------------------------------------------

_KNN_K = 5
_KNN_QMOD = 25


def _knn_acc_sql(d: str) -> str:
    return f"""
WITH base AS (
  SELECT vec_id, label, {to_double_arr('embedding', d)} AS emb
  FROM {tbl('embeddings', d)}
),
normed AS (
  SELECT vec_id, label, emb, sqrt({dot('emb', 'emb', DIM, d)}) AS nrm
  FROM base
),
ranked AS (
  SELECT q.vec_id AS query_id, q.label AS true_label, n.label AS nb_label,
         ROW_NUMBER() OVER (
           PARTITION BY q.vec_id
           ORDER BY {dot('q.emb', 'n.emb', DIM, d)} / (q.nrm * n.nrm) DESC,
                    n.vec_id
         ) AS rnk
  FROM normed q JOIN normed n ON q.vec_id <> n.vec_id
  WHERE q.vec_id % {_KNN_QMOD} = 0
),
votes AS (
  SELECT query_id, true_label, nb_label,
         CAST(COUNT(*) AS BIGINT) AS n_votes
  FROM ranked WHERE rnk <= {_KNN_K}
  GROUP BY query_id, true_label, nb_label
),
pred AS (
  SELECT query_id, true_label,
         max_by(nb_label, n_votes * 1000 - nb_label) AS pred_label,
         MAX(n_votes) AS top_votes
  FROM votes GROUP BY query_id, true_label
)
SELECT query_id, true_label, pred_label, top_votes,
       pred_label = true_label AS correct
FROM pred
ORDER BY query_id
"""


@query(
    "sim_knn_label_accuracy",
    oracle=_knn_acc_sql("duck"),
    tags=("llm", "similarity", "evaluation"),
)
def sim_knn_label_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN (k=5) classification accuracy of the embedding space: majority
    label among each query's five nearest cosine neighbors vs its own
    label — the classic intrinsic embedding eval (label purity of local
    neighborhoods, Cover & Hart 1967, public). Same bounded
    query-cohort × corpus pass as the recall evals; the majority vote is
    a map-side-combinable count plus an arg-max on a packed
    (votes, label) key — ``max_by(label, votes*1000 − label)`` gives the
    deterministic most-votes-then-lowest-label winner in BOTH dialects
    with no window at all."""
    views(spark, sf_dir, "embeddings")
    return spark.sql(_knn_acc_sql("spark"))


# ---------------------------------------------------------------------------
# privacy_k_anonymity — quasi-identifier group-size audit.
# ---------------------------------------------------------------------------

_KA_K = 5
_KA_K_STRICT = 10


def _k_anon_sql(d: str) -> str:
    return f"""
WITH g AS (
  SELECT c_nationkey, c_mktsegment, CAST(COUNT(*) AS BIGINT) AS grp_n
  FROM {tbl('customer', d)}
  GROUP BY c_nationkey, c_mktsegment
)
SELECT c_nationkey, c_mktsegment, grp_n,
       grp_n >= {_KA_K} AS k{_KA_K}_ok,
       grp_n >= {_KA_K_STRICT} AS k{_KA_K_STRICT}_ok
FROM g
ORDER BY c_nationkey, c_mktsegment
"""


@query(
    "privacy_k_anonymity",
    oracle=_k_anon_sql("duck"),
    tags=("privacy", "profiling"),
)
def privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the (nation, market-segment) quasi-identifier
    pair (Sweeney 2002, public): every equivalence class with its size
    and k=5 / k=10 conformance flags — the re-identification risk report
    a privacy review runs before releasing training data that includes
    user attributes. One grouped count on the QI key (map-side
    combinable); output cardinality is the QI domain, not the table —
    at 100 TB this is a single shuffle of partial counts."""
    views(spark, sf_dir, "customer")
    return spark.sql(_k_anon_sql("spark"))
