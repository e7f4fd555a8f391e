"""Round-6 waves 4–6: training-mix governance — the audits and gates that
sit between a deduplicated corpus and an actual training run.

Wave 5 adds the split/lateness audits (``ops_watermark_planner``,
``data_split_leakage``, ``dedup_survivorship_audit``); wave 6 the release
gates (``llm_classifier_threshold_sweep``, ``mm_scene_segments``,
``privacy_k_suppression_curve``). Wave-4 inventory below.

* **Shuffle/shard audit** (``data_shuffle_shard_audit``): a training
  pipeline's "global shuffle" is a deterministic hash assignment of every
  document to an (epoch, shard); what matters operationally is whether the
  shuffle actually MIXES — a shard dominated by one source reproduces the
  source-run pathology shuffling exists to kill. Per-(epoch, shard) doc
  counts, distinct sources, and the max single-source share, all from one
  two-level aggregation over a seeded 60-bit hash.
* **License gating** (``web_license_gate``): provenance-based keep/drop on
  license markers (CC / public-domain vs all-rights-reserved) — the legal
  sibling of the quality gates; classification must be deterministic and
  cheap (pure LIKE-class predicates, no Python).
* **Dup x quality interaction** (``dedup_quality_interaction``): do
  duplicates concentrate in low-quality documents? Joint distribution of
  the exact-dup flag (cluster size > 1 over the planted-dup corpus) and
  the Gopher rule-gate verdict of each document's canonical original —
  the cross-audit that tells a curation team whether dedup and quality
  filtering remove the SAME rows (wasted passes) or different ones.
* **Semantic-dedup threshold sweep** (``emb_dedup_threshold_sweep``):
  pair yield and docs-affected at each candidate cosine threshold, in one
  pass over LSH-bucketed candidates — the sensitivity curve a team reads
  BEFORE committing a threshold to a 100 TB dedup campaign (SemDeDup-style
  tuning), never an all-pairs scan.
* **DP count release** (``privacy_dp_count_release``): Laplace-noised
  per-group counts (Dwork et al. 2006) with a DETERMINISTIC seeded noise
  draw — inverse-CDF over a 60-bit key hash — so the release is
  reproducible and cross-engine exact (the house round-12-ln contract).

Determinism contract as per the registry docstring: counts CAST to BIGINT,
one trailing DOUBLE division per ratio, ln() terms round(…, 12), literal
doubles written CAST(x AS DOUBLE) (Spark parses bare decimals as DECIMAL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions import hashing
from .dialect import (
    dot,
    dot_const,
    epoch_s,
    hash64,
    inline_values,
    intdiv,
    s,
    tbl,
    views,
)
from .llm_ops import DIM, _emb_corpus, _hyperplane_signs, _N_PLANES
from .registry import query

# ---------------------------------------------------------------------------
# data_shuffle_shard_audit — does the epoch shuffle actually mix sources?
# ---------------------------------------------------------------------------

_N_EPOCHS = 2
_N_SHARDS = 8


def _shuffle_audit_sql(d: str) -> str:
    epochs = ", ".join(f"({e})" for e in range(1, _N_EPOCHS + 1))
    shard_key = hash64(f"concat({s('doc_id', d)}, ':', {s('e.epoch', d)})", d)
    return f"""
WITH epochs AS ({inline_values(epochs, 'e', 'epoch', d)}),
assigned AS (
  SELECT e.epoch, ({shard_key}) % {_N_SHARDS} AS shard, doc.source
  FROM {tbl('documents', d)} doc CROSS JOIN epochs e
),
by_src AS (
  SELECT epoch, shard, source, CAST(COUNT(*) AS BIGINT) AS n
  FROM assigned GROUP BY epoch, shard, source
)
SELECT epoch, shard,
       CAST(SUM(n) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_sources,
       -- share rounded half-up at 6 decimals in INTEGER arithmetic:
       -- round(CAST(MAX(n) AS DOUBLE)/SUM(n), 6) diverges across engines
       -- when the exact ratio lands on a rounding tie (41/640 = .0640625
       -- at sf0.1: Spark's shortest-decimal HALF_UP says .064063, DuckDB's
       -- scaled-double says .064062). (a*2M + b) DIV (2b) is the same
       -- half-up rule with no doubles anywhere near a tie; the final /1e6
       -- is one IEEE division of identical integers — bit-exact.
       CAST({intdiv('(MAX(n) * 2000000 + SUM(n))', '(2 * SUM(n))', d)} AS DOUBLE)
         / 1000000 AS max_source_share
FROM by_src
GROUP BY epoch, shard
ORDER BY epoch, shard
"""


@query("data_shuffle_shard_audit", oracle=_shuffle_audit_sql("duck"), tags=("llm", "curation", "profiling"))
def data_shuffle_shard_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-shuffle shard audit: every document is deterministically
    assigned to a shard per epoch via a salted 60-bit hash (the
    hash-assignment that IS a training pipeline's global shuffle — re-keyed
    per epoch so epochs see different orders), then each (epoch, shard)
    reports its size, source diversity, and max single-source share. A
    share near 1/n_sources means the shuffle mixes; a share near 1 means
    source runs survived. Two map-side-combinable aggregations over a
    projected (epoch, shard, source) triple — no window, no join beyond
    the literal epoch spine; at 100 TB this is one shuffle keyed by
    (epoch, shard, source), ~|shards|·|sources| groups."""
    views(spark, sf_dir, "documents")
    return spark.sql(_shuffle_audit_sql("spark"))


# ---------------------------------------------------------------------------
# web_license_gate — license-marker keep/drop classification.
# ---------------------------------------------------------------------------


def _license_gate_sql(d: str) -> str:
    # Deterministic seeding (the privacy_pii_density pattern): the driver's
    # documents carry no license text, so plant markers on a fixed residue
    # scheme — the classifier below then runs the REAL logic.
    seeded = (
        "CASE WHEN doc_id % 11 = 0 THEN concat(text, ' Licensed under the"
        " Creative Commons Attribution 4.0 license.')"
        " WHEN doc_id % 11 = 1 THEN concat(text, ' This work is dedicated"
        " to the Public Domain.')"
        " WHEN doc_id % 11 = 2 THEN concat(text, ' Copyright - All Rights"
        " Reserved.')"
        " ELSE text END"
    )
    return f"""
WITH seeded_t AS (
  SELECT doc_id, source, {seeded} AS text FROM {tbl('documents', d)}
),
classified AS (
  SELECT doc_id, source,
         CASE WHEN lower(text) LIKE '%creative commons%'
                OR lower(text) LIKE '%cc-by%'          THEN 'cc'
              WHEN lower(text) LIKE '%public domain%'  THEN 'public_domain'
              WHEN lower(text) LIKE '%all rights reserved%' THEN 'restricted'
              ELSE 'unmarked' END AS license
  FROM seeded_t
)
SELECT source, license,
       (license IN ('cc', 'public_domain')) AS keep,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM classified
GROUP BY source, license
ORDER BY source, license
"""


@query("web_license_gate", oracle=_license_gate_sql("duck"), tags=("web", "curation", "governance"))
def web_license_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """License-marker gate: classify each document by the rights markers in
    its text (Creative-Commons / public-domain → keep; all-rights-reserved
    → drop; unmarked → policy decision) and report the per-source keep/drop
    mix — the provenance gate a compliant corpus build runs alongside the
    quality gates. Markers are planted deterministically (the driver corpus
    has none), the classifier is the real logic: ordered LIKE-class
    predicates, pure codegen — at 100 TB this costs one text scan and a
    tiny aggregation, no Python, no join."""
    views(spark, sf_dir, "documents")
    return spark.sql(_license_gate_sql("spark"))


# ---------------------------------------------------------------------------
# dedup_quality_interaction — do duplicates concentrate in low quality?
# ---------------------------------------------------------------------------


def _dup_quality_sql(d: str) -> str:
    from .llm_ops import _doc_corpus
    from .quality_ops import _gopher_sql

    return f"""
WITH corpus AS ({_doc_corpus(d)}),
hashed AS (
  SELECT doc_id, {hashing.sha256_hex('text', d)} AS h FROM corpus
),
sizes AS (SELECT h, COUNT(*) AS sz FROM hashed GROUP BY h),
flagged AS (
  SELECT hashed.doc_id, (sizes.sz > 1) AS is_dup
  FROM hashed JOIN sizes ON sizes.h = hashed.h
),
gop AS (SELECT doc_id, keep AS gate_keep FROM ({_gopher_sql(d)}) g),
joined AS (
  -- planted docs (+1M/+2M ids) inherit the verdict of their canonical
  -- original: the audit asks about the ORIGINAL's quality
  SELECT f.is_dup, g.gate_keep
  FROM flagged f JOIN gop g ON g.doc_id = f.doc_id % 1000000
),
agg AS (
  SELECT is_dup, gate_keep, CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM joined GROUP BY is_dup, gate_keep
),
tot AS (SELECT SUM(n_docs) AS nt FROM agg)
SELECT a.is_dup, a.gate_keep, a.n_docs,
       round(CAST(a.n_docs AS DOUBLE) / t.nt, 6) AS share
FROM agg a CROSS JOIN tot t
ORDER BY is_dup, gate_keep
"""


@query("dedup_quality_interaction", oracle=_dup_quality_sql("duck"), tags=("llm", "dedup", "quality"))
def dedup_quality_interaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Joint distribution of the exact-dup flag and the Gopher rule-gate
    verdict — the interaction audit that tells a curation team whether
    dedup and quality filtering remove the SAME documents (one pass could
    subsume the other) or disjoint sets (both passes pay for themselves).
    Dup flags come from content-hash cluster sizes over the planted-dup
    corpus; quality verdicts from the canonical original (id mod 1e6).
    The final share divides by a broadcast single-row total — no window
    anywhere in the plan.

    Spark path (r13): as one SQL text, CTE inlining re-ran sha256 over
    the tripled corpus twice (sizes + flagged), and the 1-row ``tot``
    re-planned the ENTIRE chain — hashing, Gopher gate, both joins — a
    second time (measured: 14 parquet scans / 6 exchanges). ``hashed``
    is persisted (one sha256 pass), and ``tot`` derives from the
    persisted 4-row ``agg`` (guide §2.4/§5; plan: 14→4 scans)."""
    from pyspark.sql import functions as F

    from .llm_ops import _doc_corpus
    from .quality_ops import _gopher_sql

    views(spark, sf_dir, "documents")
    # CTE-free persisted plan (CacheManager cannot substitute WithCTE
    # plans — the corpus union rides a FROM subquery)
    hashed = spark.sql(
        f"SELECT doc_id, {hashing.sha256_hex('text', 'spark')} AS h "
        f"FROM ({_doc_corpus('spark')}) corpus"
    ).persist()
    hashed.createOrReplaceTempView("slsp_dq_hashed")
    # the 4-row agg materializes via localCheckpoint (its own plan carries
    # CTEs, so a persist would not substitute into the final consumer)
    agg = spark.sql(
        f"""
WITH sizes AS (SELECT h, COUNT(*) AS sz FROM slsp_dq_hashed GROUP BY h),
flagged AS (
  SELECT t.doc_id, (sizes.sz > 1) AS is_dup
  FROM slsp_dq_hashed t JOIN sizes ON sizes.h = t.h
),
gop AS (SELECT doc_id, keep AS gate_keep FROM ({_gopher_sql('spark')}) g),
joined AS (
  SELECT f.is_dup, g.gate_keep
  FROM flagged f JOIN gop g ON g.doc_id = f.doc_id % 1000000
)
SELECT is_dup, gate_keep, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM joined GROUP BY is_dup, gate_keep
"""
    ).localCheckpoint(eager=True)
    agg.createOrReplaceTempView("slsp_dq_agg")
    # the total rides a view reference rather than agg.crossJoin(agg.agg):
    # the direct self-referential form hit an analyzer UnresolvedException
    # (exprId on unresolved object) intermittently at sf0.1
    return spark.sql(
        """
WITH tot AS (SELECT SUM(n_docs) AS nt FROM slsp_dq_agg)
SELECT a.is_dup, a.gate_keep, a.n_docs,
       round(CAST(a.n_docs AS DOUBLE) / t.nt, 6) AS share
FROM slsp_dq_agg a CROSS JOIN tot t
ORDER BY a.is_dup, a.gate_keep
"""
    )


# ---------------------------------------------------------------------------
# emb_dedup_threshold_sweep — pair yield per candidate cosine threshold.
# ---------------------------------------------------------------------------

_SWEEP_THRESHOLDS = ["0.80", "0.85", "0.90", "0.95", "0.99"]


def _sweep_pairs_sql(d: str) -> str:
    """LSH-bucketed candidate pairs with exact cosine — the corpus-scale
    piece of the sweep, shared by the oracle's WITH and the Spark path's
    persisted diamond."""
    bucket_bits = ", ".join(
        f"(CASE WHEN {dot_const('emb', _hyperplane_signs(p), d)} >= 0 THEN '1' ELSE '0' END)"
        for p in range(_N_PLANES)
    )
    return f"""
WITH corpus AS ({_emb_corpus(d)}),
normed AS (
  SELECT vec_id, emb, sqrt({dot('emb', 'emb', DIM, d)}) AS nrm,
         concat({bucket_bits}) AS bucket
  FROM corpus
)
SELECT * FROM (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         {dot('a.emb', 'b.emb', DIM, d)} / (a.nrm * b.nrm) AS cos_sim
  FROM normed a JOIN normed b
    ON a.bucket = b.bucket AND a.vec_id < b.vec_id
) p
WHERE cos_sim >= CAST({_SWEEP_THRESHOLDS[0]} AS DOUBLE)"""


def _threshold_sweep_sql(d: str) -> str:
    thr_rows = ", ".join(f"(CAST({t} AS DOUBLE))" for t in _SWEEP_THRESHOLDS)
    return f"""
WITH pairs AS ({_sweep_pairs_sql(d)}),
thr AS ({inline_values(thr_rows, 't', 'threshold', d)}),
hits AS (
  SELECT t.threshold, p.vec_a, p.vec_b
  FROM pairs p CROSS JOIN thr t
  WHERE p.cos_sim >= t.threshold
),
docs AS (
  SELECT threshold, vec_a AS v FROM hits
  UNION
  SELECT threshold, vec_b AS v FROM hits
)
SELECT t.threshold,
       CAST((SELECT COUNT(*) FROM hits h WHERE h.threshold = t.threshold)
            AS BIGINT) AS n_pairs,
       CAST((SELECT COUNT(*) FROM docs x WHERE x.threshold = t.threshold)
            AS BIGINT) AS n_docs_affected
FROM thr t
ORDER BY t.threshold
"""


@query("emb_dedup_threshold_sweep", oracle=_threshold_sweep_sql("duck"), tags=("llm", "dedup", "similarity"))
def emb_dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic-dedup sensitivity curve: candidate pairs come from ONE
    hyperplane-LSH bucket join (the collision-bounded generator every
    dedup op in this engine uses — never all-pairs), then a 5-row literal
    threshold spine fans each candidate into the thresholds it clears,
    yielding pair counts and docs-affected per threshold. This is the
    curve a team reads before committing a cosine cutoff to a 100 TB
    campaign: the cost is the candidate join plus a constant-factor spine
    expansion of the (small) candidate set.

    Execution shape: the candidate join heads a diamond (pair counts AND
    docs-affected both read it), so the Spark path persists the pairs
    frame once and fans out with DataFrame ops over that same object —
    as one SQL text, CTE inlining re-ran the bucket join three times
    (measured 20.5 s → ~1 s at sf0.1). Oracle keeps the flat WITH.

    r13: ``normed`` (corpus + nrm + 8 hyperplane projections = 9 64-term
    dots per row) is ALSO persisted — the self-join's two legs each
    recomputed it from parquet (2 scans × 9 dots/row → 1 materialization
    + 2 cache reads; guide §5)."""
    from pyspark.sql import functions as F

    views(spark, sf_dir, "embeddings")
    bucket_bits = ", ".join(
        f"(CASE WHEN {dot_const('emb', _hyperplane_signs(p), 'spark')} >= 0 "
        f"THEN '1' ELSE '0' END)"
        for p in range(_N_PLANES)
    )
    # CTE-free persisted plan (CacheManager cannot substitute WithCTE
    # plans — the corpus union rides a FROM subquery)
    normed = spark.sql(
        f"""
SELECT vec_id, emb, sqrt({dot('emb', 'emb', DIM, 'spark')}) AS nrm,
       concat({bucket_bits}) AS bucket
FROM ({_emb_corpus('spark')}) corpus
"""
    ).persist()
    a = normed.select(
        F.col("vec_id").alias("vec_a"),
        F.col("emb").alias("ea"),
        F.col("nrm").alias("na"),
        "bucket",
    )
    b = normed.select(
        F.col("vec_id").alias("vec_b"),
        F.col("emb").alias("eb"),
        F.col("nrm").alias("nb"),
        "bucket",
    )
    pairs = (
        a.join(b, "bucket")
        .where(F.col("vec_a") < F.col("vec_b"))
        .selectExpr(
            "vec_a",
            "vec_b",
            f"{dot('ea', 'eb', DIM, 'spark')} / (na * nb) AS cos_sim",
        )
        .where(f"cos_sim >= CAST({_SWEEP_THRESHOLDS[0]} AS DOUBLE)")
        .persist()
    )
    thr = spark.createDataFrame(
        [(float(t),) for t in _SWEEP_THRESHOLDS], "threshold double"
    )
    hits = pairs.crossJoin(F.broadcast(thr)).where(
        F.col("cos_sim") >= F.col("threshold")
    )
    pc = hits.groupBy("threshold").agg(F.count("*").cast("bigint").alias("n_pairs"))
    dc = (
        hits.select("threshold", F.col("vec_a").alias("v"))
        .union(hits.select("threshold", F.col("vec_b")))
        .distinct()
        .groupBy("threshold")
        .agg(F.count("*").cast("bigint").alias("n_docs_affected"))
    )
    zero = F.lit(0).cast("bigint")
    return (
        thr.join(pc, "threshold", "left")
        .join(dc, "threshold", "left")
        .select(
            "threshold",
            F.coalesce("n_pairs", zero).alias("n_pairs"),
            F.coalesce("n_docs_affected", zero).alias("n_docs_affected"),
        )
        .orderBy("threshold")
    )


# ---------------------------------------------------------------------------
# privacy_dp_count_release — deterministic seeded Laplace count release.
# ---------------------------------------------------------------------------

_DP_EPSILON = "0.5"  # literal; sensitivity of a count is 1


def _dp_release_sql(d: str) -> str:
    # Inverse-CDF Laplace from a seeded uniform: u in (0,1) from the
    # 60-bit key hash; noise = -(1/eps)*sign(u-1/2)*ln(1-2|u-1/2|).
    u = f"((({hash64(s('event_type', d), d)}) % 1048576 + 0.5) / 1048576.0)"
    lnterm = f"round(ln(1.0 - 2.0 * abs({u} - 0.5)), 12)"
    noise = (
        f"round((CASE WHEN {u} >= 0.5 THEN -1.0 ELSE 1.0 END)"
        f" * (1.0 / {_DP_EPSILON}) * {lnterm}, 6)"
    )
    return f"""
WITH counts AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS true_count
  FROM {tbl('events', d)} GROUP BY event_type
)
SELECT event_type,
       true_count,
       CAST({_DP_EPSILON} AS DOUBLE) AS epsilon,
       round(CAST(true_count AS DOUBLE) + {noise}, 6) AS released_count
FROM counts
ORDER BY event_type
"""


@query("privacy_dp_count_release", oracle=_dp_release_sql("duck"), tags=("privacy", "governance"))
def privacy_dp_count_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laplace-noised count release (Dwork et al. 2006; sensitivity 1,
    ε = 0.5) with a DETERMINISTIC noise draw: the uniform comes from the
    group key's 60-bit hash (inverse-CDF transform), so the release is
    reproducible run-to-run and bit-identical across engines — the
    auditable-release property a governed pipeline wants (a fresh salt
    per release period re-randomizes). true_count stays engine-side for
    the calibration view; only released_count crosses the trust boundary.
    ln() is the one libm term — round-12 per the house contract. One
    aggregation, constant-size projection arithmetic."""
    views(spark, sf_dir, "events")
    return spark.sql(_dp_release_sql("spark"))


# ---------------------------------------------------------------------------
# ops_watermark_planner — out-of-orderness audit over arrival order.
# ---------------------------------------------------------------------------

_WM_CHUNK = 10_000  # arrival chunk: bounds the prefix table, not the windows


def _watermark_planner_sql(d: str) -> str:
    return f"""
WITH ev AS (
  SELECT event_id, event_type, {epoch_s('ts', d)} AS es
  FROM {tbl('events', d)}
),
chunked AS (
  SELECT event_id, event_type, es, {intdiv('event_id', str(_WM_CHUNK), d)} AS ck
  FROM ev
),
runmax AS (
  SELECT event_type, es, ck,
         MAX(es) OVER (PARTITION BY ck ORDER BY event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS local_max
  FROM chunked
),
chunk_max AS (SELECT ck, MAX(es) AS cmax FROM chunked GROUP BY ck),
prefix AS (
  SELECT a.ck, MAX(b.cmax) AS pmax
  FROM chunk_max a LEFT JOIN chunk_max b ON b.ck < a.ck
  GROUP BY a.ck
),
lat AS (
  SELECT r.event_type,
         greatest(r.local_max, coalesce(p.pmax, r.local_max)) - r.es AS late_s
  FROM runmax r JOIN prefix p ON p.ck = r.ck
)
SELECT event_type,
       CASE WHEN late_s <= 0    THEN '0_on_time'
            WHEN late_s <= 60   THEN '1_le_1m'
            WHEN late_s <= 600  THEN '2_le_10m'
            WHEN late_s <= 1800 THEN '3_le_30m'
            ELSE                     '4_gt_30m' END AS lateness_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(MAX(late_s) AS BIGINT) AS max_late_s
FROM lat
GROUP BY event_type, 2
ORDER BY event_type, lateness_bucket
"""


@query("ops_watermark_planner", oracle=_watermark_planner_sql("duck"), tags=("streaming", "profiling"))
def ops_watermark_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-delay planner: how late does data actually arrive? Each
    row's lateness is (running max event-time over arrival order) - (its
    own event-time) — arrival order is the event_id issue order — bucketed
    into the delays a ``withWatermark`` clause would be set to. The
    histogram is what an engineer reads to pick the delay: the bucket
    where the curve flattens is the watermark that drops ~nothing. The
    prefix max uses the house two-phase scheme (``ref_chunking``):
    chunk-partitioned running max (high-cardinality windows) + a prefix
    join over the SMALL per-chunk max table — no single-partition window,
    survives a 100x scale-up. All arithmetic on BIGINT epoch seconds."""
    views(spark, sf_dir, "events")
    return spark.sql(_watermark_planner_sql("spark"))


# ---------------------------------------------------------------------------
# data_split_leakage — same-content contamination across train/val/test.
# ---------------------------------------------------------------------------


def _split_leakage_sql(d: str) -> str:
    from .llm_ops import _doc_corpus

    bucket = f"({hashing.djb2(s('doc_id', d), d)} % 100)"
    return f"""
WITH corpus AS ({_doc_corpus(d)}),
assigned AS (
  SELECT {hashing.sha256_hex('text', d)} AS h,
         CASE WHEN {bucket} < 80 THEN 'train'
              WHEN {bucket} < 90 THEN 'val'
              ELSE 'test' END AS split
  FROM corpus
),
hs AS (SELECT DISTINCT h, split FROM assigned)
SELECT a.split AS split_a, b.split AS split_b,
       CAST(COUNT(*) AS BIGINT) AS n_leaked_contents
FROM hs a JOIN hs b ON a.h = b.h AND a.split < b.split
GROUP BY a.split, b.split
ORDER BY split_a, split_b
"""


@query("data_split_leakage", oracle=_split_leakage_sql("duck"), tags=("llm", "curation", "evaluation"))
def data_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val/test same-content leakage: the split assignment is keyed
    by doc_id (``llm_train_split``'s djb2 rule), so two documents with
    IDENTICAL text can land in different splits — exactly the leak that
    inflates held-out metrics, and the reason production splitters key on
    a CONTENT hash instead. Counts distinct leaked contents per split
    pair over the planted-dup corpus. The self-join on the content hash
    is bounded: ≤3 distinct (hash, split) rows per content — never a
    pairwise document blowup."""
    views(spark, sf_dir, "documents")
    return spark.sql(_split_leakage_sql("spark"))


# ---------------------------------------------------------------------------
# dedup_survivorship_audit — which sources does dedup hit hardest?
# ---------------------------------------------------------------------------


def _survivorship_sql(d: str) -> str:
    from .llm_ops import _doc_corpus

    return f"""
WITH corpus AS ({_doc_corpus(d)}),
hashed AS (
  SELECT doc_id, {hashing.sha256_hex('text', d)} AS h FROM corpus
),
keepers AS (SELECT h, MIN(doc_id) AS keep_id FROM hashed GROUP BY h),
attributed AS (
  SELECT doc.source, (k.keep_id = h.doc_id) AS kept
  FROM hashed h
  JOIN keepers k ON k.h = h.h
  JOIN {tbl('documents', d)} doc ON doc.doc_id = h.doc_id % 1000000
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       round(CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS survival_rate
FROM attributed
GROUP BY source
ORDER BY source
"""


@query("dedup_survivorship_audit", oracle=_survivorship_sql("duck"), tags=("llm", "dedup", "profiling"))
def dedup_survivorship_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship after exact dedup, by source: cluster on the content
    hash, keep the canonical member (min doc_id), and report each
    source's survival rate — the audit that catches a dedup campaign
    silently gutting one source (mirrors/boilerplate-heavy crawls lose
    most; curated sources should survive near 1.0). Source attribution
    maps planted ids back to their canonical original (id mod 1e6), the
    same convention as ``dedup_quality_interaction``. One content-key
    aggregation + two hash joins — no window, no pairwise work."""
    views(spark, sf_dir, "documents")
    return spark.sql(_survivorship_sql("spark"))


# ---------------------------------------------------------------------------
# llm_classifier_threshold_sweep — keep-volume / gate-agreement per cutoff.
# ---------------------------------------------------------------------------

# same fixed-width binning as llm_quality_calibration (audit_ops): the two
# views reconcile bin-for-bin
_QC_BIN = "least(CAST(12 AS BIGINT), greatest(CAST(-5 AS BIGINT), CAST(floor(logit * 250) AS BIGINT)))"


def _classifier_sweep_sql(d: str) -> str:
    from .corpus_ops import _qc_scores
    from .quality_ops import _gopher_sql

    return f"""
WITH {_qc_scores(d).lstrip()},
gop AS (SELECT doc_id, keep AS gate_keep FROM ({_gopher_sql(d)}) g),
bins AS (
  SELECT {_QC_BIN} AS b,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN gate_keep THEN 1 ELSE 0 END) AS BIGINT) AS n_gate
  FROM qc JOIN gop ON gop.doc_id = qc.doc_id
  GROUP BY {_QC_BIN}
),
tot AS (SELECT SUM(n) AS nt FROM bins),
cum AS (
  -- triangular self-join on the <=18-row bin table; the broadcast hint
  -- (a comment to DuckDB) stops Spark's stats-less inner non-equi join
  -- from degenerating into a CartesianProduct
  SELECT /*+ BROADCAST(bn) */ a.b AS cutoff_bin,
         CAST(SUM(bn.n) AS BIGINT) AS n_keep,
         CAST(SUM(bn.n_gate) AS BIGINT) AS n_gate_agree
  FROM bins a JOIN bins bn ON bn.b >= a.b
  GROUP BY a.b
)
SELECT c.cutoff_bin, c.n_keep,
       round(CAST(c.n_keep AS DOUBLE) / t.nt, 6) AS keep_rate,
       round(CAST(c.n_gate_agree AS DOUBLE) / c.n_keep, 6) AS gate_agreement
FROM cum c CROSS JOIN tot t
ORDER BY cutoff_bin
"""


@query("llm_classifier_threshold_sweep", oracle=_classifier_sweep_sql("duck"), tags=("llm", "quality", "evaluation"))
def llm_classifier_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier-cutoff sweep: for every candidate logit threshold, how
    much of the corpus survives and how often the survivors also pass the
    Gopher rule gate — the volume-vs-agreement curve a curation team
    reads to SET the cutoff (``llm_quality_calibration`` shows per-bin
    reliability; this is its cumulative sibling, same fixed-width bins so
    the two reconcile). Scale shape: the corpus collapses to ≤18 bin
    rows FIRST (one map-side-combinable fold); the cumulative sums are a
    triangular self-join on that constant-size bin table — never a
    per-document window or a corpus × spine expansion.

    Spark path (r13): the ≤18-row ``bins`` table was re-planned for all
    THREE consumers (total, both triangular legs) — the classifier +
    Gopher corpus chain ran 3× (9 scans / 11 exchanges measured).
    Persist ``bins``; the sweep reads the cache (guide §5; plan: 9→3
    scans)."""
    from .corpus_ops import _qc_scores
    from .quality_ops import _gopher_sql

    views(spark, sf_dir, "documents")
    bins = spark.sql(
        f"""
WITH {_qc_scores('spark').lstrip()},
gop AS (SELECT doc_id, keep AS gate_keep FROM ({_gopher_sql('spark')}) g)
SELECT {_QC_BIN} AS b,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN gate_keep THEN 1 ELSE 0 END) AS BIGINT) AS n_gate
FROM qc JOIN gop ON gop.doc_id = qc.doc_id
GROUP BY {_QC_BIN}
"""
        # localCheckpoint, not persist: the classifier chain's plan holds
        # WithCTE, which CacheManager cannot substitute — a persist here
        # still re-ran the corpus chain for all three consumers
    ).localCheckpoint(eager=True)
    bins.createOrReplaceTempView("slsp_cts_bins")
    return spark.sql(
        """
WITH tot AS (SELECT SUM(n) AS nt FROM slsp_cts_bins),
cum AS (
  SELECT /*+ BROADCAST(bn) */ a.b AS cutoff_bin,
         CAST(SUM(bn.n) AS BIGINT) AS n_keep,
         CAST(SUM(bn.n_gate) AS BIGINT) AS n_gate_agree
  FROM slsp_cts_bins a JOIN slsp_cts_bins bn ON bn.b >= a.b
  GROUP BY a.b
)
SELECT c.cutoff_bin, c.n_keep,
       round(CAST(c.n_keep AS DOUBLE) / t.nt, 6) AS keep_rate,
       round(CAST(c.n_gate_agree AS DOUBLE) / c.n_keep, 6) AS gate_agreement
FROM cum c CROSS JOIN tot t
ORDER BY cutoff_bin
"""
    )


# ---------------------------------------------------------------------------
# mm_scene_segments — shot/scene segmentation over sampled frames.
# ---------------------------------------------------------------------------

_SCENE_CUT = 96  # luminance jump that starts a new scene (0..255 scale)


def _scene_segments_sql(d: str) -> str:
    if d == "spark":
        blen = "octet_length(CAST(text AS BINARY))"
        gen = "explode(sequence(CAST(0 AS BIGINT), n_frames - 1))"
    else:
        blen = "octet_length(CAST(text AS BLOB))"
        gen = "unnest(generate_series(CAST(0 AS BIGINT), n_frames - 1))"
    key = f"concat({s('doc_id', d)}, ':', {s('frame_idx', d)})"
    lum = f"({hash64(key, d)}) % 256"
    return f"""
WITH base AS (
  SELECT doc_id, CAST({blen} % 7 + 1 AS BIGINT) AS n_frames
  FROM {tbl('documents', d)}
),
frames AS (SELECT doc_id, {gen} AS frame_idx FROM base),
feat AS (SELECT doc_id, frame_idx, {lum} AS lum FROM frames),
flagged AS (
  SELECT doc_id, frame_idx,
         CASE WHEN LAG(lum) OVER w IS NULL THEN 1
              WHEN abs(lum - LAG(lum) OVER w) >= {_SCENE_CUT} THEN 1
              ELSE 0 END AS is_cut
  FROM feat
  WINDOW w AS (PARTITION BY doc_id ORDER BY frame_idx)
),
scened AS (
  SELECT doc_id, frame_idx,
         SUM(is_cut) OVER (PARTITION BY doc_id ORDER BY frame_idx
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS scene_id
  FROM flagged
)
SELECT doc_id, CAST(scene_id AS BIGINT) AS scene_id,
       CAST(COUNT(*) AS BIGINT) AS n_frames,
       CAST(MIN(frame_idx) AS BIGINT) AS start_frame,
       CAST(MAX(frame_idx) AS BIGINT) AS end_frame
FROM scened
GROUP BY doc_id, scene_id
ORDER BY doc_id, scene_id
"""


@query("mm_scene_segments", oracle=_scene_segments_sql("duck"), tags=("llm", "multimodal"))
def mm_scene_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scene/shot segmentation over sampled video frames: per-frame
    features (here the deterministic fake luminance the multimodal stubs
    use — a real decoder drops in without changing the plan) are compared
    to their predecessor per asset; a jump ≥ the cut threshold starts a
    new scene, and gaps-and-islands (running sum of cut flags) turns cut
    points into (scene, frame-range) segments — the clip-boundary
    operator a video curation pipeline runs before captioning/embedding
    each scene once instead of every frame. Both windows partition on the
    high-cardinality asset key with ≤7 frames per partition; cost ∝ total
    frames at any corpus size."""
    views(spark, sf_dir, "documents")
    return spark.sql(_scene_segments_sql("spark"))


# ---------------------------------------------------------------------------
# privacy_k_suppression_curve — the utility cost of k-anonymity enforcement.
# ---------------------------------------------------------------------------


def _k_suppression_sql(d: str) -> str:
    ks = ", ".join(f"({k})" for k in (2, 5, 10, 20))
    return f"""
WITH g AS (
  SELECT c_nationkey, c_mktsegment, CAST(COUNT(*) AS BIGINT) AS grp_n
  FROM {tbl('customer', d)}
  GROUP BY c_nationkey, c_mktsegment
),
tot AS (SELECT SUM(grp_n) AS nt FROM g),
ks AS ({inline_values(ks, 'k', 'k', d)})
SELECT k.k,
       CAST(SUM(CASE WHEN g.grp_n < k.k THEN 1 ELSE 0 END) AS BIGINT)
         AS n_classes_suppressed,
       CAST(SUM(CASE WHEN g.grp_n < k.k THEN g.grp_n ELSE 0 END) AS BIGINT)
         AS n_rows_suppressed,
       round(CAST(SUM(CASE WHEN g.grp_n < k.k THEN g.grp_n ELSE 0 END)
                  AS DOUBLE) / t.nt, 6) AS suppressed_row_share
FROM g CROSS JOIN ks k CROSS JOIN tot t
GROUP BY k.k, t.nt
ORDER BY k.k
"""


@query("privacy_k_suppression_curve", oracle=_k_suppression_sql("duck"), tags=("privacy", "governance"))
def privacy_k_suppression_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Enforcement sibling of ``privacy_k_anonymity``: suppressing every
    quasi-identifier class smaller than k is the standard k-anonymity
    remedy, and this curve prices it — classes and rows lost at each
    candidate k (2/5/10/20). The release team picks the k where the
    suppressed-row share is still acceptable. The QI classes collapse to
    a tiny grouped table first; the k spine and total are broadcast
    literals — the per-k sweep never touches row-level data again."""
    views(spark, sf_dir, "customer")
    return spark.sql(_k_suppression_sql("spark"))


# ---------------------------------------------------------------------------
# llm_dataset_card — the per-source dataset card, one row per source.
# ---------------------------------------------------------------------------


def _card_hashed_sql(d: str) -> str:
    """One sha256 pass: (source, content-hash) per document — the
    subplan both dup-rate stages read (the Spark path persists it)."""
    docs = tbl("documents", d)
    return f"SELECT source, {hashing.sha256_hex('text', d)} AS h FROM {docs}"


def _dataset_card_body(d: str, hashed_src: str) -> str:
    from .quality_ops import _gopher_sql

    gen = "explode" if d == "spark" else "unnest"
    docs = tbl("documents", d)
    return f"""
WITH hashed AS (SELECT * FROM {hashed_src}),
base AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs FROM {docs} GROUP BY source
),
tok AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_tokens
  FROM (SELECT source, {gen}(split(text, ' ')) AS w FROM {docs}) x
  WHERE w <> '' GROUP BY source
),
ch AS (SELECT h, COUNT(*) AS cnt FROM hashed GROUP BY h),
dup AS (
  SELECT dd.source,
         CAST(SUM(CASE WHEN ch.cnt > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM hashed dd JOIN ch ON ch.h = dd.h
  GROUP BY dd.source
),
gop AS (
  SELECT dd.source,
         CAST(SUM(CASE WHEN g.keep THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM ({_gopher_sql(d)}) g JOIN {docs} dd ON dd.doc_id = g.doc_id
  GROUP BY dd.source
),
pii AS ({_pii_density_sql_ref(d)}),
lic AS (
  SELECT source,
         CAST(SUM(CASE WHEN keep THEN n_docs ELSE 0 END) AS BIGINT) AS n_keep,
         CAST(SUM(n_docs) AS BIGINT) AS n
  FROM ({_license_gate_sql(d)}) l
  GROUP BY source
)
SELECT b.source, b.n_docs, tok.n_tokens,
       round(CAST(dup.n_dup AS DOUBLE) / dup.n, 6) AS dup_rate,
       round(CAST(gop.n_keep AS DOUBLE) / gop.n, 6) AS gopher_keep_rate,
       pii.pii_per_1k_tokens,
       round(CAST(lic.n_keep AS DOUBLE) / lic.n, 6) AS license_keep_rate
FROM base b
JOIN tok ON tok.source = b.source
JOIN dup ON dup.source = b.source
JOIN gop ON gop.source = b.source
JOIN pii ON pii.source = b.source
JOIN lic ON lic.source = b.source
ORDER BY b.source
"""


def _dataset_card_sql(d: str) -> str:
    """One-WITH composition for the oracle (DuckDB materializes the
    multiply-referenced ``hashed`` CTE itself)."""
    return _dataset_card_body(d, f"({_card_hashed_sql(d)})")


def _pii_density_sql_ref(d: str) -> str:
    """The privacy_pii_density query as a nestable subquery (the proven
    full-WITH-as-subquery composition pattern)."""
    from .audit_ops import _pii_density_sql

    return f"SELECT * FROM ({_pii_density_sql(d)}) p"


@query("llm_dataset_card", oracle=_dataset_card_sql("duck"), tags=("llm", "curation", "profiling"))
def llm_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dataset card: one row per source rolling up the audits a data
    release ships with — size, token mass, exact-dup rate, Gopher-gate
    keep rate, PII density, license keep rate — each term REUSING the
    exact SQL of its standalone audit (``dedup_*``, ``text_gopher_rules``,
    ``privacy_pii_density``, ``web_license_gate``), so the card provably
    reconciles with the detailed views (pinned in tests). Five corpus
    passes joined on the tiny source key — the composition pattern every
    summary dashboard in this engine uses; at 100 TB each pass is
    map-side-combinable and the joins are broadcast-sized.

    r14 (guide §2.4/§5): the dup-rate term hashed the corpus TWICE —
    ``ch`` ran sha256 over every doc and ``dup`` re-ran the same sha256
    to join against it. The (source, hash) table is now one persisted
    pass both stages read (sha passes 2→1); each remaining audit term
    is a genuinely different full-text expression pass (tokenize,
    Gopher gates, PII regexes, license scan), where a persist barrier
    on the raw text column loses (the text_unigram_kl_mix lesson), so
    they stay independent map-side scans."""
    views(spark, sf_dir, "documents")
    hashed = spark.sql(_card_hashed_sql("spark")).persist()
    hashed.createOrReplaceTempView("slsp_card_hashed")
    return spark.sql(_dataset_card_body("spark", "slsp_card_hashed"))


# ---------------------------------------------------------------------------
# sim_ann_ivf_nprobe_curve — recall as a function of probes: the ANN tuner.
# ---------------------------------------------------------------------------

_NPROBE_SPINE = (1, 2, 4)
_NPROBE_NQ = 8
_NPROBE_K = 5


def _nprobe_normed_sql(d: str) -> str:
    """The shared normed-corpus base (vec_id, emb, nrm) — the subplan
    every stage of the curve reads; the Spark path persists it once."""
    from .dialect import to_double_arr

    return (
        f"SELECT vec_id, emb, sqrt({dot('emb', 'emb', DIM, d)}) AS nrm "
        f"FROM (SELECT vec_id, {to_double_arr('embedding', d)} AS emb "
        f"FROM {tbl('embeddings', d)})"
    )


def _nprobe_curve_body(d: str, normed_src: str) -> str:
    from .dialect import qsample
    from .llm_ops import _IVF_CENT_MOD, _IVF_QUERY_MOD

    spine = ", ".join(f"({n})" for n in _NPROBE_SPINE)
    max_np = max(_NPROBE_SPINE)
    return f"""
WITH normed AS (SELECT * FROM {normed_src}),
cents AS (
  SELECT vec_id AS cid, emb AS cemb, nrm AS cnrm FROM normed
  WHERE vec_id % {_IVF_CENT_MOD} = 0
),
assign AS (
  SELECT vec_id, emb, nrm, cid FROM (
    SELECT n.vec_id, n.emb, n.nrm, c.cid,
           ROW_NUMBER() OVER (
             PARTITION BY n.vec_id
             ORDER BY {dot('n.emb', 'c.cemb', DIM, d)} / (n.nrm * c.cnrm) DESC, c.cid
           ) AS crnk
    FROM normed n CROSS JOIN cents c
  ) a WHERE crnk = 1
),
qs AS ({qsample('normed', 'vec_id', _NPROBE_NQ, f'vec_id % {_IVF_QUERY_MOD} = 0')}),
qv AS (SELECT n.* FROM normed n JOIN qs ON qs.vec_id = n.vec_id),
qprobe AS (
  SELECT vec_id AS qid, emb AS qemb, nrm AS qnrm, cid, crnk FROM (
    SELECT n.vec_id, n.emb, n.nrm, c.cid,
           ROW_NUMBER() OVER (
             PARTITION BY n.vec_id
             ORDER BY {dot('n.emb', 'c.cemb', DIM, d)} / (n.nrm * c.cnrm) DESC, c.cid
           ) AS crnk
    FROM qv n CROSS JOIN cents c
  ) p WHERE crnk <= {max_np}
),
cand AS (
  SELECT q.qid, q.crnk, a.vec_id AS nid,
         {dot('q.qemb', 'a.emb', DIM, d)} / (q.qnrm * a.nrm) AS cos_sim
  FROM qprobe q JOIN assign a ON a.cid = q.cid AND a.vec_id <> q.qid
),
spine AS ({inline_values(spine, 's', 'np', d)}),
ranked AS (
  SELECT s.np, c.qid, c.nid,
         ROW_NUMBER() OVER (PARTITION BY s.np, c.qid
                            ORDER BY c.cos_sim DESC, c.nid) AS rnk
  FROM cand c JOIN spine s ON c.crnk <= s.np
),
ivf AS (SELECT np, qid, nid FROM ranked WHERE rnk <= {_NPROBE_K}),
exact AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (
             PARTITION BY q.vec_id
             ORDER BY {dot('q.emb', 'n.emb', DIM, d)} / (q.nrm * n.nrm) DESC,
                      n.vec_id
           ) AS rnk
    FROM qv q JOIN normed n ON q.vec_id <> n.vec_id
  ) r WHERE rnk <= {_NPROBE_K}
)
SELECT s.np AS nprobe,
       CAST(COUNT(i.nid) AS BIGINT) AS n_hits,
       CAST(COUNT(*) AS BIGINT) AS n_possible,
       round(CAST(COUNT(i.nid) AS DOUBLE) / COUNT(*), 6) AS recall_at_k
FROM spine s CROSS JOIN exact e
LEFT JOIN ivf i ON i.np = s.np AND i.qid = e.query_id AND i.nid = e.neighbor_id
GROUP BY s.np
ORDER BY nprobe
"""


def _nprobe_curve_sql(d: str) -> str:
    return _nprobe_curve_body(d, f"({_nprobe_normed_sql(d)})")


@query("sim_ann_ivf_nprobe_curve", oracle=_nprobe_curve_sql("duck"), tags=("llm", "similarity", "evaluation"))
def sim_ann_ivf_nprobe_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF tuner's dial: recall@k at nprobe ∈ {1, 2, 4} in ONE pass —
    centroid ranks are computed once per query up to the max probe count,
    then a literal spine slices the SAME candidate set per nprobe (a
    candidate's centroid rank decides which curve points see it). This is
    the latency/recall trade-off curve a serving team reads before fixing
    nprobe in production (the FAISS tuning workflow), the probe-side
    sibling of ``emb_dedup_threshold_sweep``. The exact side brute-forces
    only the fixed 8-query hash-rank cohort (k·N at any corpus size);
    corpus-scale windows partition on the vector key. Note on the
    assignment step: this offline EVAL rides the oracle-shared SQL (one
    N×C exchange, windowed on the high-cardinality vector key) for
    cross-engine exactness; the SERVING path (``sim_ann_ivf``) uses the
    map-side-combinable struct-argmax — tuning runs once, serving runs
    always, so the extra exchange lives on the right side.

    Spark path (r13): ``normed`` (the corpus + per-vector norm) heads a
    5-way diamond — cents, assign, the query cohort, qv and the exact
    brute-force side all read it, and CTE inlining re-planned the scan +
    64-term norm for every reference (measured: 8 parquet scans / 10
    exchanges). It is persisted ONCE and the rest of the oracle-shared
    text runs against the cached view (guide §5 caching: reused and
    expensive to recompute; plan: 8→1 scans)."""
    views(spark, sf_dir, "embeddings")
    normed = spark.sql(_nprobe_normed_sql("spark")).persist()
    normed.createOrReplaceTempView("slsp_npc_normed")
    return spark.sql(_nprobe_curve_body("spark", "slsp_npc_normed"))


# ---------------------------------------------------------------------------
# sim_ann_filtered_topk — attribute-filtered vector search (pre-filter).
# ---------------------------------------------------------------------------

_FILTERED_K = 5
_FILTERED_NQ = 8
_FILTERED_CATS = 4


def _filtered_topk_sql(d: str) -> str:
    from .dialect import qsample, to_double_arr

    return f"""
WITH base AS (
  SELECT vec_id, vec_id % {_FILTERED_CATS} AS category,
         {to_double_arr('embedding', d)} AS emb
  FROM {tbl('embeddings', d)}
),
normed AS (
  SELECT vec_id, category, emb, sqrt({dot('emb', 'emb', DIM, d)}) AS nrm
  FROM base
),
qs AS ({qsample('normed', 'vec_id', _FILTERED_NQ)}),
qv AS (SELECT n.* FROM normed n JOIN qs ON qs.vec_id = n.vec_id)
SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS rnk,
       round(cos_sim, 6) AS cosine
FROM (
  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
         {dot('q.emb', 'n.emb', DIM, d)} / (q.nrm * n.nrm) AS cos_sim,
         ROW_NUMBER() OVER (
           PARTITION BY q.vec_id
           ORDER BY {dot('q.emb', 'n.emb', DIM, d)} / (q.nrm * n.nrm) DESC,
                    n.vec_id
         ) AS rnk
  FROM qv q JOIN normed n
    ON n.category = q.category AND n.vec_id <> q.vec_id
) r
WHERE rnk <= {_FILTERED_K}
ORDER BY query_id, rnk
"""


@query("sim_ann_filtered_topk", oracle=_filtered_topk_sql("duck"), tags=("llm", "similarity", "topk"))
def sim_ann_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribute-filtered vector search with PRE-filter semantics: the
    category predicate (tenant / language / collection — here a
    deterministic ``vec_id % 4`` attribute) restricts the corpus BEFORE
    ranking, so every query gets its full k within its filter — the
    correctness property post-filtering (rank first, filter after)
    silently violates when matching neighbors are sparse, which is why
    filtered-ANN engines push the predicate into the index. The filter
    rides the equi-join key (category) ahead of the dot products, so
    Spark prunes non-matching pairs before any arithmetic; the per-query
    rank window is bounded by the fixed 8-query cohort."""
    views(spark, sf_dir, "embeddings")
    return spark.sql(_filtered_topk_sql("spark"))
