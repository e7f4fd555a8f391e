"""Round-5 governance & history operators: a type-2 slowly-changing
dimension build from a changelog, an l-diversity privacy audit, and
containment (near-subset) dedup — the asymmetric sibling of n-gram
Jaccard.

House determinism contract throughout: both engines order change streams
by the identical (second-truncated epoch, event_id) key so sub-second
source precision can never reorder versions; ln() terms round(…, 12) and
sum through DECIMAL; ROW_NUMBER outputs cast to BIGINT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions import text
from .dialect import arr_len, epoch_s, hash64, intdiv, tbl, unnest_fn, views
from .registry import query

# ---------------------------------------------------------------------------
# lake_scd2_build — type-2 dimension history from a CDC changelog.
# ---------------------------------------------------------------------------

_SCD2_COHORT_MOD = 20


def _scd2_sql(d: str) -> str:
    ev = tbl("events", d)
    return f"""
WITH ordered AS (
  SELECT user_id, event_type, event_id,
         {epoch_s('ts', d)} AS ts_s,
         LAG(event_type) OVER (
           PARTITION BY user_id ORDER BY {epoch_s('ts', d)}, event_id
         ) AS prev_attr
  FROM {ev}
  WHERE user_id % {_SCD2_COHORT_MOD} = 0
),
changes AS (
  SELECT user_id, event_type AS attr, ts_s AS valid_from_s, event_id
  FROM ordered
  WHERE prev_attr IS NULL OR prev_attr <> event_type
),
versioned AS (
  SELECT user_id, attr, valid_from_s,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY user_id ORDER BY valid_from_s, event_id
         ) AS BIGINT) AS version_n,
         LEAD(valid_from_s) OVER (
           PARTITION BY user_id ORDER BY valid_from_s, event_id
         ) AS valid_to_s
  FROM changes
)
SELECT user_id, attr, version_n, valid_from_s, valid_to_s,
       valid_to_s IS NULL AS is_current
FROM versioned
ORDER BY user_id, version_n
"""


@query("lake_scd2_build", oracle=_scd2_sql("duck"), tags=("lakehouse", "cdc"))
def lake_scd2_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension build (Kimball SCD2, public): the
    event changelog collapses to attribute VERSION intervals — one row
    per (user, attribute run) with ``valid_from``/``valid_to`` effective
    range and an ``is_current`` flag. Consecutive same-value updates are
    dropped by a LAG pass; version numbers and interval ends come from
    ROW_NUMBER/LEAD over the surviving change rows. Every window and the
    change filter partition on ``user_id``, so ONE hash exchange feeds
    the whole build (the run-collapse sibling of ``sql_gaps_islands``)
    and a 100 TB changelog spreads by key with no global state; the
    audit-cohort predicate prunes at the scan because nothing above it
    crosses users. Both engines order by the identical second-truncated
    (epoch, event_id) key, so sub-second source precision cannot
    reorder versions between engines. Writes to the reference's store
    keep only the latest value (signer/index.js:229-242);
    this operator is the lakehouse-native history that upgrade path
    needs when "what was the value THEN" becomes a query."""
    views(spark, sf_dir, "events")
    return spark.sql(_scd2_sql("spark"))


# ---------------------------------------------------------------------------
# privacy_l_diversity — sensitive-attribute diversity inside QI classes.
# ---------------------------------------------------------------------------

_LDIV_COHORTS = 50
_LDIV_L = 3


def _l_diversity_sql(d: str) -> str:
    ev = tbl("events", d)
    day = intdiv(epoch_s("ts", d), "86400", d)
    return f"""
WITH src AS (
  SELECT user_id % {_LDIV_COHORTS} AS cohort, {day} AS day_idx,
         event_type AS sens
  FROM {ev}
),
cnt AS (
  SELECT cohort, day_idx, sens, CAST(COUNT(*) AS BIGINT) AS n
  FROM src GROUP BY cohort, day_idx, sens
),
tot AS (
  SELECT cohort, day_idx, CAST(SUM(n) AS BIGINT) AS grp_n,
         CAST(COUNT(*) AS BIGINT) AS distinct_l
  FROM cnt GROUP BY cohort, day_idx
)
SELECT cnt.cohort, cnt.day_idx, MIN(tot.grp_n) AS grp_n,
       MIN(tot.distinct_l) AS distinct_l,
       CAST(SUM(CAST(round(
         -(CAST(cnt.n AS DOUBLE) / CAST(tot.grp_n AS DOUBLE))
          * ln(CAST(cnt.n AS DOUBLE) / CAST(tot.grp_n AS DOUBLE)), 12)
         AS DECIMAL(28,12))) AS DOUBLE) AS entropy_nats,
       MIN(tot.distinct_l) >= {_LDIV_L} AS l{_LDIV_L}_ok
FROM cnt JOIN tot ON tot.cohort = cnt.cohort AND tot.day_idx = cnt.day_idx
GROUP BY cnt.cohort, cnt.day_idx
ORDER BY cnt.cohort, cnt.day_idx
"""


@query(
    "privacy_l_diversity",
    oracle=_l_diversity_sql("duck"),
    tags=("privacy", "profiling"),
)
def privacy_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al. 2007, public) — the
    follow-up to ``privacy_k_anonymity``: a large equivalence class is
    still unsafe if everyone in it shares the sensitive value. Per
    (cohort, day) QI class this reports distinct-l, the class size, and
    entropy l-diversity (−Σ p ln p, each term round-12 through DECIMAL
    so the sum is order-independent), with the l≥3 conformance flag.
    Two grouped aggregations on the QI key plus one equi-join back —
    all map-side combinable, output ∝ QI domain, never the table."""
    views(spark, sf_dir, "events")
    return spark.sql(_l_diversity_sql("spark"))


# ---------------------------------------------------------------------------
# dedup_containment — near-subset duplicates Jaccard misses.
# ---------------------------------------------------------------------------

_CONTAIN_THRESHOLD = 0.9
_CONTAIN_COPY_MOD = 7
_CONTAIN_DF_MIN = 5  # df-cap floor so tiny corpora keep their shingles
_CONTAIN_DF_PCT_DEN = 100  # drop shingles present in > 1% of documents
_CONTAIN_K = 5  # 5-word shingles: selective candidate key (3-grams pair-explode)


def _containment_postings_sql(d: str) -> str:
    """CTE chain from the raw corpus to the distinct postings table
    ``exploded`` — the one-shingle-pass subplan the Spark path persists
    (r13: carrying the unused guard CTEs with their correlated NOT
    EXISTS through the analyzer overflowed DeduplicateRelations, so the
    postings chain is its own builder)."""
    docs = tbl("documents", d)
    w = text.words("text", d)
    half = f"greatest({_CONTAIN_K}, {intdiv(arr_len('w', d), '2', d)})"
    if d == "spark":
        prefix = f"array_join(slice(w, 1, {half}), ' ')"
    else:
        prefix = f"array_to_string(list_slice(w, 1, {half}), ' ')"
    return f"""
corpus AS (
  SELECT doc_id, text FROM {docs}
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, {prefix} AS text
  FROM (SELECT doc_id, {w} AS w FROM {docs}
        WHERE doc_id % {_CONTAIN_COPY_MOD} = 0) h
),
toks AS (SELECT doc_id, {text.words('text', d)} AS wd FROM corpus),
shing AS (
  SELECT doc_id, {text.shingles('wd', _CONTAIN_K, d)} AS sh
  FROM toks WHERE {arr_len('wd', d)} >= {_CONTAIN_K}
),
exploded AS (
  -- postings keyed by a 60-bit shingle hash, not the ~30-char shingle
  -- text: the DISTINCT, the df guard, and the candidate self-join all
  -- shuffle/compare 8-byte integers (see dialect.hash64 for the
  -- cross-engine exactness argument)
  SELECT DISTINCT doc_id, {hash64('sg_raw', d)} AS sg FROM (
    SELECT doc_id, {unnest_fn(d)}(sh) AS sg_raw FROM shing
  ) x
)"""


def _containment_kept_sql(d: str) -> str:
    """CTE chain from the raw corpus to the df-guarded postings table
    ``kept`` — the diamond-reused subplan (oracle: DuckDB materializes
    multiply-referenced CTEs; Spark: the query fn persists it once)."""
    return f"""{_containment_postings_sql(d)},
ndocs AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM shing),
hot AS (
  SELECT sg FROM exploded GROUP BY sg
  HAVING CAST(COUNT(*) AS BIGINT) >
         greatest(CAST({_CONTAIN_DF_MIN} AS BIGINT),
                  (SELECT {intdiv('nd', _CONTAIN_DF_PCT_DEN, d)} FROM ndocs))
),
kept AS (
  SELECT e.doc_id, e.sg FROM exploded e
  WHERE NOT EXISTS (SELECT 1 FROM hot h WHERE h.sg = e.sg)
)"""


def _containment_scoring_sql(kept_src: str) -> str:
    """Pair scoring over a postings relation — dialect-neutral."""
    return f"""
WITH sizes AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n
  FROM {kept_src} GROUP BY doc_id
),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(COUNT(*) AS BIGINT) AS n_shared
  FROM {kept_src} a JOIN {kept_src} b
    ON a.sg = b.sg AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT /*+ BROADCAST(sa), BROADCAST(sb) */ i.doc_a, i.doc_b,
       round(CAST(i.n_shared AS DOUBLE) / sa.n, 6) AS c_a_in_b,
       round(CAST(i.n_shared AS DOUBLE) / sb.n, 6) AS c_b_in_a,
       round(CAST(i.n_shared AS DOUBLE) / (sa.n + sb.n - i.n_shared), 6)
         AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.doc_a
JOIN sizes sb ON sb.doc_id = i.doc_b
WHERE CAST(i.n_shared AS DOUBLE) / sa.n >= {_CONTAIN_THRESHOLD}
   OR CAST(i.n_shared AS DOUBLE) / sb.n >= {_CONTAIN_THRESHOLD}
"""


def _containment_oracle_sql() -> str:
    scoring = _containment_scoring_sql("kept")
    # fold the kept chain into the scoring query's WITH list
    return scoring.replace(
        "WITH sizes AS (", f"WITH {_containment_kept_sql('duck')},\nsizes AS (", 1
    )


@query(
    "dedup_containment",
    oracle=_containment_oracle_sql(),
    tags=("llm", "dedup"),
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment near-subset dedup (Broder 1997's containment
    coefficient, public): C(A⊆B) = |S(A)∩S(B)| / |S(A)| over 5-word
    shingle sets — catches quote-heavy and truncated-copy duplicates
    whose Jaccard stays LOW because the size imbalance dilutes the
    union (the verification corpus injects half-prefix copies of every
    7th document: containment 1.0, Jaccard ≈ 0.5). Same inverted-index
    shape as ``dedup_ngram_jaccard``: distinct (doc, shingle) postings,
    candidate pairs ONLY via the shingle equi-join (cost ∝ shared
    postings, never n²), sizes joined back for both directional
    coefficients; the jaccard column is emitted alongside so the
    asymmetry is visible. The hot-shingle df guard (drop shingles in
    > 1% of documents, sizes computed AFTER the filter so the
    coefficient stays internally consistent — standard stop-shingle
    removal) bounds the worst posting list, so the candidate-pair count
    can never go quadratic in the corpus; a half-prefix copy shares its
    source's RARE shingles, so guard-surviving containment stays 1.0.
    The postings table sits at the top of a DIAMOND (self-join + sizes):
    plain CTE inlining would re-shingle the corpus four times, so the
    Spark path persists it once (the graph_ops discipline) and the
    scoring side is DataFrame ops over the SAME DataFrame object —
    SQL-over-a-temp-view was measured to MISS the plan cache for the
    aggregated legs (grouping over the view re-planned the whole shingle
    chain from parquet: 3 extra corpus passes, ~2x the query), while
    DF-object reuse substitutes the InMemoryRelation reliably. The
    oracle's single WITH lets DuckDB materialize the chain. At 100 TB
    the postings join partitions on the high-cardinality 60-bit shingle
    key and stays balanced; the doc-sized ``sizes`` legs broadcast.

    r13: the ``kept`` build ITSELF re-shingled the corpus for every
    internal CTE reference (exploded feeds hot AND kept, shing feeds
    exploded AND ndocs — 4 shingle passes inside the one cached build,
    measured in the plan's InMemoryRelation subtree). The distinct
    postings table ``exploded`` now persists first; ndocs re-derives as
    its distinct doc count (identical: every ≥5-word doc emits ≥1
    shingle, so the doc sets coincide), hot and the anti-join read the
    cache (guide §5; kept-build: 4→1 shingle passes)."""
    from pyspark.sql import functions as F

    views(spark, sf_dir, "documents")
    # CTE-free persisted plan (CacheManager cannot substitute WithCTE
    # plans), and — r14, guide §2.3/§2.4 — built in ONE documents pass:
    # the oracle's UNION ALL scanned and tokenized the corpus twice (the
    # copy branch re-reads every doc, space-joins the prefix back into a
    # string and re-splits it); here each doc tokenizes once and the
    # half-prefix copy is derived from the SAME token array with slice()
    # — provably identical, because words() is a plain single-space
    # split, so re-splitting the space-joined slice returns the slice
    # itself, and the ≥K gate on the prefix (|slice| ≥ K with
    # half = max(K, |w| DIV 2) ≥ K) holds exactly when |w| ≥ K, the same
    # rows the resplit branch kept. Docs scans 2→1, tokenize passes 2→1,
    # no prefix string materialization.
    d = "spark"
    docs = tbl("documents", d)
    half = f"greatest({_CONTAIN_K}, (size(w) DIV 2))"
    exploded = spark.sql(
        f"""
SELECT DISTINCT doc_id, {hash64('sg_raw', d)} AS sg FROM (
  SELECT doc_id, {unnest_fn(d)}(sh) AS sg_raw FROM (
    SELECT v.did AS doc_id, {text.shingles('v.wd', _CONTAIN_K, d)} AS sh
    FROM (
      SELECT explode(CASE WHEN doc_id % {_CONTAIN_COPY_MOD} = 0
               THEN array(named_struct('did', doc_id, 'wd', w),
                          named_struct('did', doc_id + 1000000,
                                       'wd', slice(w, 1, {half})))
               ELSE array(named_struct('did', doc_id, 'wd', w)) END) AS v
      FROM (SELECT doc_id, {text.words('text', d)} AS w FROM {docs}) t
    ) ex WHERE size(v.wd) >= {_CONTAIN_K}
  ) shing
) x
"""
    ).persist()
    exploded.createOrReplaceTempView("slsp_contain_postings")
    # df cap as a scalar subquery (the oracle's shape — plans as a
    # Subquery, not a nested-loop join, keeping the candidate-bounded
    # lint's ≤1-BNLJ budget); ndocs re-derives as the postings' distinct
    # doc count (identical: every ≥5-word doc emits ≥1 shingle)
    hot = spark.sql(
        f"""
SELECT sg FROM slsp_contain_postings GROUP BY sg
HAVING CAST(COUNT(*) AS BIGINT) >
       greatest(CAST({_CONTAIN_DF_MIN} AS BIGINT),
                (SELECT {intdiv('nd', _CONTAIN_DF_PCT_DEN, 'spark')} FROM
                 (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS nd
                  FROM slsp_contain_postings) n))
"""
    )
    # explicit broadcast: hot is df-cap-bounded (shingles in >1% of docs)
    # and the hint keeps the anti-join strategy deterministic — unhinted,
    # the cached-relation stats flip it between runs (PLANFP flake)
    kept = exploded.join(F.broadcast(hot), "sg", "left_anti").persist()
    sizes = kept.groupBy("doc_id").agg(F.count("*").cast("bigint").alias("n"))
    # r14 (guide §2.3/§2.4): the candidate pass was a postings SELF-JOIN on
    # sg — TWO shuffles of the full postings table to meet itself, even
    # though the overwhelming majority of 5-word shingles have df=1 and can
    # never produce a pair. Group by sg instead (ONE shuffle of the
    # postings), drop df=1 groups outright (strictly smaller candidate
    # input — they contribute nothing to n_shared), and expand each
    # surviving group's sorted doc list into its (doc_a < doc_b) pairs with
    # array expressions; the pair count per group is identical to the
    # join's match count, so n_shared is bit-identical. Per-group memory is
    # bounded by the same df cap that already bounds the join's worst
    # posting list (max(5, 1% of docs) — the SMJ buffered the same group
    # per key).
    grouped = (
        kept.groupBy("sg")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ds"))
        .filter(F.size("ds") >= 2)
    )
    pairs = grouped.select(
        F.explode(
            F.expr(
                "flatten(transform(ds, (x, i) -> "
                "transform(slice(ds, i + 2, size(ds) - i - 1), "
                "y -> struct(x AS doc_a, y AS doc_b))))"
            )
        ).alias("p")
    ).select("p.doc_a", "p.doc_b")
    inter = pairs.groupBy("doc_a", "doc_b").agg(
        F.count("*").cast("bigint").alias("n_shared")
    )
    sa = F.broadcast(sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na")))
    sb = F.broadcast(sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb")))
    ns = F.col("n_shared").cast("double")
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .where((ns / F.col("na") >= _CONTAIN_THRESHOLD) | (ns / F.col("nb") >= _CONTAIN_THRESHOLD))
        .select(
            "doc_a",
            "doc_b",
            F.round(ns / F.col("na"), 6).alias("c_a_in_b"),
            F.round(ns / F.col("nb"), 6).alias("c_b_in_a"),
            F.round(ns / (F.col("na") + F.col("nb") - F.col("n_shared")), 6).alias("jaccard"),
        )
    )
