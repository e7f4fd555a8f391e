"""Round-5 embedding/vector diagnostics: one power-iteration step toward
the top principal component, distance-to-centroid outlier mining,
per-dimension variance profiling, and a bottom-k sketch Jaccard estimate
with its exact error — the linear-algebra and sketch companions of the
ANN/PQ family in :mod:`llm_ops`.

Determinism: every cross-row float reduction rounds its addend to 12
decimals and sums through DECIMAL (order-independent); every within-row
vector fold uses the fixed left-to-right flat-sum form from
:mod:`dialect` (IEEE ops in one order are bit-identical across engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions import hashing
from .dialect import dot, tbl, to_double_arr, views
from .llm_ops import DIM
from .registry import query


def _dims_cte(d: str) -> str:
    """e(vec_id, dim BIGINT 1-based, x DOUBLE) — the exploded corpus."""
    if d == "spark":
        return f"""
e AS (
  SELECT vec_id, CAST(pos + 1 AS BIGINT) AS dim, CAST(x AS DOUBLE) AS x
  FROM (SELECT vec_id, posexplode(embedding) AS (pos, x)
        FROM {tbl('embeddings', d)})
)"""
    return f"""
e AS (
  SELECT vec_id,
         CAST(generate_subscripts(embedding, 1) AS BIGINT) AS dim,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM {tbl('embeddings', d)}
)"""


def _arr_sum(a: str, d: str) -> str:
    """Fixed-order sum of a DOUBLE array's elements (v0 = all-ones dot)."""
    if d == "spark":
        terms = " + ".join(f"{a}[{i}]" for i in range(DIM))
        return f"(CAST(0 AS DOUBLE) + {terms})"
    return (
        f"list_reduce(list_prepend(CAST(0 AS DOUBLE), {a}), (x, y) -> x + y)"
    )


_D12 = "CAST(round({x}, 12) AS DECIMAL(38,12))"


# ---------------------------------------------------------------------------
# emb_power_iteration — one step toward the top principal component.
# ---------------------------------------------------------------------------


def _power_iter_sql(d: str) -> str:
    return f"""
WITH base AS (
  SELECT vec_id, {to_double_arr('embedding', d)} AS emb
  FROM {tbl('embeddings', d)}
),
{_dims_cte(d).lstrip()},
r AS (
  SELECT vec_id, {_arr_sum('emb', d)} AS rv FROM base
),
v1 AS (
  SELECT e.dim,
         CAST(SUM({_D12.format(x='r.rv * e.x')}) AS DOUBLE) AS v
  FROM e JOIN r ON r.vec_id = e.vec_id
  GROUP BY e.dim
),
nrm AS (
  SELECT sqrt(CAST(SUM({_D12.format(x='v * v')}) AS DOUBLE)) AS nv FROM v1
)
SELECT v1.dim, round(v1.v / t.nv, 12) AS component
FROM v1 CROSS JOIN nrm t
ORDER BY v1.dim
"""


@query(
    "emb_power_iteration",
    oracle=_power_iter_sql("duck"),
    tags=("llm", "linear-algebra"),
)
def emb_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One power-iteration step toward the corpus's top principal component
    (von Mises iteration, public): v1 = normalize(Xᵀ(X·v0)) with v0 =
    all-ones — matrix-free, so the Gram matrix is never materialized.
    X·v0 is a per-row fixed-order fold (codegen); Xᵀr is a per-dimension
    grouped sum whose addends round to 12 and accumulate in DECIMAL
    (order-independent across 1000 executors); the normalizer reduces 64
    per-dim rows the same way. Two shuffles total — (vec_id equi-join,
    dim-keyed agg) — both on natural keys; the dominant-direction vector
    this emits is the whitening/deduplication preprocessor's first step."""
    views(spark, sf_dir, "embeddings")
    return spark.sql(_power_iter_sql("spark"))


# ---------------------------------------------------------------------------
# emb_centroid_outliers — far-from-centroid vectors (noise mining).
# ---------------------------------------------------------------------------

_OUT_TOP = 20


def _centroid_outlier_sql(d: str) -> str:
    return f"""
WITH {_dims_cte(d).lstrip()},
c AS (
  SELECT dim,
         round(CAST(SUM({_D12.format(x='x')}) AS DOUBLE) / COUNT(*), 12) AS m
  FROM e GROUP BY dim
),
d2 AS (
  SELECT e.vec_id,
         CAST(SUM({_D12.format(x='(e.x - c.m) * (e.x - c.m)')}) AS DOUBLE)
           AS ss
  FROM e JOIN c ON c.dim = e.dim
  GROUP BY e.vec_id
)
SELECT vec_id, round(sqrt(ss), 12) AS centroid_dist
FROM d2
ORDER BY centroid_dist DESC, vec_id
LIMIT {_OUT_TOP}
"""


@query(
    "emb_centroid_outliers",
    oracle=_centroid_outlier_sql("duck"),
    tags=("llm", "similarity", "profiling"),
)
def emb_centroid_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distance-to-centroid outlier mining: the global centroid is the
    per-dimension exact-DECIMAL mean, each vector's distance to it is a
    dim-keyed join + per-vector DECIMAL sum of squares, and the top-20
    is a TakeOrdered heap — never a global sort. Far-from-centroid
    vectors are the classic embedding-space junk signal (mojibake, empty
    pages, OCR noise) a curation pipeline quarantines before
    clustering; the same plan shape scales to any corpus because the
    centroid is 64 broadcast rows and both shuffles key on vec_id/dim."""
    views(spark, sf_dir, "embeddings")
    return spark.sql(_centroid_outlier_sql("spark"))


# ---------------------------------------------------------------------------
# emb_dim_variance — per-dimension moments (dead/collapsed dims).
# ---------------------------------------------------------------------------


def _dim_variance_sql(d: str) -> str:
    # var = E[x²] − E[x]²: both expectations from exact DECIMAL sums over
    # round-12 addends, combined in one fixed double expression.
    return f"""
WITH {_dims_cte(d).lstrip()},
m AS (
  SELECT dim, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM({_D12.format(x='x')}) AS DOUBLE) AS sx,
         CAST(SUM({_D12.format(x='x * x')}) AS DOUBLE) AS sxx
  FROM e GROUP BY dim
)
SELECT dim, n,
       round(sx / n, 12) AS mean_x,
       round(sxx / n - (sx / n) * (sx / n), 12) AS var_x
FROM m
ORDER BY dim
"""


@query(
    "emb_dim_variance",
    oracle=_dim_variance_sql("duck"),
    tags=("llm", "profiling"),
)
def emb_dim_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension mean/variance of the embedding corpus — the
    dead-dimension and collapse diagnostic (near-zero variance dims
    carry no signal and waste index bytes; wildly unequal variances
    argue for whitening before cosine). One exploded pass, one dim-keyed
    aggregation of exact DECIMAL partials: 64 output rows regardless of
    corpus size, fully map-side combinable."""
    views(spark, sf_dir, "embeddings")
    return spark.sql(_dim_variance_sql("spark"))


# ---------------------------------------------------------------------------
# sketch_bottomk_jaccard_eval — bottom-k signature Jaccard vs exact.
# ---------------------------------------------------------------------------

_BK_K = 128


def _bottomk_sql(d: str) -> str:
    unnest = (
        f"SELECT doc_id, explode(split(text, ' ')) AS word FROM {tbl('documents', d)}"
        if d == "spark"
        else f"SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM {tbl('documents', d)}"
    )
    h = hashing.djb2("term", d)
    return f"""
WITH toks AS (
  SELECT doc_id, lower(word) AS term FROM ({unnest}) t
),
uni AS (
  SELECT term,
         MAX(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS in_a,
         MAX(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END) AS in_b
  FROM toks
  WHERE doc_id % 2 = 0 OR doc_id % 3 = 0
  GROUP BY term
),
hashed AS (
  SELECT term, in_a, in_b, {h} AS hv FROM uni
),
bk AS (
  SELECT in_a, in_b FROM hashed ORDER BY hv, term LIMIT {_BK_K}
),
est AS (
  SELECT CAST(SUM(in_a * in_b) AS BIGINT) AS n_both_k,
         CAST(COUNT(*) AS BIGINT) AS k
  FROM bk
),
exact AS (
  SELECT CAST(SUM(in_a * in_b) AS BIGINT) AS n_inter,
         CAST(COUNT(*) AS BIGINT) AS n_union
  FROM uni
)
SELECT e.k, e.n_both_k,
       round(CAST(e.n_both_k AS DOUBLE) / e.k, 12) AS jaccard_est,
       x.n_inter, x.n_union,
       round(CAST(x.n_inter AS DOUBLE) / x.n_union, 12) AS jaccard_exact,
       round(abs(CAST(e.n_both_k AS DOUBLE) / e.k
                 - CAST(x.n_inter AS DOUBLE) / x.n_union), 12) AS abs_err
FROM est e CROSS JOIN exact x
"""


@query(
    "sketch_bottomk_jaccard_eval",
    oracle=_bottomk_sql("duck"),
    tags=("sketch", "evaluation"),
)
def sketch_bottomk_jaccard_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bottom-k sketch Jaccard between two corpus slices (even vs
    third doc_ids) with its exact error — the estimator behind scalable
    set-overlap monitoring (Cohen & Kaplan 2007; the single-permutation
    cousin of MinHash, public): J ≈ |{x ∈ bottom-k(A∪B) : x ∈ A∩B}| / k.
    The union's membership bits come from ONE grouped pass over the
    token stream (map-side combinable MAX flags keyed on the term); the
    k smallest hashes are a TakeOrdered heap under the deterministic
    two-dialect djb2 fold; the eval emits both the estimate and the
    exact Jaccard so the error itself is driver-hash-checked — the same
    eval-as-operator pattern as the ANN recall floors."""
    views(spark, sf_dir, "documents")
    return spark.sql(_bottomk_sql("spark"))
