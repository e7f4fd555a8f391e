"""Training-data / RAG preparation operators beyond the round-1 surface:

- ``doc_chunk_overlap``  — overlapping token-window chunking (the RAG/
  pretraining document splitter) as a pure codegen explode, no UDF;
- ``text_pii_redact``    — regex PII scrubbing (emails, phone numbers)
  with per-doc redaction counts, byte-identical across engines;
- ``llm_train_split``    — deterministic hash-stratified train/val/test
  assignment (pure filter — no RNG, replay-stable at any scale);
- ``funnel_conversion``  — multi-stage event funnel (view → click →
  purchase with strictly-increasing event times per user);
- ``mm_arrow_stats``     — the ``mapInArrow`` UDF surface: zero-copy Arrow
  RecordBatch transform over a binary column (no pandas round-trip).

Scale notes: chunking and redaction are narrow maps (no shuffle — they
scale linearly with input splits); the split assignment is a pure
projection; the funnel is three key-local aggregates over the same
user_id partitioning; the Arrow op is a narrow map with vectorized
kernels. Nothing here materializes per-group state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import hashing
from .dialect import s, tbl, views
from .registry import query

# ---------------------------------------------------------------------------
# Overlapping token-window chunking (window 32 tokens, stride 24 → 8-token
# overlap between consecutive chunks — the standard RAG splitter shape).
# ---------------------------------------------------------------------------

_CHUNK_W = 32
_CHUNK_S = 24


def _chunk_sql(d: str) -> str:
    w, st = _CHUNK_W, _CHUNK_S
    if d == "spark":
        toks = "split(text, ' ')"
        n = "size(toks)"
        gen = "explode(sequence(0, n_chunks - 1))"
        piece = f"slice(toks, chunk_id * {st} + 1, {w})"
        join = "array_join(piece, ' ')"
        nlen = "size(piece)"
        div = "DIV"
    else:
        toks = "string_split(text, ' ')"
        n = "len(toks)"
        gen = "unnest(generate_series(0, n_chunks - 1))"
        piece = f"list_slice(toks, chunk_id * {st} + 1, chunk_id * {st} + {w})"
        join = "array_to_string(piece, ' ')"
        nlen = "len(piece)"
        div = "//"
    return f"""
WITH tok AS (
  SELECT doc_id, {toks} AS toks FROM {tbl('documents', d)}
), meta AS (
  SELECT doc_id, toks, (({n} + {st} - 1) {div} {st}) AS n_chunks FROM tok
), expanded AS (
  SELECT doc_id, toks, {gen} AS chunk_id FROM meta
), pieces AS (
  SELECT doc_id, chunk_id, {piece} AS piece FROM expanded
)
SELECT doc_id, chunk_id, {join} AS chunk_text,
       CAST({nlen} AS BIGINT) AS n_chunk_tokens
FROM pieces
"""


@query("doc_chunk_overlap", oracle=_chunk_sql("duck"), tags=("llm", "rag", "chunking"))
def doc_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking: every document becomes
    ``ceil(n_tokens / stride)`` chunks of up to 32 tokens with 8-token
    overlap. Pure codegen (split → sequence → explode → slice): a narrow
    map with one row-generator, no shuffle, no Python — chunking 100 TB is
    exactly as parallel as scanning it."""
    views(spark, sf_dir, "documents")
    return spark.sql(_chunk_sql("spark"))


# ---------------------------------------------------------------------------
# PII redaction. The synthetic corpus carries no PII, so the query plants
# deterministic emails/phones on every 7th doc, then scrubs them — the
# planted-vs-scrubbed delta is the assertable behavior.
# ---------------------------------------------------------------------------

_EMAIL_PAT = "[a-z0-9]+@[a-z][a-z.]*[a-z]"
_PHONE_PAT = "555-[0-9]+"


def _pii_sql(d: str) -> str:
    seeded = (
        f"CASE WHEN doc_id % 7 = 0 THEN concat(text, ' contact user', "
        f"{s('doc_id', d)}, '@mail.example or call 555-01', "
        f"{s('doc_id % 100', d)}) ELSE text END"
    )
    if d == "spark":
        def sub(expr: str, pat: str, rep: str) -> str:
            return f"regexp_replace({expr}, '{pat}', '{rep}')"

        def cnt(expr: str, pat: str) -> str:
            return f"regexp_count({expr}, '{pat}')"
    else:
        def sub(expr: str, pat: str, rep: str) -> str:
            return f"regexp_replace({expr}, '{pat}', '{rep}', 'g')"

        def cnt(expr: str, pat: str) -> str:
            return f"len(regexp_extract_all({expr}, '{pat}'))"

    redacted = sub(sub("seeded", _EMAIL_PAT, "<EMAIL>"), _PHONE_PAT, "<PHONE>")
    return f"""
WITH seeded_t AS (
  SELECT doc_id, {seeded} AS seeded FROM {tbl('documents', d)}
), scrubbed AS (
  SELECT doc_id,
         CAST({cnt('seeded', _EMAIL_PAT)} AS BIGINT) AS n_emails,
         CAST({cnt('seeded', _PHONE_PAT)} AS BIGINT) AS n_phones,
         {redacted} AS redacted
  FROM seeded_t
)
SELECT doc_id, n_emails, n_phones,
       {hashing.sha256_hex('redacted', d)} AS redacted_sha
FROM scrubbed
WHERE n_emails + n_phones > 0
"""


@query("text_pii_redact", oracle=_pii_sql("duck"), tags=("llm", "text", "redaction"))
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex PII scrubbing over the corpus: plant deterministic emails and
    phone numbers on every 7th document, count and replace them, and emit
    the sha256 of the scrubbed text (byte-identical redaction across
    engines). Patterns are restricted to the RE2 ∩ Java-regex dialect so
    one pattern string serves both. Narrow map — no shuffle."""
    views(spark, sf_dir, "documents")
    return spark.sql(_pii_sql("spark"))


# ---------------------------------------------------------------------------
# Deterministic stratified split — 80/10/10 by a content-stable hash.
# ---------------------------------------------------------------------------


def _split_sql(d: str) -> str:
    bucket = f"({hashing.djb2(s('doc_id', d), d)} % 100)"
    return f"""
WITH assigned AS (
  SELECT lang, n_chars,
         CASE WHEN {bucket} < 80 THEN 'train'
              WHEN {bucket} < 90 THEN 'val'
              ELSE 'test' END AS split
  FROM {tbl('documents', d)}
)
SELECT lang, split,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM assigned
GROUP BY lang, split
"""


@query("llm_train_split", oracle=_split_sql("duck"), tags=("llm", "sampling"))
def llm_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment: the split is a
    pure function of a stable content hash (djb2 of doc_id) — no RNG, no
    sampling state, identical assignment on replay and at any parallelism.
    The per-(lang, split) rollup is the stratification report."""
    views(spark, sf_dir, "documents")
    return spark.sql(_split_sql("spark"))


# ---------------------------------------------------------------------------
# Multi-stage funnel: view → click → purchase with strictly increasing
# event times per user. Comparisons run on microsecond-truncated times in
# BOTH engines (the lake timestamps are nanos; Spark reads them at micro
# precision, so the oracle must compare at the same precision).
# ---------------------------------------------------------------------------


def _funnel_sql(d: str) -> str:
    tsu = "ts" if d == "spark" else "make_timestamp(epoch_ns(ts) // 1000)"
    ev = tbl("events", d)
    w = "OVER (PARTITION BY user_id)"
    return f"""
WITH e AS (
  SELECT user_id, event_type, {tsu} AS tsu FROM {ev}
), w1 AS (
  SELECT user_id, event_type, tsu,
         MIN(CASE WHEN event_type = 'view' THEN tsu END) {w} AS t0
  FROM e
), w2 AS (
  SELECT user_id, event_type, tsu, t0,
         MIN(CASE WHEN event_type = 'click' AND tsu > t0 THEN tsu END) {w} AS t1
  FROM w1
), w3 AS (
  SELECT user_id, t1,
         MIN(CASE WHEN event_type = 'purchase' AND tsu > t1 THEN tsu END) {w} AS t2,
         t0
  FROM w2
), per_user AS (
  SELECT user_id, MAX(t0) AS t0, MAX(t1) AS t1, MAX(t2) AS t2
  FROM w3 GROUP BY user_id
)
SELECT CAST(COUNT(t0) AS BIGINT) AS n_viewed,
       CAST(COUNT(t1) AS BIGINT) AS n_clicked_after,
       CAST(COUNT(t2) AS BIGINT) AS n_purchased_after
FROM per_user
"""


@query("funnel_conversion", oracle=_funnel_sql("duck"), tags=("analytics", "funnel"))
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-stage conversion funnel: users who viewed, then clicked
    strictly after their first view, then purchased strictly after that
    first qualifying click. Each stage is a whole-partition window MIN over
    the SAME user_id partitioning — Catalyst plans all three window layers
    plus the per-user rollup on one hash exchange (plan-asserted), so the
    funnel costs a single shuffle of the fact table regardless of stage
    count. Stage comparisons run on microsecond-truncated event times in
    both engines."""
    views(spark, sf_dir, "events")
    return spark.sql(_funnel_sql("spark"))


# ---------------------------------------------------------------------------
# mapInArrow — the zero-copy Arrow surface (no pandas conversion): the
# right UDF tier for binary payloads where pandas object-dtype boxing
# dominates. Kernel work happens in vectorized pyarrow.compute calls.
# ---------------------------------------------------------------------------


def _arrow_stats_sql(d: str) -> str:
    if d == "spark":
        blen = "length(CAST(text AS BINARY))"
        nsp = "length(text) - length(replace(text, ' ', ''))"
    else:
        blen = "octet_length(encode(text))"
        nsp = "length(text) - length(replace(text, ' ', ''))"
    return f"""
SELECT doc_id,
       CAST({blen} AS BIGINT) AS byte_len,
       CAST({nsp} AS BIGINT) AS n_spaces
FROM {tbl('documents', d)}
"""


@query("mm_arrow_stats", oracle=_arrow_stats_sql("duck"), tags=("multimodal", "udf", "arrow"))
def mm_arrow_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column stats via ``mapInArrow``: the RecordBatch flows from
    the JVM to pyarrow with zero copy and zero pandas boxing — the UDF
    tier for multimodal blobs where per-row Python objects are the cost.
    Both outputs come from vectorized pyarrow.compute kernels; the oracle
    recomputes them relationally."""
    docs = views(spark, sf_dir, "documents")["documents"]
    blobs = docs.select(
        "doc_id", F.col("text").cast("binary").alias("blob")
    )

    def fn(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        for batch in batches:
            doc_id = batch.column("doc_id")
            blob = batch.column("blob")
            byte_len = pc.cast(pc.binary_length(blob), pa.int64())
            text = pc.cast(blob, pa.string())
            n_spaces = pc.cast(
                pc.count_substring(text, " "), pa.int64()
            )
            yield pa.RecordBatch.from_arrays(
                [doc_id, byte_len, n_spaces],
                names=["doc_id", "byte_len", "n_spaces"],
            )

    return blobs.mapInArrow(
        fn, "doc_id bigint, byte_len bigint, n_spaces bigint"
    )


# ---------------------------------------------------------------------------
# Benchmark-contamination check (shingle containment).
# ---------------------------------------------------------------------------

_CONTAM_DF_CAP = 50  # drop shingles occurring in more than this many docs
_CONTAM_THRESHOLD = 0.8


def _contamination_sql(d: str, sh_src: str | None = None) -> str:
    """On the Spark side ``sh_src`` names a pre-materialized exploded
    (doc_id, shingle) view — the shingle table feeds bench/train sides,
    the document-frequency table, and the size table, and CTE inlining
    would re-shingle the corpus once per reference (15 scans observed)."""
    from ..functions import text as textfn
    from .llm_ops import _doc_corpus
    from .dialect import arr_distinct, arr_len, unnest_fn

    if sh_src:
        head = f"WITH shx AS (SELECT doc_id, g FROM {sh_src})"
    else:
        head = f"""
WITH corpus AS ({_doc_corpus(d)}),
toks AS (SELECT doc_id, {textfn.words('text', d)} AS w FROM corpus),
sh AS (
  SELECT doc_id, {arr_distinct(textfn.shingles('w', 3, d), d)} AS s
  FROM toks WHERE {arr_len('w', d)} >= 3
),
shx AS (SELECT doc_id, {unnest_fn(d)}(s) AS g FROM sh)"""
    return f"""{head},
bx AS (
  SELECT doc_id AS bench_id, g FROM shx
  WHERE doc_id < 1000000 AND doc_id % 25 = 0
),
tx AS (
  SELECT doc_id AS train_id, g FROM shx
  WHERE doc_id >= 1000000 OR doc_id % 25 <> 0
),
doc_freq AS (
  SELECT g, COUNT(*) AS df FROM (
    SELECT bench_id AS doc_id, g FROM bx UNION ALL SELECT train_id, g FROM tx
  ) u GROUP BY g
),
keep AS (SELECT g FROM doc_freq WHERE df <= {_CONTAM_DF_CAP}),
pairs AS (
  SELECT bx.bench_id, tx.train_id, CAST(COUNT(*) AS BIGINT) AS n_shared
  FROM bx JOIN keep ON bx.g = keep.g JOIN tx ON tx.g = bx.g
  GROUP BY bx.bench_id, tx.train_id
),
sizes AS (
  SELECT bench_id, CAST(COUNT(*) AS BIGINT) AS n_bench FROM bx GROUP BY bench_id
)
SELECT p.bench_id, p.train_id, p.n_shared, z.n_bench,
       round(CAST(p.n_shared AS DOUBLE) / z.n_bench, 6) AS containment
FROM pairs p JOIN sizes z ON z.bench_id = p.bench_id
WHERE CAST(p.n_shared AS DOUBLE) / z.n_bench >= {_CONTAM_THRESHOLD}
"""


@query(
    "text_contamination_check",
    oracle=_contamination_sql("duck"),
    tags=("llm", "text", "contamination"),
)
def text_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination detection: flag training documents that
    contain ≥80% of a benchmark document's word-3-gram shingles (containment
    |bench ∩ train| / |bench| — the asymmetric measure used for test-set
    decontamination, distinct from Jaccard). Candidate generation is an
    inverted-index equi-join on the shingle key, with shingles occurring in
    more than 50 documents dropped first — the stopword-shingle guard that
    both matches decontamination practice and removes the hot-key skew a
    common trigram would inject into the shuffle. The corpus reuses the
    injected exact/near duplicates, so flagged pairs exist at every SF.
    The exploded (doc_id, shingle) table is persisted once — it feeds both
    join sides, the document-frequency guard, and the benchmark sizes."""
    from ..functions import text as textfn
    from .llm_ops import _doc_corpus
    from .dialect import arr_distinct, arr_len

    views(spark, sf_dir, "documents")
    shx = spark.sql(
        f"""
SELECT doc_id, explode(s) AS g FROM (
  SELECT doc_id, {arr_distinct(textfn.shingles('w', 3, 'spark'), 'spark')} AS s
  FROM (SELECT doc_id, {textfn.words('text', 'spark')} AS w
        FROM ({_doc_corpus('spark')}) corpus) toks
  WHERE {arr_len('w', 'spark')} >= 3
) sh"""
    ).persist()
    shx.createOrReplaceTempView("slsp_contam_shx")
    return spark.sql(_contamination_sql("spark", sh_src="slsp_contam_shx"))


# ---------------------------------------------------------------------------
# Python UDTF surface (SURVEY §2.7 U3 — real @udtf, not just mapInPandas).
# ---------------------------------------------------------------------------


def _udtf_sql(d: str) -> str:
    """Oracle: the same sentence split as pure SQL (1-indexed DuckDB list
    enumerated explicitly so order matches the UDTF's yield order)."""
    docs = tbl("documents", d)
    if d == "spark":
        # rendered only for documentation; the Spark path runs the UDTF
        return f"""
SELECT doc_id, posexplode(split(text, '\\\\. ')) AS (sent_idx, sentence)
FROM {docs} WHERE doc_id % 20 = 0
"""
    return f"""
WITH parts AS (
  SELECT doc_id, string_split(text, '. ') AS p FROM {docs} WHERE doc_id % 20 = 0
)
SELECT doc_id, CAST(i - 1 AS INTEGER) AS sent_idx, p[i] AS sentence
FROM parts, (SELECT unnest(generate_series(1, 10000)) AS i) idx
WHERE i <= len(p)
"""


@query("sql_python_udtf", oracle=_udtf_sql("duck"), tags=("sql", "udf", "udtf"))
def sql_python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real Python UDTF (Spark 4 ``@udtf``): a sentence splitter invoked as
    a LATERAL table function, one input row fanning out to N output rows —
    the genuine UDTF execution path (per-partition Python worker streaming
    Arrow batches), not a mapInPandas approximation. The oracle replays the
    split relationally. UDTFs are the slow path by design — this is API
    surface; the built-in ``posexplode(split())`` form in the oracle's Spark
    rendering is the production rewrite when semantics fit a builtin."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="sent_idx: int, sentence: string")
    class SentenceSplit:
        def eval(self, text: str):
            if text is None:
                return
            for i, piece in enumerate(text.split(". ")):
                yield i, piece

    spark.udtf.register("slsp_sentence_split", SentenceSplit)
    views(spark, sf_dir, "documents")
    return spark.sql(
        f"""
SELECT d.doc_id, s.sent_idx, s.sentence
FROM {tbl('documents', 'spark')} d
JOIN LATERAL slsp_sentence_split(d.text) s
WHERE d.doc_id % 20 = 0
"""
    )


# ---------------------------------------------------------------------------
# Preference-pair construction (RLHF / DPO data prep).
# ---------------------------------------------------------------------------


def _pref_pairs_sql(d: str) -> str:
    """Deterministic integer quality score; argmax/argmin by a composite
    (score, doc_id) key encoded as one BIGINT so DuckDB's scalar-keyed
    arg_max matches Spark's (both engines order identically)."""
    if d == "spark":
        words = "split(text, ' ')"
        alpha = "size(filter(split(text, ' '), w -> w rlike '[a-z]'))"
        nw = "size(split(text, ' '))"
        amax, amin = "max_by", "min_by"
    else:
        words = "string_split(text, ' ')"
        alpha = "len(list_filter(string_split(text, ' '), w -> regexp_matches(w, '[a-z]')))"
        nw = "len(string_split(text, ' '))"
        amax, amin = "arg_max", "arg_min"
    return f"""
WITH scored AS (
  SELECT doc_id, lang,
         CAST({alpha} AS BIGINT) * 1000 + CAST({nw} AS BIGINT) AS score
  FROM {tbl('documents', d)}
),
keyed AS (
  SELECT doc_id, lang, score, score * 10000000 + doc_id AS k FROM scored
)
SELECT lang,
       {amax}(doc_id, k) AS chosen_id,
       {amax}(score, k) AS chosen_score,
       {amin}(doc_id, k) AS rejected_id,
       {amin}(score, k) AS rejected_score,
       {amax}(score, k) - {amin}(score, k) AS score_gap,
       CAST(COUNT(*) AS BIGINT) AS n_candidates
FROM keyed
GROUP BY lang
"""


@query("llm_preference_pairs", oracle=_pref_pairs_sql("duck"), tags=("llm", "rlhf", "agg"))
def llm_preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Preference-pair construction for RLHF/DPO: per language, the
    highest- and lowest-scoring documents under a deterministic integer
    quality score become the (chosen, rejected) pair, with the score gap
    as the pair's margin. The argmax/argmin ride one composite BIGINT key
    (score then doc_id) so ties break identically in both engines — one
    partial+final aggregate, no window, no sort."""
    views(spark, sf_dir, "documents")
    return spark.sql(_pref_pairs_sql("spark"))
