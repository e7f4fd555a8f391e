"""Round-6 wave: web provenance, tokenizer application, cross-modal dedup,
and keep-best cluster resolution — the curation steps between "crawl" and
"training mix" that the earlier waves' dedup/quality/sampling operators
assume have already happened.

* **URL provenance** (``url_parse_extract``, ``url_canonical_dedup``,
  ``url_registrable_domain``, ``url_domain_content_dedup``): every
  web-scale corpus keys provenance by URL — parsing, canonicalization
  (scheme/case/www/tracking-params), and registrable-domain grouping
  (public-suffix longest-match) are the standard steps (CCNet, RefinedWeb
  §3.1 dedup keys; suffix semantics per the public-suffix-list algorithm).
  The driver's ``documents`` table carries no URL column, so each query
  SYNTHESIZES a deterministic URL per document from its attributes (the
  same house pattern as the base64 envelope in stream_ingest) — messy on
  purpose: scheme case, WWW prefixes, ports, trailing slashes, utm params,
  fragments — then runs the real extraction logic with a full oracle.
* **Tokenizer application** (``text_bpe_encode``,
  ``text_bpe_compression_by_lang``): the serving sibling of
  ``text_bpe_merge_candidates`` — applying an ORDERED merge list to text
  (Sennrich et al. 2016): per word, characters are ``|``-delimited and
  each merge rule rewrites in priority order via boundary-anchored
  left-to-right ``replace`` (byte-identical across engines; proven equal
  to textbook greedy BPE in tests). The merge table is a compile-time
  constant (broadcast literal); cost ∝ corpus tokens, pure string
  codegen, no Python.
* **Cross-modal joint dedup** (``mm_crossmodal_joint_dedup``): image
  near-dup candidates (60-bit phash, 16-bit pigeonhole quarters —
  llm_ops._phash_sql's construction) CONFIRMED by text-side token Jaccard
  computed only for those candidate pairs — the candidate-bounded
  two-modality pipeline (image recall, text precision).
* **Keep-best resolution** (``data_dedup_keep_best``): after clustering,
  a curation pipeline keeps the best member (longest/highest-quality),
  not an arbitrary one — one windowed rank per cluster key.

Determinism contract as per the registry docstring; every count is CAST
to BIGINT (DuckDB widens SUM/COUNT arithmetic), every ratio divided once
in DOUBLE and rounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import hashing
from .dialect import inline_values, re_replace_all, s, tbl, views
from .registry import query

# ---------------------------------------------------------------------------
# Synthesized per-document URL (deterministic, deliberately messy).
# ---------------------------------------------------------------------------


def _url_expr(d: str) -> str:
    sid = s("doc_id % 40", d)
    tld = (
        "CASE lang WHEN 'en' THEN 'example.com' WHEN 'de' THEN 'beispiel.de' "
        "WHEN 'zh' THEN 'example.com.cn' WHEN 'fr' THEN 'exemple.fr' "
        "ELSE 'ejemplo.es' END"
    )
    return (
        "concat(CASE WHEN doc_id % 4 = 0 THEN 'HTTP://' ELSE 'https://' END, "
        "CASE WHEN doc_id % 7 = 0 THEN 'WWW.' ELSE '' END, "
        f"source, '.', {tld}, "
        "CASE WHEN doc_id % 5 = 0 THEN ':8080' ELSE '' END, "
        f"'/', lang, '/doc-', {sid}, "
        "CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END, "
        "CASE WHEN doc_id % 6 = 0 THEN '?utm_source=feed&ref=1' ELSE '' END, "
        "CASE WHEN doc_id % 11 = 0 THEN '#frag' ELSE '' END)"
    )


_RE_HOSTPORT = "'^[A-Za-z]+://([^/?#]+)'"
_RE_PATH = "'^[A-Za-z]+://[^/?#]*([^?#]*)'"


def _host_cte(d: str) -> str:
    """doc → lowercase host with the www. prefix stripped (canonical
    hostname); port split off separately."""
    return f"""
u AS (SELECT doc_id, source, lang, {_url_expr(d)} AS url FROM {tbl('documents', d)}),
hp AS (
  SELECT doc_id, source, lang, url,
         lower(regexp_extract(regexp_extract(url, {_RE_HOSTPORT}, 1), '^([^:]+)', 1))
           AS hostraw,
         regexp_extract(regexp_extract(url, {_RE_HOSTPORT}, 1), ':([0-9]+)$', 1)
           AS port_str
  FROM u
),
host AS (
  SELECT doc_id, source, lang, url, port_str,
         CASE WHEN hostraw LIKE 'www.%' THEN substr(hostraw, 5) ELSE hostraw END
           AS host
  FROM hp
)"""


def _parse_sql(d: str) -> str:
    return f"""
WITH {_host_cte(d)}
SELECT doc_id,
       lower(regexp_extract(url, '^([A-Za-z]+)://', 1)) AS scheme,
       host,
       port_str,
       regexp_extract(url, {_RE_PATH}, 1) AS path,
       regexp_extract(url, '[?]([^#]*)', 1) AS query_string,
       regexp_extract(url, '#(.*)$', 1) AS fragment
FROM host
ORDER BY doc_id
"""


@query("url_parse_extract", oracle=_parse_sql("duck"), tags=("web", "text"))
def url_parse_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL structural parse — scheme, host (lowercased, www-stripped),
    port, path, query, fragment — as pure regexp extraction (verified
    byte-identical semantics across engines, incl. the empty-string
    no-match convention). One projection pass over the corpus, whole-stage
    codegen, no shuffle before the output sort."""
    views(spark, sf_dir, "documents")
    return spark.sql(_parse_sql("spark"))


def _canonical_sql(d: str) -> str:
    return f"""
WITH {_host_cte(d)},
parts AS (
  SELECT doc_id, host, port_str,
         regexp_extract(url, {_RE_PATH}, 1) AS rawpath
  FROM host
),
canon AS (
  SELECT doc_id,
         concat('https://', host,
                CASE WHEN port_str = '' THEN '' ELSE concat(':', port_str) END,
                CASE WHEN rawpath LIKE '%/' AND length(rawpath) > 1
                     THEN substr(rawpath, 1, length(rawpath) - 1)
                     ELSE rawpath END) AS canonical_url
  FROM parts
)
SELECT canonical_url,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(doc_id) AS BIGINT) AS canonical_doc
FROM canon
GROUP BY canonical_url
HAVING COUNT(*) > 1
ORDER BY n_docs DESC, canonical_url
"""


@query("url_canonical_dedup", oracle=_canonical_sql("duck"), tags=("web", "dedup"))
def url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization dedup (CCNet-style): force https, lowercase
    host, strip www./tracking-params/fragment/trailing slash, THEN group —
    scheme-case and decoration variants of the same page collapse to one
    canonical key with a deterministic representative (min doc id). The
    group-by is on the canonical key (high cardinality — even key-space
    shuffle); no window, no self-join."""
    views(spark, sf_dir, "documents")
    return spark.sql(_canonical_sql("spark"))


# public-suffix slice for the synthesized TLDs — longest-match semantics,
# exactly the public-suffix-list algorithm restricted to suffixes present
_SUFFIXES = "('com'),('de'),('fr'),('es'),('cn'),('com.cn')"


def _registrable_cte(d: str) -> str:
    return f"""
sfx AS ({inline_values(_SUFFIXES, 'sx', 'suffix', d)}),
m AS (
  SELECT h.doc_id, h.source, h.host, sx.suffix,
         ROW_NUMBER() OVER (
           PARTITION BY h.doc_id ORDER BY length(sx.suffix) DESC, sx.suffix
         ) AS rk
  FROM host h JOIN sfx sx ON h.host LIKE concat('%.', sx.suffix)
),
reg AS (
  SELECT doc_id, source,
         concat(regexp_extract(substr(host, 1, length(host) - length(suffix) - 1),
                               '([^.]+)$', 1),
                '.', suffix) AS registrable
  FROM m WHERE rk = 1
)"""


def _registrable_sql(d: str) -> str:
    return f"""
WITH {_host_cte(d)},
{_registrable_cte(d)}
SELECT registrable AS registrable_domain,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
FROM reg
GROUP BY registrable
ORDER BY n_docs DESC, registrable_domain
"""


@query("url_registrable_domain", oracle=_registrable_sql("duck"), tags=("web", "agg"))
def url_registrable_domain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registrable-domain (eTLD+1) extraction via public-suffix
    longest-match: hosts join a broadcast literal suffix table on a
    suffix LIKE, the longest match wins (one windowed rank PARTITIONED BY
    doc — high cardinality), and the registrable domain is the last label
    before the suffix. Multi-label suffixes (com.cn) exercise the rule a
    naive last-two-labels split gets wrong. Per-domain doc/source counts
    are the domain-mix profile a corpus audit starts from."""
    views(spark, sf_dir, "documents")
    return spark.sql(_registrable_sql("spark"))


def _domain_content_sql(d: str) -> str:
    # prefix fingerprint, not full-text sha: the test corpus has no exact
    # full-text dups, so the audit would be vacuously zero; a 64-char
    # prefix fingerprint is the same dedup-key shape (and what a
    # production near-dup shard key looks like) with real collisions
    sha = hashing.sha256_hex("substr(dd.text, 1, 64)", d)
    return f"""
WITH {_host_cte(d)},
{_registrable_cte(d)},
hashed AS (
  SELECT r.registrable, r.doc_id, {sha} AS h
  FROM reg r JOIN {tbl('documents', d)} dd ON dd.doc_id = r.doc_id
)
SELECT registrable AS registrable_domain,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT h) AS BIGINT) AS n_unique,
       CAST(COUNT(*) - COUNT(DISTINCT h) AS BIGINT) AS n_dup_rows
FROM hashed
GROUP BY registrable
ORDER BY registrable_domain
"""


@query(
    "url_domain_content_dedup",
    oracle=_domain_content_sql("duck"),
    tags=("web", "dedup"),
)
def url_domain_content_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain content dedup accounting — the (registrable_domain,
    content_sha) dedup key CCNet/RefinedWeb shard by: grouping dedup
    state by domain keeps each shard's hash set independent (domain-local
    dedup parallelizes perfectly; the global pass is a later exact-hash
    job), and the per-domain dup rate is the signal that flags mirror
    and boilerplate farms. Content hash joins back on the doc key — no
    second corpus scan through the URL machinery."""
    views(spark, sf_dir, "documents")
    return spark.sql(_domain_content_sql("spark"))


# ---------------------------------------------------------------------------
# BPE tokenizer application (Sennrich et al. 2016) — ordered merge rules
# over space-joined characters, each applied as left-to-right
# non-overlapping replace (byte-identical across engines).
# ---------------------------------------------------------------------------

_BPE_MERGES = [
    ("t h", "th"),
    ("th e", "the"),
    ("i n", "in"),
    ("e r", "er"),
    ("a t", "at"),
    ("o w", "ow"),
    ("r ow", "row"),
    ("d a", "da"),
    ("da t", "dat"),
    ("dat a", "data"),
    ("s t", "st"),
    ("a n", "an"),
]


def _bpe_encode_expr(word: str, d: str) -> str:
    """``|``-delimit characters, then apply every merge in rank order.

    Tokens carry EXPLICIT boundaries on both sides (``|d|at|a|``) and each
    rule's pattern includes them (``'|a|t|' → '|at|'``), so a pair can
    never falsely match across a multi-char token (``'d a'`` inside
    ``d|at``— the bug a naive space-join has). Each rule is applied twice:
    non-overlapping replace shares one delimiter between adjacent
    occurrences (``|x|y|x|y|``), and the second pass catches the skipped
    one; tests/test_web_ops.py proves the chain byte-equal to textbook
    greedy BPE over every corpus word, and the causal-order test pins the
    merge-table precondition (no rule's inputs produced by a later rule)."""
    enc = f"concat({re_replace_all(word, '(.)', '|$1', d)}, '|')"
    for a, b in _BPE_MERGES:
        pat = "|" + a.replace(" ", "|") + "|"
        rep = "|" + b + "|"
        enc = f"replace({enc}, '{pat}', '{rep}')"
        enc = f"replace({enc}, '{pat}', '{rep}')"
    return enc


def _bpe_doc_cte(d: str) -> str:
    gen = "explode" if d == "spark" else "unnest"
    enc = _bpe_encode_expr("word", d)
    return f"""
words AS (
  SELECT doc_id, {gen}(split(text, ' ')) AS word FROM {tbl('documents', d)}
),
encw AS (
  SELECT doc_id, word, {enc} AS enc FROM words WHERE word <> ''
),
per_word AS (
  SELECT doc_id, length(word) AS n_chars,
         length(enc) - length(replace(enc, '|', '')) - 1 AS n_tokens
  FROM encw
),
per_doc AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_words,
         CAST(SUM(n_chars) AS BIGINT) AS n_chars,
         CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
  FROM per_word GROUP BY doc_id
)"""


def _bpe_encode_sql(d: str) -> str:
    return f"""
WITH {_bpe_doc_cte(d)}
SELECT doc_id, n_words, n_chars, n_tokens,
       round(CAST(n_chars AS DOUBLE) / n_tokens, 6) AS chars_per_token
FROM per_doc
ORDER BY doc_id
"""


@query("text_bpe_encode", oracle=_bpe_encode_sql("duck"), tags=("llm", "text", "tokenizer"))
def text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer APPLICATION at corpus scale — the serving sibling of
    ``text_bpe_merge_candidates`` (which learns merges; this applies
    them). Each word's characters are ``|``-delimited and the ordered
    merge table rewrites pair-by-pair with boundary-anchored replaces
    (proven byte-equal to textbook greedy BPE — see _bpe_encode_expr). The
    merge list is a compile-time constant, so the whole encode is one
    chain of string intrinsics inside whole-stage codegen: cost ∝ corpus
    tokens, zero Python, zero shuffle before the per-doc fold — exactly
    how a 100 TB pre-tokenization pass should look. Emits per-doc token
    counts and compression (chars/token), the tokenizer-fit metric."""
    views(spark, sf_dir, "documents")
    return spark.sql(_bpe_encode_sql("spark"))


def _bpe_lang_sql(d: str) -> str:
    return f"""
WITH {_bpe_doc_cte(d)}
SELECT dd.lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(p.n_tokens) AS BIGINT) AS total_tokens,
       round(CAST(SUM(p.n_chars) AS DOUBLE) / SUM(p.n_tokens), 6)
         AS chars_per_token
FROM per_doc p JOIN {tbl('documents', d)} dd ON dd.doc_id = p.doc_id
GROUP BY dd.lang
ORDER BY dd.lang
"""


@query(
    "text_bpe_compression_by_lang",
    oracle=_bpe_lang_sql("duck"),
    tags=("llm", "text", "tokenizer"),
)
def text_bpe_compression_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language — the compression-parity audit
    every multilingual tokenizer needs (an English-heavy merge table
    tokenizes other languages into more, shorter tokens; this query makes
    that inequality a number). Re-uses the encode CTE and folds exact
    BIGINT sums per language; the single division happens once in DOUBLE."""
    views(spark, sf_dir, "documents")
    return spark.sql(_bpe_lang_sql("spark"))


# ---------------------------------------------------------------------------
# Iterated BPE trainer (VERDICT r6 #7) — k rounds of count → argmax → merge,
# producing the causally-ordered merge table text_bpe_encode then applies.
# ---------------------------------------------------------------------------

_BPE_TRAIN_K = 8


def _bpe_enc0(d: str) -> str:
    """Round-0 tokenization: every corpus word as |-delimited characters
    (the same boundary-anchored scheme as :func:`_bpe_encode_expr`)."""
    return f"concat({re_replace_all('word', '(.)', '|$1', d)}, '|')"


def _bpe_train_sql(d: str) -> str:
    """The k-round trainer unrolled as CTE rounds (DuckDB oracle — the
    Spark side is the bounded iterative loop in :func:`text_bpe_train_k`).
    Each round: adjacent-token pair counts over the current corpus
    tokenization, deterministic argmax (count DESC, then lexicographic),
    then a boundary-anchored double-replace merges the winner everywhere.
    ``MATERIALIZED`` pins each round's tokenization — every w{r} is
    referenced twice (pair counts + next rewrite), so inlining would make
    the round chain exponential."""
    assert d == "duck"
    parts = [
        f"""w0 AS MATERIALIZED (
  SELECT {_bpe_enc0(d)} AS enc
  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM {tbl('documents', d)}) x
  WHERE word <> ''
)"""
    ]
    for r in range(1, _BPE_TRAIN_K + 1):
        parts.append(
            f"""p{r} AS (
  SELECT pr[1] AS a, pr[2] AS b FROM (
    SELECT unnest(list_transform(range(1, len(t)), i -> [t[i], t[i+1]])) AS pr
    FROM (SELECT list_filter(string_split(enc, '|'), x -> x <> '') AS t
          FROM w{r - 1}) q
  ) z
),
b{r} AS (
  SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n
  FROM p{r} GROUP BY a, b ORDER BY n DESC, a, b LIMIT 1
),
w{r} AS MATERIALIZED (
  SELECT replace(replace(enc, m.pt, m.rp), m.pt, m.rp) AS enc
  FROM w{r - 1} CROSS JOIN
       (SELECT '|' || a || '|' || b || '|' AS pt,
               '|' || a || b || '|' AS rp FROM b{r}) m
)"""
        )
    union = "\n  UNION ALL\n".join(
        f"  SELECT CAST({r} AS BIGINT) AS rank, a AS left_tok, b AS right_tok,"
        f" a || b AS merged, n AS n_occ FROM b{r}"
        for r in range(1, _BPE_TRAIN_K + 1)
    )
    return f"""
WITH {', '.join(parts)}
SELECT * FROM (
{union}
) m ORDER BY rank
"""


@query("text_bpe_train_k", oracle=_bpe_train_sql("duck"), tags=("llm", "text", "tokenizer"))
def text_bpe_train_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE TRAINING loop closed (k = 8 iterations): each round counts
    adjacent token pairs over the whole corpus tokenization (map-side
    combinable agg — the distinct-pair key space is the vocabulary², tiny
    at any corpus size), picks the deterministic argmax, and rewrites the
    corpus with a boundary-anchored double-replace. The Spark side
    iterates with a persisted-per-round frame and collects exactly ONE
    winner row per round (bounded by k — the rag_mmr_rerank precedent:
    the merge table itself is a k-row driver-side object by definition);
    the oracle unrolls the same rounds as MATERIALIZED CTEs. The merge
    table is causally ordered by construction — rule r's inputs exist in
    the round-(r-1) vocabulary — which is exactly the precondition
    ``text_bpe_encode``'s replace chain needs; the trained-table ↔
    classic-greedy-BPE equivalence is proven in tests/test_web_ops.py.
    Each round is one corpus scan (k scans total): the honest relational
    cost model of Sennrich et al. 2016 training at 100 TB."""
    views(spark, sf_dir, "documents")
    w = spark.sql(
        f"""
SELECT {_bpe_enc0('spark')} AS enc
FROM (SELECT explode(split(text, ' ')) AS word FROM {tbl('documents', 'spark')}) x
WHERE word <> ''
"""
    )
    cur = w.persist()
    merges: list[tuple] = []
    for r in range(1, _BPE_TRAIN_K + 1):
        pairs = (
            cur.select(
                F.expr("filter(split(enc, '[|]'), x -> x <> '')").alias("t")
            )
            .where(F.expr("size(t) >= 2"))
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(t) - 1),"
                        " i -> struct(element_at(t, i) AS a,"
                        " element_at(t, i + 1) AS b))"
                    )
                ).alias("p")
            )
            .select("p.a", "p.b")
        )
        best_rows = (
            pairs.groupBy("a", "b")
            .agg(F.count("*").cast("bigint").alias("n"))
            .orderBy(F.col("n").desc(), "a", "b")
            .limit(1)
            .collect()
        )
        if not best_rows:
            # corpus has no adjacent token pairs left (empty/single-char
            # words only) — a shorter merge table IS the trained model
            break
        best = best_rows[0]
        merges.append((r, best.a, best.b, best.a + best.b, best.n))
        pat, rep = f"|{best.a}|{best.b}|", f"|{best.a}{best.b}|"
        # F.replace with Column literals: token bytes never touch SQL text,
        # so quotes/backslashes in corpus characters cannot break the plan
        nxt = cur.select(
            F.replace(
                F.replace(F.col("enc"), F.lit(pat), F.lit(rep)),
                F.lit(pat),
                F.lit(rep),
            ).alias("enc")
        ).persist()
        cur.unpersist()
        cur = nxt
    cur.unpersist()
    return spark.createDataFrame(
        merges,
        "rank bigint, left_tok string, right_tok string, merged string, n_occ bigint",
    )


# ---------------------------------------------------------------------------
# Cross-modal joint dedup — phash candidates confirmed by text Jaccard.
# ---------------------------------------------------------------------------

_XM_MAX_HAM = 3
_XM_MIN_JACCARD = 0.8


def _xm_phash(d: str) -> str:
    """(doc_id, phash) for the image modality: base docs plus re-encoded
    variants (same text, 1-bit-perturbed phash) — llm_ops._phash_sql's
    construction (the stub codec's blob is byte-equal to the text)."""
    if d == "spark":
        base = "CAST(conv(substring(sha2(concat(text, ''), 256), 1, 15), 16, 10) AS BIGINT)"
        flip = f"({base} ^ shiftleft(1L, CAST(doc_id % 4 AS INT)))"
    else:
        base = "CAST(('0x' || substring(sha256(text), 1, 15)) AS BIGINT)"
        flip = f"xor({base}, (CAST(1 AS BIGINT) << CAST(doc_id % 4 AS INTEGER)))"
    return f"""
  SELECT doc_id, {base} AS phash FROM {tbl('documents', d)} WHERE doc_id % 3 = 0
  UNION ALL
  SELECT doc_id + 5000000, {flip} FROM {tbl('documents', d)} WHERE doc_id % 12 = 0
"""


def _xm_sql(d: str) -> str:
    if d == "spark":
        quarter = "CAST(shiftrightunsigned(phash, q * 16) & 65535 AS BIGINT)"
        qgen = "LATERAL VIEW explode(sequence(0, 3)) t AS q"
        ham = "bit_count(pa ^ pb)"
        gen = "explode"
    else:
        quarter = "CAST((phash >> (q * 16)) & 65535 AS BIGINT)"
        qgen = ", (SELECT unnest(generate_series(0, 3)) AS q) qt"
        ham = "bit_count(xor(pa, pb))"
        gen = "unnest"
    return f"""
WITH ph AS ({_xm_phash(d)}),
quarters AS (
  SELECT doc_id, phash, q, {quarter} AS qv FROM ph {qgen}
),
phcand AS (
  SELECT DISTINCT a.doc_id AS doc_a, a.phash AS pa, b.doc_id AS doc_b, b.phash AS pb
  FROM quarters a JOIN quarters b
    ON a.q = b.q AND a.qv = b.qv AND a.doc_id < b.doc_id
),
phv AS (
  SELECT doc_a, doc_b, CAST({ham} AS BIGINT) AS hamming
  FROM phcand WHERE {ham} <= {_XM_MAX_HAM}
),
toks AS (
  SELECT DISTINCT doc_id, word FROM (
    SELECT doc_id, {gen}(split(text, ' ')) AS word
    FROM {tbl('documents', d)} WHERE doc_id % 3 = 0
    UNION ALL
    SELECT doc_id + 5000000, {gen}(split(text, ' ')) AS word
    FROM {tbl('documents', d)} WHERE doc_id % 12 = 0
  ) w WHERE word <> ''
),
tcount AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM toks GROUP BY doc_id),
inter AS (
  SELECT p.doc_a, p.doc_b, p.hamming, CAST(COUNT(*) AS BIGINT) AS ninter
  FROM phv p
  JOIN toks ta ON ta.doc_id = p.doc_a
  JOIN toks tb ON tb.doc_id = p.doc_b AND tb.word = ta.word
  GROUP BY p.doc_a, p.doc_b, p.hamming
)
SELECT i.doc_a, i.doc_b, i.hamming,
       round(CAST(i.ninter AS DOUBLE) / (ca.n + cb.n - i.ninter), 6) AS jaccard
FROM inter i
JOIN tcount ca ON ca.doc_id = i.doc_a
JOIN tcount cb ON cb.doc_id = i.doc_b
WHERE CAST(i.ninter AS DOUBLE) / (ca.n + cb.n - i.ninter) >= {_XM_MIN_JACCARD}
ORDER BY i.doc_a, i.doc_b
"""


@query(
    "mm_crossmodal_joint_dedup",
    oracle=_xm_sql("duck"),
    tags=("llm", "multimodal", "dedup"),
)
def mm_crossmodal_joint_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal joint dedup — a pair is a duplicate only if BOTH
    modalities agree: image-side phash candidates (16-bit pigeonhole
    quarters, hamming ≤ 3 — catches re-encoded images) are CONFIRMED by
    text-side token Jaccard ≥ 0.8 computed ONLY for those pairs. The
    expensive modality (token sets) never self-joins: its cost is
    Σ_candidates |tokens|, bounded by the collision-bounded phash
    candidate set — the recall-then-precision composition a production
    multimodal dedup runs. Re-encoded variants (same text, perturbed
    phash) are planted to give the join real work in both directions.

    r13 note: persisting ``quarters`` and ``toks`` (each re-planned 2-3×
    by the oracle text) was tried and REVERTED — at bench scale both
    subtrees are cheaper to recompute than to materialize (0.694 →
    0.970 s window-normalized at sf0.1: two persist barriers against
    ~0.1 s subtrees). The flat oracle-shared text stands."""
    views(spark, sf_dir, "documents")
    return spark.sql(_xm_sql("spark"))


# ---------------------------------------------------------------------------
# Keep-best cluster resolution.
# ---------------------------------------------------------------------------


def _keep_best_sql(d: str) -> str:
    sha = hashing.sha256_hex("substr(text, 1, 64)", d)
    return f"""
WITH corpus AS (
  SELECT doc_id, text FROM {tbl('documents', d)}
  UNION ALL
  SELECT doc_id + 2000000, substr(text, 1, n_chars - 10)
  FROM {tbl('documents', d)} WHERE doc_id % 25 = 0
),
scored AS (
  SELECT doc_id, {sha} AS cluster_key, CAST(length(text) AS BIGINT) AS quality
  FROM corpus
),
ranked AS (
  SELECT doc_id, cluster_key, quality,
         ROW_NUMBER() OVER (
           PARTITION BY cluster_key ORDER BY quality DESC, doc_id
         ) AS rk,
         COUNT(*) OVER (PARTITION BY cluster_key) AS n_members
  FROM scored
)
SELECT cluster_key, CAST(doc_id AS BIGINT) AS kept_doc,
       CAST(n_members AS BIGINT) AS n_members, quality AS kept_quality
FROM ranked
WHERE rk = 1 AND n_members > 1
ORDER BY cluster_key
"""


@query("data_dedup_keep_best", oracle=_keep_best_sql("duck"), tags=("llm", "dedup", "curation"))
def data_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-best cluster resolution — dedup's second half: once members
    cluster (here by a 64-char prefix fingerprint; truncated variants are
    planted so clusters have real losers), the pipeline keeps the BEST
    member (highest quality, here length — longer original beats its
    truncation; deterministic id tie-break), not an arbitrary one.
    Both windows share ONE cluster-key partitioning (rank + member
    count: one exchange, one sort) — the same shape at any corpus size
    because cluster keys are high-cardinality."""
    views(spark, sf_dir, "documents")
    return spark.sql(_keep_best_sql("spark"))
