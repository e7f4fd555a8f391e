"""Round-6 web/tokenizer operators: BPE replace-chain equivalence with
classic greedy BPE, public-suffix longest-match, URL canonical laws."""

from __future__ import annotations

import duckdb
import pytest

from aws_localstack_stream_processing_spark.plans import all_queries
from aws_localstack_stream_processing_spark.plans.web_ops import _BPE_MERGES

from .conftest import SF_DIR

QUERIES = all_queries()


def _classic_bpe(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Textbook BPE encode (Sennrich et al. 2016): repeatedly merge the
    LOWEST-RANK adjacent token pair present, leftmost occurrence first."""
    ranks = {}
    for i, (pair, _) in enumerate(merges):
        a, b = pair.rsplit(" ", 1)
        ranks[(a, b)] = i
    toks = list(word)
    while True:
        best, best_i = None, None
        for i in range(len(toks) - 1):
            r = ranks.get((toks[i], toks[i + 1]))
            if r is not None and (best is None or r < best):
                best, best_i = r, i
        if best is None:
            return toks
        toks[best_i : best_i + 2] = [toks[best_i] + toks[best_i + 1]]


def test_replace_chain_equals_classic_bpe():
    """The SQL encode applies each merge rule in rank order via global
    left-to-right replace; for a merge table whose produced tokens are
    only consumed by LATER rules (true of _BPE_MERGES by construction),
    that is exactly classic greedy BPE — prove it on every corpus word."""
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')"
    )
    words = [
        r[0]
        for r in con.execute(
            "SELECT DISTINCT unnest(string_split(text, ' ')) FROM documents"
        ).fetchall()
        if r[0]
    ]
    assert len(words) > 10
    from aws_localstack_stream_processing_spark.plans.web_ops import (
        _bpe_encode_expr,
    )

    # run the duck-dialect expression over every word in one shot
    con.execute("CREATE TABLE w AS SELECT unnest(?) AS word", [words])
    got = dict(
        con.execute(
            f"SELECT word, {_bpe_encode_expr('word', 'duck')} FROM w"
        ).fetchall()
    )
    for word in words:
        toks = [t for t in got[word].split("|") if t]
        assert toks == _classic_bpe(word, _BPE_MERGES), word


def test_merge_table_is_causally_ordered():
    """Guard the equivalence precondition: no merge's output pair may be
    an input of an EARLIER rule (else the replace chain diverges from
    classic BPE and the test above becomes corpus-dependent)."""
    produced_at = {}
    for i, (_, out) in enumerate(_BPE_MERGES):
        produced_at.setdefault(out, i)
    for i, (pair, _) in enumerate(_BPE_MERGES):
        a, b = pair.rsplit(" ", 1)
        for tok in (a, b):
            if tok in produced_at:
                assert produced_at[tok] < i, (pair, tok)


def test_registrable_domain_longest_match(spark):
    """Multi-label suffix: *.example.com.cn must resolve to
    example.com.cn (suffix 'com.cn'), never 'com.cn'→'example.com' or the
    naive last-two-labels 'com.cn'."""
    rows = QUERIES["url_registrable_domain"].fn(spark, SF_DIR).collect()
    domains = {r.registrable_domain for r in rows}
    assert domains == {
        "example.com",
        "beispiel.de",
        "example.com.cn",
        "exemple.fr",
        "ejemplo.es",
    }
    assert all(r.n_docs > 0 and r.n_sources > 0 for r in rows)


def test_canonical_urls_are_actually_canonical(spark):
    """Canonicalization laws: https scheme, no WWW, no query/fragment, no
    trailing slash, lowercase host."""
    rows = QUERIES["url_canonical_dedup"].fn(spark, SF_DIR).collect()
    assert rows  # clusters exist
    for r in rows:
        u = r.canonical_url
        assert u.startswith("https://") and "www." not in u
        assert "?" not in u and "#" not in u and not u.endswith("/")
        host = u.split("://", 1)[1].split("/", 1)[0]
        assert host == host.lower()
        assert r.n_docs > 1


def test_crossmodal_requires_both_modalities(spark):
    """Every emitted pair passed BOTH gates; planted re-encodes (same
    text, flipped phash) must appear with hamming 1 and jaccard 1."""
    rows = QUERIES["mm_crossmodal_joint_dedup"].fn(spark, SF_DIR).collect()
    assert rows
    assert all(r.hamming <= 3 and r.jaccard >= 0.8 for r in rows)
    planted = [r for r in rows if r.doc_b == r.doc_a + 5000000]
    assert planted and all(
        r.hamming == 1 and r.jaccard == 1.0 for r in planted
    )


def test_keep_best_prefers_longer_member(spark):
    """The kept member of every multi-doc cluster must be the longest
    (planted truncations always lose to their originals)."""
    rows = QUERIES["data_dedup_keep_best"].fn(spark, SF_DIR).collect()
    assert rows
    assert all(r.kept_doc < 2000000 for r in rows)  # originals win
    assert all(r.n_members >= 2 for r in rows)


def _classic_bpe_train(words: list[str], k: int) -> list[tuple[str, str, int]]:
    """Textbook BPE trainer (Sennrich et al. 2016): k rounds of
    naive adjacent-pair counting over the current corpus tokenization,
    deterministic argmax (count DESC, then lexicographic), merge
    everywhere left-to-right non-overlapping."""
    toks = [list(w) for w in words if w]
    merges = []
    for _ in range(k):
        counts: dict[tuple[str, str], int] = {}
        for t in toks:
            for i in range(len(t) - 1):
                counts[(t[i], t[i + 1])] = counts.get((t[i], t[i + 1]), 0) + 1
        (a, b), n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b, n))
        for t in toks:
            i = 0
            while i < len(t) - 1:
                if t[i] == a and t[i + 1] == b:
                    t[i : i + 2] = [a + b]
                i += 1
    return merges


def test_bpe_train_k_matches_classic_trainer(spark):
    """VERDICT r6 #7 equivalence, half 1: the relational k-round trainer
    must produce exactly the merge table (pairs, order, counts) of the
    textbook in-memory trainer over the same corpus words."""
    from aws_localstack_stream_processing_spark.plans.web_ops import (
        _BPE_TRAIN_K,
    )

    got = [
        (r.left_tok, r.right_tok, r.n_occ)
        for r in QUERIES["text_bpe_train_k"]
        .fn(spark, SF_DIR)
        .orderBy("rank")
        .collect()
    ]
    con = duckdb.connect()
    words = [
        w[0]
        for w in con.execute(
            f"SELECT unnest(string_split(text, ' ')) FROM "
            f"read_parquet('{SF_DIR}/documents.parquet')"
        ).fetchall()
    ]
    assert got == _classic_bpe_train(words, _BPE_TRAIN_K)


def test_bpe_train_k_degenerate_corpus_short_table(spark, tmp_path):
    """ADVICE r7: a corpus with no adjacent token pairs (single-char
    words only) must yield a SHORT merge table, not an IndexError from
    the per-round argmax collect."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2], type=pa.int64()),
                "text": ["a b c", "a c"],
                "lang": ["en", "en"],
                "source": ["t", "t"],
                "n_chars": pa.array([5, 3], type=pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    out = QUERIES["text_bpe_train_k"].fn(spark, str(tmp_path)).collect()
    assert out == []  # zero mergeable pairs → zero-row table, no crash


def test_bpe_trained_table_encodes_as_classic_greedy(spark):
    """Half 2: applying the TRAINED table through the production replace
    chain (text_bpe_encode's mechanism) equals classic greedy BPE with
    that table — i.e. the trainer's output satisfies the causal-order
    precondition the encoder relies on, end to end."""
    rows = (
        QUERIES["text_bpe_train_k"].fn(spark, SF_DIR).orderBy("rank").collect()
    )
    merges = [(f"{r.left_tok} {r.right_tok}", r.merged) for r in rows]
    # causal order: no rule's input token is produced by a LATER rule
    produced_later = set()
    for pair, out in reversed(merges):
        a, b = pair.rsplit(" ", 1)
        assert a not in produced_later and b not in produced_later, (
            f"rule ({a},{b}) consumes a token produced by a later rule"
        )
        produced_later.add(out)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    words = [
        r[0]
        for r in con.execute(
            "SELECT DISTINCT unnest(string_split(text, ' ')) FROM documents"
        ).fetchall()
        if r[0]
    ]
    # run the duck-dialect replace chain with the TRAINED table
    enc = "concat(regexp_replace(word, '(.)', '|\\1', 'g'), '|')"
    for pair, out in merges:
        pat = "|" + pair.replace(" ", "|") + "|"
        rep = "|" + out + "|"
        enc = f"replace({enc}, '{pat}', '{rep}')"
        enc = f"replace({enc}, '{pat}', '{rep}')"
    con.execute("CREATE TABLE w(word VARCHAR)")
    con.executemany("INSERT INTO w VALUES (?)", [(w,) for w in words])
    chain = {
        w: [t for t in e.split("|") if t]
        for w, e in con.execute(f"SELECT word, {enc} FROM w").fetchall()
    }
    for w in words:
        assert chain[w] == _classic_bpe(w, merges), w
