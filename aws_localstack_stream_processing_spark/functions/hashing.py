"""Deterministic cross-engine hash expressions.

Each builder emits an SQL fragment for either the Spark dialect or the DuckDB
dialect ("duck") that computes *bit-identical* results, so the same logical
operator can be declared once and verified against the DuckDB oracle.

Design notes for scale:
- djb2 / rolling hashes are expressed as higher-order-function folds
  (``aggregate``/``transform``) — these stay JVM-side inside whole-stage
  codegen on Spark; no Python UDF in the hot path.
- MinHash signatures use ``array_min`` over per-seed md5 of shingles —
  no explode needed to build signatures, so signature computation is a
  narrow (shuffle-free) map.

djb2 reference semantics: ``partitioner/index.js:17-23``:
``hash = ((hash << 5) + hash) + charCode; return Math.abs(hash)``. JS wraps
ONLY the shifted term to signed int32 (``<<`` applies ToInt32); the ``+
hash`` accumulator stays an unwrapped double, so the result is NOT a
mod-2^32 fold. Doubles hold exact integers below 2^53 and |hash| grows by
at most ~2^31 per character, so for any string under ~4M chars the JS
arithmetic is exact integer arithmetic — replicated bit-for-bit here in
BIGINT (:func:`djb2_js`). :func:`djb2` keeps the simpler mod-2^32 fold for
content-bucketing uses where only the distribution matters — it is
*distribution-equivalent*, not record-route-compatible with the reference.
"""

from __future__ import annotations

MOD32 = 4_294_967_296  # 2^32
MOD31 = 2_147_483_648  # 2^31


def djb2(col: str, dialect: str) -> str:
    """Fold-based djb2-style hash, h in [0, 2^32). Distribution-equivalent
    to the reference's hash (good bucketing), but the bucket *labels* differ
    from the JS function's — use :func:`djb2_js` when routing must match the
    reference system record-for-record."""
    if dialect == "spark":
        return (
            f"aggregate(transform(split({col}, ''), c -> ascii(c)), 5381L, "
            f"(h, c) -> pmod(h * 33 + c, {MOD32}))"
        )
    return (
        f"list_reduce(list_prepend(5381::BIGINT, "
        f"list_transform(string_split({col}, ''), c -> ascii(c)::BIGINT)), "
        f"(h, c) -> (h * 33 + c) % {MOD32})"
    )


def djb2_js(col: str, dialect: str) -> str:
    """Bit-exact replication of the reference's JS hash
    (partitioner/index.js:17-23): per step the ``hash << 5`` term wraps to
    signed int32 while the ``+ hash + charCode`` accumulator does not;
    ``Math.abs`` at the end. Exact for inputs whose BMP code units equal
    their code points (all ASCII keys and payloads in this engine); the JS
    empty-string case (loop never runs → 5381) is preserved by filtering
    the '' element ``split`` emits for an empty input."""
    if dialect == "spark":
        chars = f"transform(filter(split({col}, ''), c -> c <> ''), c -> ascii(c))"
        sh = f"pmod(h * 32, {MOD32})"
        return (
            f"abs(aggregate({chars}, 5381L, "
            f"(h, c) -> h + c + {sh} - IF({sh} >= {MOD31}, {MOD32}, 0L)))"
        )
    chars = (
        f"list_transform(list_filter(string_split({col}, ''), c -> c <> ''), "
        f"c -> ascii(c)::BIGINT)"
    )
    sh = f"(((h * 32) % {MOD32} + {MOD32}) % {MOD32})"
    return (
        f"abs(list_reduce(list_prepend(5381::BIGINT, {chars}), "
        f"(h, c) -> h + c + {sh} - CASE WHEN {sh} >= {MOD31} "
        f"THEN {MOD32} ELSE 0 END))"
    )


def rolling_fingerprint(col: str, dialect: str) -> str:
    """Polynomial rolling hash over the characters of ``col`` (document
    fingerprint): h = (h*131 + code) mod 2^31. Single sequential fold —
    order-sensitive by construction (that is the point of a fingerprint)."""
    if dialect == "spark":
        return (
            f"aggregate(transform(split({col}, ''), c -> ascii(c)), 0L, "
            f"(h, c) -> pmod(h * 131 + c, {MOD31}))"
        )
    return (
        f"list_reduce(list_prepend(0::BIGINT, "
        f"list_transform(string_split({col}, ''), c -> ascii(c)::BIGINT)), "
        f"(h, c) -> (h * 131 + c) % {MOD31})"
    )


def sha256_hex(col: str, dialect: str) -> str:
    if dialect == "spark":
        return f"sha2({col}, 256)"
    return f"sha256({col})"


def hexdigit_val(char_expr: str, dialect: str) -> str:
    """Value 0..15 of a single lowercase hex character expression."""
    if dialect == "spark":
        return f"(position({char_expr} IN '0123456789abcdef') - 1)"
    return f"(strpos('0123456789abcdef', {char_expr}) - 1)"


def popcount4(val_expr: str) -> str:
    """Popcount of a 4-bit value via lookup string (identical both engines)."""
    return f"CAST(substr('0112122312232334', ({val_expr}) + 1, 1) AS INT)"


def minhash_sig(shingles_col: str, seed: int, dialect: str) -> str:
    """One MinHash signature component: the lexicographic min of
    md5('<seed>|' || shingle) over the shingle array. md5-hex strings are
    uniformly distributed, so the string-min is a valid min-wise hash."""
    if dialect == "spark":
        return (
            f"array_min(transform({shingles_col}, "
            f"s -> md5(concat('{seed}|', s))))"
        )
    return (
        f"list_min(list_transform({shingles_col}, "
        f"s -> md5(concat('{seed}|', s))))"
    )
