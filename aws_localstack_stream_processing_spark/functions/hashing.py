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

djb2 reference semantics: ``partitioner/index.js:17-23`` in the reference
repo (h = h*33 + charCode, 32-bit wrap, abs). We keep h in [0, 2^32) via
pmod at every step, which equals the JS uint32 semantics for ASCII input.
"""

from __future__ import annotations

MOD32 = 4_294_967_296  # 2^32
MOD31 = 2_147_483_648  # 2^31


def djb2(col: str, dialect: str) -> str:
    """Fold-based djb2 string hash, h in [0, 2^32)."""
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
