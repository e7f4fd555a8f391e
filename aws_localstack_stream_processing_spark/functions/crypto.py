"""Cross-engine cryptographic expressions.

RFC-2104 HMAC-SHA256 rendered as pure SQL in both dialects:

    HMAC(K, m) = H((K0 ^ opad) || H((K0 ^ ipad) || m))

with K a 32-byte key (64 hex chars) and K0 the key zero-padded to the
64-byte SHA-256 block — so the padded block is ``K ^ pad`` for the first
32 bytes and ``0 ^ pad = pad`` for the rest. Byte-level XOR is built from
the shared hexdigit-lookup primitive (no engine-specific hex parsing).

The SPARK rendering is a real, whole-stage-codegen HMAC — signing without
leaving the JVM — verified bit-for-bit against Python's ``hmac`` stdlib in
tests/test_crypto.py. The DUCK rendering is written to the same algebra
but requires DuckDB >= 1.1 (``sha256`` over BLOB; 1.0 only hashes VARCHAR,
and the inner digest's raw bytes are not UTF-8-representable), so the
driver-facing signing queries keep an oracle-renderable construction and
the real-crypto path is verified by the ECDSA sign+verify round-trip query
(plans/sql_surface.py ref_sign_ecdsa) and by tests.

Reference: signer/index.js:292-295 (per-key secret signing).
"""

from __future__ import annotations

from .hashing import hexdigit_val

_BLOCK = 64  # sha256 block size in bytes
_KEY_BYTES = 32  # keys here are sha256 digests


def _byte_val(hex_expr: str, i: int, dialect: str) -> str:
    """Integer value of byte ``i`` (0-based) of a lowercase-hex string."""
    hi = hexdigit_val(f"substr({hex_expr}, {2 * i + 1}, 1)", dialect)
    lo = hexdigit_val(f"substr({hex_expr}, {2 * i + 2}, 1)", dialect)
    return f"(16 * {hi} + {lo})"


def _hexpair(val_expr: str, dialect: str) -> str:
    """Lowercase hex pair of a byte value 0..255 (shared lookup-string
    rendering; integer division differs per dialect)."""
    div = "//" if dialect == "duck" else "DIV"
    return (
        f"concat(substr('0123456789abcdef', ({val_expr}) {div} 16 + 1, 1), "
        f"substr('0123456789abcdef', ({val_expr}) % 16 + 1, 1))"
    )


def _xor(a: str, b: int, dialect: str) -> str:
    return f"xor({a}, {b})" if dialect == "duck" else f"({a} ^ {b})"


def _padded_key_hex(key_hex_expr: str, pad: int, dialect: str) -> str:
    """Hex of the 64-byte block ``K0 ^ pad`` for a 32-byte hex key."""
    parts = [
        _hexpair(_xor(_byte_val(key_hex_expr, i, dialect), pad, dialect), dialect)
        for i in range(_KEY_BYTES)
    ]
    tail_pair = f"{pad:02x}"
    parts.append(f"repeat('{tail_pair}', {_BLOCK - _KEY_BYTES})")
    return f"concat({', '.join(parts)})"


def _sha256_blob(blob_expr: str, dialect: str) -> str:
    """Lowercase-hex sha256 of a binary expression."""
    if dialect == "spark":
        return f"sha2({blob_expr}, 256)"
    return f"sha256({blob_expr})"


def _unhex(hex_expr: str, dialect: str) -> str:
    return f"from_hex({hex_expr})" if dialect == "duck" else f"unhex({hex_expr})"


def _to_bytes(str_expr: str, dialect: str) -> str:
    """VARCHAR → its UTF-8 bytes."""
    if dialect == "spark":
        return f"cast({str_expr} AS binary)"
    return f"encode({str_expr})"


def _bconcat(a: str, b: str, dialect: str) -> str:
    return f"({a} || {b})" if dialect == "duck" else f"concat({a}, {b})"


def hmac_sha256_hex(key_hex_expr: str, msg_expr: str, dialect: str) -> str:
    """RFC-2104 HMAC-SHA256 of a string message under a 32-byte hex key,
    as a lowercase hex string — bit-identical to Python's
    ``hmac.new(bytes.fromhex(key), msg.encode(), sha256).hexdigest()``."""
    ipad = _padded_key_hex(key_hex_expr, 0x36, dialect)
    opad = _padded_key_hex(key_hex_expr, 0x5C, dialect)
    inner = _sha256_blob(
        _bconcat(_unhex(ipad, dialect), _to_bytes(msg_expr, dialect), dialect),
        dialect,
    )
    return _sha256_blob(
        _bconcat(_unhex(opad, dialect), _unhex(inner, dialect), dialect),
        dialect,
    )
