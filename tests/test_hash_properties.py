"""Property-based checks (hypothesis): the dialect hash fragments implement
the mathematical fold they claim — verified against a pure-Python model on
arbitrary generated strings (DuckDB executes the fragment; the Spark
rendering is covered by test_function_parity's cross-engine cases)."""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from aws_localstack_stream_processing_spark.functions import hashing

from aws_localstack_stream_processing_spark.functions.hashing import MOD31, MOD32


def py_djb2(s: str) -> int:
    # both engines split '' into [''] with char code 0 — the fold sees one
    # zero element for the empty string (convention shared by the dialects)
    h = 5381
    for ch in s or "\0":
        h = (h * 33 + (0 if ch == "\0" else ord(ch))) % MOD32
    return h


def py_djb2_js(s: str) -> int:
    """Faithful simulation of the reference's JS hash
    (partitioner/index.js:17-23): ``hash << 5`` coerces through ToInt32
    (only the shifted term wraps, to SIGNED int32); the accumulator stays
    unwrapped; Math.abs at the end. Exact in doubles below 2^53 — the model
    uses Python ints, which agree exactly in that range."""
    h = 5381
    for ch in s:
        shifted = ((h & 0xFFFFFFFF) * 32) & 0xFFFFFFFF
        if shifted >= 2**31:
            shifted -= 2**32
        h = shifted + h + ord(ch)
    return abs(h)


def py_rolling(s: str) -> int:
    h = 0
    for ch in s or "\0":
        h = (h * 131 + (0 if ch == "\0" else ord(ch))) % MOD31
    return h


# printable-ish single-codepoint text; ascii() in both engines is the
# codepoint for BMP characters
_text = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FFF),
    max_size=200,
)


@settings(max_examples=150, deadline=None)
@given(_text)
def test_djb2_matches_model(s):
    con = duckdb.connect()
    try:
        con.execute("CREATE TABLE t(s VARCHAR)")
        con.execute("INSERT INTO t VALUES (?)", [s])
        (got,) = con.execute(
            f"SELECT {hashing.djb2('s', 'duck')} FROM t"
        ).fetchone()
        assert got == py_djb2(s), s
    finally:
        con.close()


@settings(max_examples=200, deadline=None)
@given(_text)
def test_djb2_js_matches_reference_semantics(s):
    """The route-compatibility property ADVICE r1 flagged: the emitted
    partition label must equal ``Math.abs(jsHash(key)) % N`` for the
    reference's exact JS arithmetic, not merely a same-distribution fold."""
    con = duckdb.connect()
    try:
        con.execute("CREATE TABLE t(s VARCHAR)")
        con.execute("INSERT INTO t VALUES (?)", [s])
        (got,) = con.execute(
            f"SELECT {hashing.djb2_js('s', 'duck')} FROM t"
        ).fetchone()
        assert got == py_djb2_js(s), s
    finally:
        con.close()


@settings(max_examples=150, deadline=None)
@given(_text)
def test_rolling_fingerprint_matches_model(s):
    con = duckdb.connect()
    try:
        con.execute("CREATE TABLE t(s VARCHAR)")
        con.execute("INSERT INTO t VALUES (?)", [s])
        (got,) = con.execute(
            f"SELECT {hashing.rolling_fingerprint('s', 'duck')} FROM t"
        ).fetchone()
        assert got == py_rolling(s), s
    finally:
        con.close()
