"""Real-crypto verification.

1. The Spark-dialect HMAC-SHA256 expression (functions/crypto.py) is a
   pure-JVM rendering of RFC 2104 — it must equal Python's ``hmac`` stdlib
   bit-for-bit (two fully independent implementations).
2. The ECDSA signing operator's verification step is not vacuous: a
   tampered message and a wrong public key must both FAIL verification,
   and RFC-6979 signatures must be deterministic across invocations.
"""

from __future__ import annotations

import hashlib
import hmac as py_hmac

import pandas as pd
import pytest

from aws_localstack_stream_processing_spark.functions.crypto import hmac_sha256_hex

MSGS = [
    "",
    "a",
    "deadbeef" * 8,
    "the quick brown fox",
    "x" * 300,
    "unicode-free ascii only: !@#$%^&*()",
]
KEYS = [
    hashlib.sha256(b"key_0").hexdigest(),
    hashlib.sha256(b"key_99").hexdigest(),
    "00" * 32,
    "ff" * 32,
]


def test_spark_hmac_matches_stdlib(spark):
    cases = [(k, m) for k in KEYS for m in MSGS]
    df = spark.createDataFrame(pd.DataFrame(cases, columns=["k", "m"]))
    rows = df.selectExpr(
        "k", "m", hmac_sha256_hex("k", "m", "spark") + " AS h"
    ).collect()
    assert len(rows) == len(cases)
    for r in rows:
        want = py_hmac.new(
            bytes.fromhex(r.k), r.m.encode(), hashlib.sha256
        ).hexdigest()
        assert r.h == want, (r.k[:8], r.m[:20])


def test_spark_hmac_is_codegen_only(spark):
    """The JVM HMAC must stay inside whole-stage codegen: no Python eval,
    no shuffle — it is a per-row projection usable in any hot path."""
    df = spark.range(100).selectExpr(
        "sha2(cast(id AS string), 256) AS k",
        "concat('msg_', id) AS m",
    )
    out = df.selectExpr(hmac_sha256_hex("k", "m", "spark") + " AS h")
    executed = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in executed
    assert "EvalPython" not in executed


cryptography = pytest.importorskip("cryptography")


def _keypair(kid: int):
    from cryptography.hazmat.primitives.asymmetric import ec

    n_order = int(
        "FFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEBAAEDCE6AF48A03BBFD25E8CD0364141", 16
    )
    scalar = (
        int.from_bytes(hashlib.sha256(f"key_{kid}".encode()).digest(), "big")
        % (n_order - 1)
        + 1
    )
    priv = ec.derive_private_key(scalar, ec.SECP256K1())
    return priv, priv.public_key()


def test_ecdsa_verify_rejects_tampering_and_wrong_key():
    from cryptography.exceptions import InvalidSignature
    from cryptography.hazmat.primitives import hashes
    from cryptography.hazmat.primitives.asymmetric import ec

    sign_algo = ec.ECDSA(hashes.SHA256(), deterministic_signing=True)
    verify_algo = ec.ECDSA(hashes.SHA256())
    priv, pub = _keypair(7)
    msg = b"tx-hash-under-test"
    sig = priv.sign(msg, sign_algo)

    pub.verify(sig, msg, verify_algo)  # happy path

    with pytest.raises(InvalidSignature):
        pub.verify(sig, b"tx-hash-under-tesT", verify_algo)  # tampered msg

    _, wrong_pub = _keypair(8)
    with pytest.raises(InvalidSignature):
        wrong_pub.verify(sig, msg, verify_algo)  # wrong key


def test_ecdsa_rfc6979_signatures_deterministic():
    from cryptography.hazmat.primitives import hashes
    from cryptography.hazmat.primitives.asymmetric import ec

    sign_algo = ec.ECDSA(hashes.SHA256(), deterministic_signing=True)
    priv, _ = _keypair(3)
    assert priv.sign(b"m", sign_algo) == priv.sign(b"m", sign_algo)
    assert priv.sign(b"m", sign_algo) != priv.sign(b"m2", sign_algo)


def test_seed_rsa_keypairs_parse_and_roundtrip(spark):
    """The real RSA-2048 generator emits working key material: every PEM
    parses, the fingerprint is the sha256 of the public DER, and each
    private key signs a message its own public key verifies."""
    from cryptography.hazmat.primitives import hashes, serialization
    from cryptography.hazmat.primitives.asymmetric import padding

    from aws_localstack_stream_processing_spark.plans.sql_surface import (
        seed_rsa_keypairs,
    )

    rows = seed_rsa_keypairs(spark, 6, partitions=3).collect()
    assert sorted(r.key_id for r in rows) == list(range(6))
    for r in rows:
        priv = serialization.load_pem_private_key(
            r.private_pem.encode(), password=None
        )
        pub = serialization.load_pem_public_key(r.public_pem.encode())
        assert priv.key_size == 2048
        der = pub.public_bytes(
            serialization.Encoding.DER,
            serialization.PublicFormat.SubjectPublicKeyInfo,
        )
        assert r.public_key_fp == hashlib.sha256(der).hexdigest()
        assert r.key_file == r.key_id // 1000 == 0
        sig = priv.sign(b"tx-hash", padding.PKCS1v15(), hashes.SHA256())
        pub.verify(sig, b"tx-hash", padding.PKCS1v15(), hashes.SHA256())


def test_ref_sign_ecdsa_all_valid(spark):
    """The operator end-to-end at test SF: every signature verifies and the
    per-key counts partition the stride-selected transactions."""
    from aws_localstack_stream_processing_spark.plans import all_queries

    from .conftest import SF_DIR

    df = all_queries()["ref_sign_ecdsa"].fn(spark, SF_DIR)
    rows = df.collect()
    assert rows, "no keys signed"
    assert all(r.n_valid == r.n_txs for r in rows)
