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
    """Real image decode — requires an image codec not present in this
    container. Swap in PIL/torchvision here; the mapInPandas plumbing in
    :func:`stub_decode_features` is unchanged."""
    raise NotImplementedError(
        "image codecs are not available in this environment; "
        "use stub_decode_features for the deterministic fake path"
    )


def stub_decode_features(df: DataFrame, id_col: str = "doc_id", binary_col: str = "blob") -> DataFrame:
    """Arrow-batched fake decoder: one feature row per binary blob.

    The formulas are deterministic functions of the byte payload so a SQL
    oracle can replicate them; a real decoder would replace the arithmetic
    while keeping the same operator shape (mapInPandas over binary column,
    BIGINT/typed-struct output, partition-parallel).
    """

    def fn(batches):
        import hashlib

        for pdf in batches:
            blobs = pdf[binary_col]
            lens = blobs.apply(len).astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "byte_len": lens,
                    "content_sha": blobs.apply(
                        lambda b: hashlib.sha256(bytes(b)).hexdigest()
                    ),
                    "width": lens % 640 + 1,
                    "height": (lens * 31) % 480 + 1,
                    "n_frames": lens % 7 + 1,
                    "n_chunks": -(-lens // 256),
                }
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
