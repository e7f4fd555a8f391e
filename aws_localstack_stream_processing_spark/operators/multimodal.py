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
