"""Multimodal payload plumbing: image / video / generic binary columns.

The audio path (functions/audio.py) is fully real; image and video
decoding need codec libraries this container doesn't ship, so the decode
kernels are STUBBED behind a registry — deterministic fakes for the
"fake:*" codecs used by tests, NotImplementedError for real ones. The
Spark-side plumbing is real and tested: schemas, Arrow batching via
mapInPandas (iterator form — streams batches, never materializes a
partition), typed metadata extraction, resize/frame-sample signatures.

Pattern for any modality at 100 TB: binary column + typed metadata
columns, kernels as iterator-of-pandas mapInPandas (bounded memory via
spark.sql.execution.arrow.maxRecordsPerBatch), outputs as flat typed
columns so downstream rules stay JVM-side.
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("item_id", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("mean_luma", DoubleType()),
        StructField("decode_error", StringType()),
    ]
)


def _fake_image_decode(payload: bytes) -> np.ndarray:
    """Deterministic fake: payload bytes reshaped as a tiny 8×8 gray image
    (test stand-in so the batching/schema path is exercised end-to-end)."""
    arr = np.frombuffer(payload[:64].ljust(64, b"\0"), dtype=np.uint8)
    return arr.reshape(8, 8, 1)


# kernel registry: real codecs raise until a decoder library is wired in
def _unsupported(name: str) -> Callable[[bytes], np.ndarray]:
    def _raise(_: bytes) -> np.ndarray:
        raise NotImplementedError(
            f"{name} decoding requires an image codec library not present "
            "in this environment; register a kernel in IMAGE_DECODERS"
        )

    return _raise


IMAGE_DECODERS: dict[str, Callable[[bytes], np.ndarray]] = {
    "fake:gray8x8": _fake_image_decode,
    "jpeg": _unsupported("jpeg"),
    "png": _unsupported("png"),
}


def image_features(
    df: DataFrame,
    *,
    id_col: str = "item_id",
    bytes_col: str = "payload",
    codec_col: str = "codec",
) -> DataFrame:
    """Decode + feature-extract images in Arrow batches (mapInPandas,
    iterator form). Decode failures are rows, not exceptions."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = []
            for iid, payload, codec in zip(b[id_col], b[bytes_col], b[codec_col]):
                try:
                    dec = IMAGE_DECODERS.get(codec)
                    if dec is None:
                        raise ValueError(f"no decoder for {codec!r}")
                    img = dec(bytes(payload))
                    out.append(
                        {
                            "item_id": iid,
                            "width": img.shape[1],
                            "height": img.shape[0],
                            "channels": img.shape[2],
                            "mean_luma": float(img.mean()),
                            "decode_error": None,
                        }
                    )
                except Exception as exc:
                    out.append(
                        {
                            "item_id": iid,
                            "width": None,
                            "height": None,
                            "channels": None,
                            "mean_luma": None,
                            "decode_error": str(exc)[:120],
                        }
                    )
            yield pd.DataFrame(out, columns=[f.name for f in IMAGE_FEATURES_SCHEMA])

    return df.select(id_col, bytes_col, codec_col).mapInPandas(
        run, IMAGE_FEATURES_SCHEMA
    )


FRAME_SAMPLE_SCHEMA = StructType(
    [
        StructField("item_id", StringType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)


def frame_sample(
    df: DataFrame,
    *,
    every_n: int = 10,
    id_col: str = "item_id",
    bytes_col: str = "payload",
) -> DataFrame:
    """Video frame sampling (1-in-N). The container format parser is a
    deterministic fake (fixed 256-byte 'frames'); a real demuxer slots
    into the same mapInPandas shape — one input row fans out to many
    frame rows, which is why this is mapInPandas and not a scalar UDF."""

    frame_size = 256

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for iid, payload in zip(b[id_col], b[bytes_col]):
                data = bytes(payload)
                n_frames = max(1, len(data) // frame_size)
                for i in range(0, n_frames, every_n):
                    rows.append(
                        {
                            "item_id": iid,
                            "frame_idx": i,
                            "frame": data[i * frame_size : (i + 1) * frame_size],
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SAMPLE_SCHEMA])

    return df.select(id_col, bytes_col).mapInPandas(run, FRAME_SAMPLE_SCHEMA)
