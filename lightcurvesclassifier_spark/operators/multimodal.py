"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real — schema, partition-friendly batch
processing via ``mapInPandas``, Arrow transfer of binary columns, typed
feature output. The actual codec work is stubbed: this container has no
image/audio libraries, so ``decode`` uses a deterministic fake "decoder"
that derives metadata from the bytes themselves — clearly marked; the
swap-in point for a real decoder (PIL/libvips) is the ``_fake_decode``
call in :func:`decode_features`, and behavior never depends on which
libraries happen to be importable.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, media_type string, n_bytes long, "
    "checksum string, width int, height int, feature array<float>"
)

_FEATURE_DIM = 8


def _fake_decode(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Deterministic stand-in for image decode: derives a fake (width,
    height) and an ``_FEATURE_DIM``-dim feature vector from byte content.
    NOT a real decoder — replace with PIL/libvips on a real cluster."""
    n = len(payload)
    width = 1 + n % 64
    height = 1 + (n // 64) % 64
    arr = np.frombuffer(payload, dtype=np.uint8)
    # bucket-mean "embedding" over byte values: stable, content-sensitive
    idx = np.arange(len(arr)) % _FEATURE_DIM
    sums = np.bincount(idx, weights=arr, minlength=_FEATURE_DIM)
    counts = np.bincount(idx, minlength=_FEATURE_DIM)
    feature = (sums / np.maximum(counts, 1)).astype(np.float32)
    return width, height, feature


def decode_features(media: DataFrame, batch_hint: int | None = None) -> DataFrame:
    """Binary payload → typed features via ``mapInPandas``.

    Batches stream through Arrow; per-partition memory is bounded by the
    Arrow batch size (no whole-partition materialization), which is what
    makes this safe on multi-GB media partitions at 100 TB.
    """
    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                payload = bytes(row["payload"]) if row["payload"] is not None else b""
                # Real decode is not wired yet; always use the
                # deterministic stub so behavior doesn't depend on which
                # libraries happen to be importable on the cluster. Swap
                # this call for a PIL/libvips decode to go live.
                width, height, feature = _fake_decode(payload)
                rows.append(
                    {
                        "media_id": row["media_id"],
                        "media_type": row["media_type"],
                        "n_bytes": len(payload),
                        "checksum": hashlib.md5(payload).hexdigest(),
                        "width": width,
                        "height": height,
                        "feature": feature,
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(process, schema=FEATURE_SCHEMA)


RESIZE_SCHEMA = (
    "media_id long, width int, height int, n_bytes_out long, checksum string"
)
FRAME_SCHEMA = "media_id long, frame_idx int, frame_bytes long, frame_md5 string"


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image-resize stage: real Spark plumbing (mapInPandas over binary
    payloads, Arrow transfer, typed output), STUB codec — no image libs
    in this container, so the "resized" payload is the first
    ``width*height`` bytes (swap the body for PIL/libvips thumbnailing
    on a real cluster; the schema and batch shape don't change)."""
    target = int(width) * int(height)

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                payload = bytes(row["payload"]) if row["payload"] is not None else b""
                out = payload[:target]
                rows.append(
                    {
                        "media_id": row["media_id"],
                        "width": width,
                        "height": height,
                        "n_bytes_out": len(out),
                        "checksum": hashlib.md5(out).hexdigest(),
                    }
                )
            yield pd.DataFrame(rows, columns=["media_id", "width", "height", "n_bytes_out", "checksum"])

    return media.mapInPandas(process, schema=RESIZE_SCHEMA)


def frame_sample_stub(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Video frame-sampling stage: one row per sampled frame, STUB
    decoder — frames are equal ``floor(n/k)``-byte chunks of the payload
    (a real build decodes with pyav/ffmpeg per Arrow batch; the
    explode-to-frames shape, schema and partitioning stay as-is).
    Frames are emitted as (index, size, md5) so results are engine-
    comparable without shipping payloads to the driver."""
    k = int(n_frames)
    if k < 1:
        # fail at call time, not as an opaque per-row ZeroDivisionError
        # inside the executor's Python worker
        raise ValueError(f"n_frames must be >= 1, got {n_frames}")

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                payload = bytes(row["payload"]) if row["payload"] is not None else b""
                flen = len(payload) // k
                if flen == 0:
                    continue
                for i in range(k):
                    frame = payload[i * flen : (i + 1) * flen]
                    rows.append(
                        {
                            "media_id": row["media_id"],
                            "frame_idx": i,
                            "frame_bytes": len(frame),
                            "frame_md5": hashlib.md5(frame).hexdigest(),
                        }
                    )
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_bytes", "frame_md5"])

    return media.mapInPandas(process, schema=FRAME_SCHEMA)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: treat document text bytes as opaque media payloads so the
    binary pipeline is exercisable with the driver's testdata."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.lit("blob").alias("media_type"),
        F.create_map(F.lit("source"), F.col("source")).alias("meta"),
    )
