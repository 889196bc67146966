"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real — schema, partition-friendly batch
processing via ``mapInPandas``, Arrow transfer of binary columns, typed
feature output. Since r5 the IMAGE path is real too: a pure-numpy
24-bit BMP codec (:func:`encode_bmp` / :func:`decode_bmp` — the format
is uncompressed, so no image library is needed) drives
:func:`bmp_features` (real per-channel pixel statistics) and
:func:`bmp_resize` (real nearest-neighbour resampling), both
value-checked against a DuckDB oracle over a planted deterministic
pixel rule (:func:`planted_bmp_media` / the ``planted_*_sql``
mirrors). Video/audio remain stubbed (``_fake_decode`` /
:func:`frame_sample_stub`) — no codecs in this container; the swap-in
points are clearly marked and the batch shape doesn't change.
"""

from __future__ import annotations

import struct
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


FRAME_SCHEMA = "media_id long, frame_idx int, frame_bytes long, frame_md5 string"


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


# ---------------------------------------------------------------------------
# Real image path: pure-numpy 24-bit uncompressed BMP (BITMAPINFOHEADER,
# bottom-up rows, BGR byte order, rows padded to 4 bytes) — decodable
# without any image library because nothing is compressed.
# ---------------------------------------------------------------------------


def _bmp_row_size(width: int) -> int:
    return ((3 * width + 3) // 4) * 4


def encode_bmp(img: np.ndarray) -> bytes:
    """RGB uint8 array (H, W, 3) → 24-bit uncompressed BMP bytes."""
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError(f"expected (H, W, 3) RGB array, got {img.shape}")
    h, w = img.shape[:2]
    row_size = _bmp_row_size(w)
    file_size = 54 + row_size * h
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, row_size * h, 2835, 2835, 0, 0
    )
    body = bytearray()
    pad = b"\x00" * (row_size - 3 * w)
    for y in range(h - 1, -1, -1):  # bottom-up
        body += img[y, :, ::-1].tobytes()  # RGB → BGR
        body += pad
    return header + info + bytes(body)


def decode_bmp(payload: bytes) -> tuple[int, int, np.ndarray]:
    """24-bit uncompressed BMP bytes → (width, height, RGB uint8
    (H, W, 3)). Raises ValueError on anything that isn't exactly that
    profile, so callers can fall back to the stub for other formats."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
    if hdr_size < 40 or bpp != 24 or compression != 0 or h <= 0 or w <= 0:
        raise ValueError("unsupported BMP profile (need 24bpp, BI_RGB)")
    row_size = _bmp_row_size(w)
    if len(payload) < offset + row_size * h:
        raise ValueError("truncated BMP payload")
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=row_size * h, offset=offset
    ).reshape(h, row_size)
    img = rows[:, : 3 * w].reshape(h, w, 3)[::-1, :, ::-1]  # flip + BGR→RGB
    return w, h, np.ascontiguousarray(img)


# The planted deterministic pixel rule (SQL-mirrorable, pure integer
# arithmetic): image k is (8 + k%8) × (8 + 3k%8), channel c∈{0=R,1=G,2=B},
# pixel value (7k + 5x + 11y + 13c) mod 256.
def _plant_dims(k: int) -> tuple[int, int]:
    return 8 + k % 8, 8 + (k * 3) % 8


def _plant_image(k: int) -> np.ndarray:
    w, h = _plant_dims(k)
    x = np.arange(w)[None, :, None]
    y = np.arange(h)[:, None, None]
    c = np.arange(3)[None, None, :]
    return ((7 * k + 5 * x + 11 * y + 13 * c) % 256).astype(np.uint8)



def _spread_ids(ids: DataFrame, id_col: str) -> DataFrame:
    """Expansion-aware spread for executor-side corpus builds (r10, the
    _ngram_rows idiom): the id frame comes off a small local scan (1-2
    partitions), and the mapInPandas encode/decode below it is the
    whole cost — byte-light input, compute-heavy output, exactly the
    shape AQE's byte-based sizing cannot see. Keyed repartition up to
    defaultParallelism, skipped when the scan is already wide (no-op at
    real scale) and for streaming inputs.

    Applied ONLY where the per-id build is heavy enough to repay the
    exchange — measured A/B at sf0.1: AVI (multi-frame payloads)
    1.85 → 1.05 s, but BMP 0.82 → 0.97 and WAV 0.74 → 0.81 LOSE (their
    single-image/clip builds are cheaper than the added shuffle), so
    the image/audio builders keep the direct scan."""
    if ids.isStreaming:
        return ids
    sc = ids.sparkSession.sparkContext
    if ids.rdd.getNumPartitions() < sc.defaultParallelism:
        return ids.repartition(sc.defaultParallelism, F.col(id_col))
    return ids

def planted_bmp_media(ids: DataFrame, id_col: str = "media_id") -> DataFrame:
    """(media_id) → MEDIA_SCHEMA rows whose payloads are real BMP
    encodings of the planted pixel rule — generated IN the executors
    (mapInPandas), so the corpus-build is distributed like any other
    media scan and the decode path is exercised end-to-end against a
    DuckDB oracle that recomputes the rule in SQL."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                {
                    "media_id": int(k),
                    "payload": encode_bmp(_plant_image(int(k))),
                    "media_type": "image/bmp",
                    "meta": {"codec": "bmp24"},
                }
                for k in pdf[id_col]
            ]
            yield pd.DataFrame(
                rows, columns=["media_id", "payload", "media_type", "meta"]
            )

    return ids.select(F.col(id_col)).mapInPandas(build, schema=MEDIA_SCHEMA)


BMP_FEATURE_SCHEMA = (
    "media_id long, width int, height int, n_bytes long, "
    "mean_r double, mean_g double, mean_b double, px_std double"
)


def bmp_features(media: DataFrame) -> DataFrame:
    """REAL image features from decoded pixels: per-channel means and
    the all-channel population std. Exact-parity discipline: sums are
    taken over integers (uint8 pixels, error-free), the float
    divisions/sqrt happen in the SAME expression order as the SQL
    mirror, and rounding is applied engine-side (F.round in the
    projection, not Python's half-to-even round)."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                payload = (
                    bytes(row["payload"]) if row["payload"] is not None else b""
                )
                w, h, img = decode_bmp(payload)
                n = w * h
                flat = img.astype(np.int64)
                s_c = flat.sum(axis=(0, 1))  # exact int per channel
                s1 = int(flat.sum())
                s2 = int((flat * flat).sum())
                n3 = 3 * n
                var = s2 / n3 - (s1 / n3) * (s1 / n3)
                rows.append(
                    {
                        "media_id": row["media_id"],
                        "width": w,
                        "height": h,
                        "n_bytes": len(payload),
                        "mean_r": int(s_c[0]) / n,
                        "mean_g": int(s_c[1]) / n,
                        "mean_b": int(s_c[2]) / n,
                        "px_std": float(np.sqrt(var)),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "width", "height", "n_bytes",
                    "mean_r", "mean_g", "mean_b", "px_std",
                ],
            )

    out = media.mapInPandas(process, schema=BMP_FEATURE_SCHEMA)
    return out.select(
        "media_id", "width", "height", "n_bytes",
        F.round("mean_r", 6).alias("mean_r"),
        F.round("mean_g", 6).alias("mean_g"),
        F.round("mean_b", 6).alias("mean_b"),
        F.round("px_std", 6).alias("px_std"),
    )


BMP_RESIZE_SCHEMA = (
    "media_id long, width int, height int, n_bytes_out long, "
    "mean_r double, mean_g double, mean_b double"
)


def bmp_resize(media: DataFrame, width: int, height: int) -> DataFrame:
    """REAL nearest-neighbour resize of decoded BMPs, re-encoded to BMP:
    target pixel (x', y') samples source (x'·w // W, y'·h // H) — the
    integer-floor mapping a SQL oracle reproduces exactly. Reports the
    re-encoded size and the resized image's channel means."""
    W, H = int(width), int(height)
    if W < 1 or H < 1:
        raise ValueError(f"target size must be >= 1x1, got {width}x{height}")

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                payload = (
                    bytes(row["payload"]) if row["payload"] is not None else b""
                )
                w, h, img = decode_bmp(payload)
                sx = (np.arange(W) * w) // W
                sy = (np.arange(H) * h) // H
                out = img[sy][:, sx]
                enc = encode_bmp(out)
                s_c = out.astype(np.int64).sum(axis=(0, 1))
                n = W * H
                rows.append(
                    {
                        "media_id": row["media_id"],
                        "width": W,
                        "height": H,
                        "n_bytes_out": len(enc),
                        "mean_r": int(s_c[0]) / n,
                        "mean_g": int(s_c[1]) / n,
                        "mean_b": int(s_c[2]) / n,
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "width", "height", "n_bytes_out",
                    "mean_r", "mean_g", "mean_b",
                ],
            )

    out = media.mapInPandas(process, schema=BMP_RESIZE_SCHEMA)
    return out.select(
        "media_id", "width", "height", "n_bytes_out",
        F.round("mean_r", 6).alias("mean_r"),
        F.round("mean_g", 6).alias("mean_g"),
        F.round("mean_b", 6).alias("mean_b"),
    )


# ceiling of the planted rule's dimensions: _plant_dims maxes at
# 8 + 7 = 15 on both axes — keep in sync with the rule
_PLANT_MAX_DIM = 15


def _plant_series_sql(bound: int) -> str:
    return f"SELECT unnest(range(0, {int(bound)})) AS i"


def planted_features_sql(ids_sql: str) -> str:
    """DuckDB mirror of planted_bmp_media → bmp_features: recompute the
    planted pixel rule in SQL (pure integer arithmetic), aggregate the
    same integer sums, apply the same float derivation order."""
    return f"""
WITH ids AS ({ids_sql}),
dims AS (
  SELECT media_id,
         CAST(8 + media_id % 8 AS INT) AS width,
         CAST(8 + (media_id * 3) % 8 AS INT) AS height
  FROM ids
),
series AS ({_plant_series_sql(_PLANT_MAX_DIM)}),
px AS (
  SELECT d.media_id, d.width, d.height, sc.i AS c,
         (7 * d.media_id + 5 * sx.i + 11 * sy.i + 13 * sc.i) % 256 AS v
  FROM dims d
  JOIN series sx ON sx.i < d.width
  JOIN series sy ON sy.i < d.height
  JOIN series sc ON sc.i < 3
)
SELECT media_id, width, height,
       CAST(54 + height * (((3 * width + 3) // 4) * 4) AS BIGINT) AS n_bytes,
       round(CAST(sum(CASE WHEN c = 0 THEN v END) AS DOUBLE)
             / (width * height), 6) AS mean_r,
       round(CAST(sum(CASE WHEN c = 1 THEN v END) AS DOUBLE)
             / (width * height), 6) AS mean_g,
       round(CAST(sum(CASE WHEN c = 2 THEN v END) AS DOUBLE)
             / (width * height), 6) AS mean_b,
       round(sqrt(CAST(sum(v * v) AS DOUBLE) / (3 * width * height)
                  - (CAST(sum(v) AS DOUBLE) / (3 * width * height))
                    * (CAST(sum(v) AS DOUBLE) / (3 * width * height))), 6)
         AS px_std
FROM px GROUP BY media_id, width, height
"""


def planted_resize_sql(ids_sql: str, width: int, height: int) -> str:
    """DuckDB mirror of planted_bmp_media → bmp_resize: the
    nearest-neighbour source index is the same integer-floor map, so
    the resized pixel values are the rule evaluated at those indices.
    The index series bound is derived from the TARGET size too — a
    fixed 15-row series silently truncated any target wider than the
    planted rule's own max dimension (r5 review finding)."""
    W, H = int(width), int(height)
    return f"""
WITH ids AS ({ids_sql}),
dims AS (
  SELECT media_id,
         CAST(8 + media_id % 8 AS INT) AS width,
         CAST(8 + (media_id * 3) % 8 AS INT) AS height
  FROM ids
),
series AS ({_plant_series_sql(max(_PLANT_MAX_DIM, W, H))}),
px AS (
  SELECT d.media_id, sc.i AS c,
         (7 * d.media_id + 5 * ((sx.i * d.width) // {W})
          + 11 * ((sy.i * d.height) // {H}) + 13 * sc.i) % 256 AS v
  FROM dims d
  JOIN series sx ON sx.i < {W}
  JOIN series sy ON sy.i < {H}
  JOIN series sc ON sc.i < 3
)
SELECT media_id,
       CAST({W} AS INT) AS width,
       CAST({H} AS INT) AS height,
       CAST(54 + {H} * (((3 * {W} + 3) // 4) * 4) AS BIGINT) AS n_bytes_out,
       round(CAST(sum(CASE WHEN c = 0 THEN v END) AS DOUBLE)
             / ({W} * {H}), 6) AS mean_r,
       round(CAST(sum(CASE WHEN c = 1 THEN v END) AS DOUBLE)
             / ({W} * {H}), 6) AS mean_g,
       round(CAST(sum(CASE WHEN c = 2 THEN v END) AS DOUBLE)
             / ({W} * {H}), 6) AS mean_b
FROM px GROUP BY media_id
"""


# ---------------------------------------------------------------------------
# Real audio path: pure-numpy PCM WAV (RIFF/WAVE, fmt chunk + 16-bit LE
# samples) — decodable without any audio library because PCM is
# uncompressed, mirroring what the BMP codec did for images.
# ---------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """int16 array (n_samples, n_channels) → PCM WAV bytes."""
    if samples.ndim == 1:
        samples = samples[:, None]
    if samples.ndim != 2 or samples.dtype != np.int16:
        raise ValueError(
            f"expected int16 (n, ch) array, got {samples.dtype} {samples.shape}"
        )
    n, ch = samples.shape
    byte_rate = sample_rate * ch * 2
    data = samples.astype("<i2").tobytes()  # interleaved LE frames
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, byte_rate, ch * 2, 16)
    out = (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    return out


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """PCM WAV bytes → (sample_rate, int16 (n_samples, n_channels)).
    Raises ValueError on anything that isn't 16-bit PCM, so callers can
    fall back to the stub for other codecs."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        if pos + 8 + size > len(payload):
            # a declared chunk running past the payload is corruption —
            # silently decoding the short slice would report a clip
            # with fewer samples instead of failing loudly
            raise ValueError("truncated WAV chunk")
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None or len(fmt) < 16:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, ch, rate, _, _, bits = struct.unpack_from("<HHIIHH", fmt, 0)
    if audio_fmt != 1 or bits != 16 or ch < 1 or rate < 1:
        raise ValueError("unsupported WAV profile (need 16-bit PCM)")
    n = len(data) // (ch * 2)
    samples = np.frombuffer(data, dtype="<i2", count=n * ch).reshape(n, ch)
    return rate, samples


# Planted deterministic sample rule (SQL-mirrorable, pure integer
# arithmetic): clip k has n = 64 + 32·(k mod 8) frames, 1 + k mod 2
# channels, 8000 Hz, sample (k, i, c) = ((37k + 17i + 29c) mod 4096) − 2048.
_WAV_RATE = 8000


def _plant_wav_shape(k: int) -> tuple[int, int]:
    return 64 + 32 * (k % 8), 1 + k % 2


def _plant_wav(k: int) -> np.ndarray:
    n, ch = _plant_wav_shape(k)
    i = np.arange(n)[:, None]
    c = np.arange(ch)[None, :]
    return (((37 * k + 17 * i + 29 * c) % 4096) - 2048).astype(np.int16)


def planted_wav_media(ids: DataFrame, id_col: str = "media_id") -> DataFrame:
    """(media_id) → MEDIA_SCHEMA rows whose payloads are real PCM-WAV
    encodings of the planted sample rule — generated IN the executors
    (mapInPandas), same distributed corpus-build shape as
    :func:`planted_bmp_media`."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                {
                    "media_id": int(k),
                    "payload": encode_wav(_plant_wav(int(k)), _WAV_RATE),
                    "media_type": "audio/wav",
                    "meta": {"codec": "pcm16"},
                }
                for k in pdf[id_col]
            ]
            yield pd.DataFrame(
                rows, columns=["media_id", "payload", "media_type", "meta"]
            )

    return ids.select(F.col(id_col)).mapInPandas(build, schema=MEDIA_SCHEMA)


WAV_FEATURE_SCHEMA = (
    "media_id long, channel int, sample_rate int, n_samples long, "
    "duration double, mean_amp double, rms double"
)


def wav_features(media: DataFrame) -> DataFrame:
    """REAL per-channel waveform statistics from decoded PCM samples:
    one row per (clip, channel) with duration, mean amplitude and RMS.
    Exact-parity discipline (same as :func:`bmp_features`): sums are
    taken over integers (int16 samples, error-free in int64), the float
    divisions/sqrt happen in the SAME expression order as the SQL
    mirror, and rounding is engine-side."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                payload = (
                    bytes(row["payload"]) if row["payload"] is not None else b""
                )
                rate, samples = decode_wav(payload)
                n = samples.shape[0]
                s64 = samples.astype(np.int64)
                s1 = s64.sum(axis=0)  # exact int per channel
                s2 = (s64 * s64).sum(axis=0)
                for c in range(samples.shape[1]):
                    rows.append(
                        {
                            "media_id": row["media_id"],
                            "channel": c,
                            "sample_rate": rate,
                            "n_samples": n,
                            "duration": n / rate,
                            "mean_amp": int(s1[c]) / n if n else None,
                            "rms": float(np.sqrt(int(s2[c]) / n)) if n else None,
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "channel", "sample_rate", "n_samples",
                    "duration", "mean_amp", "rms",
                ],
            )

    out = media.mapInPandas(process, schema=WAV_FEATURE_SCHEMA)
    return out.select(
        "media_id", "channel", "sample_rate", "n_samples",
        F.round("duration", 6).alias("duration"),
        F.round("mean_amp", 6).alias("mean_amp"),
        F.round("rms", 6).alias("rms"),
    )


# ceiling of the planted rule's frame count: 64 + 32·7 — keep in sync
_WAV_MAX_FRAMES = 64 + 32 * 7


def planted_wav_features_sql(ids_sql: str) -> str:
    """DuckDB mirror of planted_wav_media → wav_features: recompute the
    planted sample rule in SQL (pure integer arithmetic), aggregate the
    same integer sums, apply the same float derivation order."""
    return f"""
WITH ids AS ({ids_sql}),
shape AS (
  SELECT media_id,
         64 + 32 * (media_id % 8) AS n,
         CAST(1 + media_id % 2 AS INT) AS ch
  FROM ids
),
series AS ({_plant_series_sql(_WAV_MAX_FRAMES)}),
chans AS ({_plant_series_sql(2)}),
samp AS (
  SELECT s.media_id, s.n, sc.i AS c,
         ((37 * s.media_id + 17 * si.i + 29 * sc.i) % 4096) - 2048 AS v
  FROM shape s
  JOIN series si ON si.i < s.n
  JOIN chans sc ON sc.i < s.ch
)
SELECT media_id,
       CAST(c AS INT) AS channel,
       CAST({_WAV_RATE} AS INT) AS sample_rate,
       CAST(n AS BIGINT) AS n_samples,
       round(CAST(n AS DOUBLE) / {_WAV_RATE}, 6) AS duration,
       round(CAST(sum(v) AS DOUBLE) / n, 6) AS mean_amp,
       round(sqrt(CAST(sum(v * v) AS DOUBLE) / n), 6) AS rms
FROM samp GROUP BY media_id, c, n
"""


# ---------------------------------------------------------------------------
# Real video path: pure-numpy uncompressed RIFF/AVI ('DIB ' stream, raw
# 24-bit bottom-up BGR frames in '00db' chunks) — decodable without any
# codec library because nothing is compressed, completing the
# image (BMP, r5) / audio (WAV, r6) / video trio.
# ---------------------------------------------------------------------------


def _chunk(cid: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return cid + struct.pack("<I", len(body)) + body + pad


def _list(kind: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", kind + body)


def encode_avi(frames: np.ndarray, fps: int = 10) -> bytes:
    """RGB uint8 array (n_frames, H, W, 3) → uncompressed AVI bytes."""
    if frames.ndim != 4 or frames.shape[3] != 3 or frames.dtype != np.uint8:
        raise ValueError(
            f"expected uint8 (n, H, W, 3) array, got {frames.dtype} "
            f"{frames.shape}"
        )
    n, h, w = frames.shape[:3]
    row_size = _bmp_row_size(w)
    frame_bytes = row_size * h
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // max(fps, 1),  # microseconds per frame
        frame_bytes * max(fps, 1),  # max bytes per sec
        0, 0x10, n, 0, 1, frame_bytes, w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"DIB ", 0, 0, 0, 0, 1, max(fps, 1), 0, n,
        frame_bytes, 0, 0, 0, 0, int(w), int(h),
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_bytes, 2835, 2835, 0, 0
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    pad = b"\x00" * (row_size - 3 * w)
    movi_body = b"movi"
    for f in range(n):
        body = bytearray()
        for y in range(h - 1, -1, -1):  # bottom-up, RGB → BGR
            body += frames[f, y, :, ::-1].tobytes()
            body += pad
        movi_body += _chunk(b"00db", bytes(body))
    riff_body = b"AVI " + hdrl + _chunk(b"LIST", movi_body)
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def decode_avi(payload: bytes) -> tuple[int, np.ndarray]:
    """Uncompressed AVI bytes → (fps, RGB uint8 (n, H, W, 3)). Raises
    ValueError on anything that isn't the 24-bit BI_RGB 'vids' profile,
    so callers can fall back to the stub for other codecs."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")

    def walk(buf: bytes, pos: int, end: int):
        while pos + 8 <= end:
            cid = buf[pos : pos + 4]
            size = struct.unpack_from("<I", buf, pos + 4)[0]
            if pos + 8 + size > end:
                raise ValueError("truncated AVI chunk")
            yield cid, pos + 8, size
            pos += 8 + size + (size & 1)

    us_per_frame = None
    w = h = None
    frames_raw: list[bytes] = []
    for cid, body_at, size in walk(payload, 12, len(payload)):
        if cid != b"LIST":
            continue
        kind = payload[body_at : body_at + 4]
        if kind == b"hdrl":
            for c2, b2, s2 in walk(payload, body_at + 4, body_at + size):
                if c2 == b"avih" and s2 >= 4:
                    us_per_frame = struct.unpack_from("<I", payload, b2)[0]
                elif c2 == b"LIST" and payload[b2 : b2 + 4] == b"strl":
                    for c3, b3, s3 in walk(payload, b2 + 4, b2 + s2):
                        if c3 == b"strf" and s3 >= 40:
                            (_, w, h, _, bpp, comp) = struct.unpack_from(
                                "<IiiHHI", payload, b3
                            )
                            if bpp != 24 or comp != 0 or w <= 0 or h <= 0:
                                raise ValueError(
                                    "unsupported AVI profile (need 24bpp "
                                    "BI_RGB)"
                                )
        elif kind == b"movi":
            for c2, b2, s2 in walk(payload, body_at + 4, body_at + size):
                if c2 in (b"00db", b"00dc"):
                    frames_raw.append(payload[b2 : b2 + s2])
    if us_per_frame is None or w is None or not frames_raw:
        raise ValueError("missing hdrl/strf/movi structure")
    row_size = _bmp_row_size(w)
    out = np.empty((len(frames_raw), h, w, 3), dtype=np.uint8)
    for i, raw in enumerate(frames_raw):
        if len(raw) < row_size * h:
            raise ValueError("truncated AVI frame")
        rows = np.frombuffer(raw, dtype=np.uint8, count=row_size * h).reshape(
            h, row_size
        )
        out[i] = rows[:, : 3 * w].reshape(h, w, 3)[::-1, :, ::-1]
    fps = 1_000_000 // us_per_frame if us_per_frame else 0
    return fps, out


# Planted deterministic pixel rule for video (SQL-mirrorable, pure
# integer arithmetic): clip k has (8 + k%5) × (8 + 3k%5) frames of
# 4 + k%4 frames at 10 fps; pixel (f, x, y, c) value
# (11k + 7f + 5x + 3y + 13c) mod 256.
_AVI_FPS = 10


def _plant_avi_shape(k: int) -> tuple[int, int, int]:
    return 4 + k % 4, 8 + k % 5, 8 + (3 * k) % 5  # n_frames, width, height


def _plant_avi(k: int) -> np.ndarray:
    n, w, h = _plant_avi_shape(k)
    f = np.arange(n)[:, None, None, None]
    y = np.arange(h)[None, :, None, None]
    x = np.arange(w)[None, None, :, None]
    c = np.arange(3)[None, None, None, :]
    return ((11 * k + 7 * f + 5 * x + 3 * y + 13 * c) % 256).astype(np.uint8)


def planted_avi_media(ids: DataFrame, id_col: str = "media_id") -> DataFrame:
    """(media_id) → MEDIA_SCHEMA rows whose payloads are real AVI
    encodings of the planted pixel rule — executor-built, same
    distributed corpus-build shape as the BMP/WAV variants."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                {
                    "media_id": int(k),
                    "payload": encode_avi(_plant_avi(int(k)), _AVI_FPS),
                    "media_type": "video/avi",
                    "meta": {"codec": "rawdib"},
                }
                for k in pdf[id_col]
            ]
            yield pd.DataFrame(
                rows, columns=["media_id", "payload", "media_type", "meta"]
            )

    return _spread_ids(ids.select(F.col(id_col)), id_col).mapInPandas(
        build, schema=MEDIA_SCHEMA
    )


AVI_FRAME_SCHEMA = (
    "media_id long, frame_idx int, n_frames int, fps int, "
    "width int, height int, mean_r double, mean_g double, mean_b double"
)


def avi_frame_stats(media: DataFrame, n_sample: int = 3) -> DataFrame:
    """REAL video frame sampling from decoded pixels: sample
    ``n_sample`` frames per clip with the integer-floor index map
    ``s·n_frames // n_sample`` (the same engine-exact rule as
    bmp_resize's source map) and report each sampled frame's channel
    means. Exact-parity discipline: integer pixel sums, shared float
    derivation order, engine-side rounding."""
    k = int(n_sample)
    if k < 1:
        raise ValueError(f"n_sample must be >= 1, got {n_sample}")

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                payload = (
                    bytes(row["payload"]) if row["payload"] is not None else b""
                )
                fps, frames = decode_avi(payload)
                n, h, w = frames.shape[:3]
                npx = w * h
                for s in range(k):
                    fi = (s * n) // k
                    s_c = frames[fi].astype(np.int64).sum(axis=(0, 1))
                    rows.append(
                        {
                            "media_id": row["media_id"],
                            "frame_idx": fi,
                            "n_frames": n,
                            "fps": fps,
                            "width": w,
                            "height": h,
                            "mean_r": int(s_c[0]) / npx,
                            "mean_g": int(s_c[1]) / npx,
                            "mean_b": int(s_c[2]) / npx,
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "frame_idx", "n_frames", "fps",
                    "width", "height", "mean_r", "mean_g", "mean_b",
                ],
            )

    out = media.mapInPandas(process, schema=AVI_FRAME_SCHEMA)
    return out.select(
        "media_id", "frame_idx", "n_frames", "fps", "width", "height",
        F.round("mean_r", 6).alias("mean_r"),
        F.round("mean_g", 6).alias("mean_g"),
        F.round("mean_b", 6).alias("mean_b"),
    )


# ceilings of the planted video rule — keep in sync with _plant_avi_shape
_AVI_MAX_DIM = 12   # 8 + 4
_AVI_MAX_FRAMES = 7  # 4 + 3


def planted_avi_frame_stats_sql(ids_sql: str, n_sample: int = 3) -> str:
    """DuckDB mirror of planted_avi_media → avi_frame_stats: recompute
    the planted pixel rule in SQL at the SAME integer-floor sampled
    frame indices, aggregate the same integer sums, apply the same
    float derivation order.

    Valid for ``n_sample ≤`` the planted rule's minimum n_frames (4):
    the sampled indices are then pairwise distinct, so the mirror's
    GROUP BY (media, frame) emits exactly one row per sample — with
    duplicate sampled indices the Spark side would emit duplicate rows
    this mirror collapses."""
    k = int(n_sample)
    if k > 4:
        raise ValueError(
            f"planted mirror supports n_sample <= 4, got {n_sample}"
        )
    return f"""
WITH ids AS ({ids_sql}),
shape AS (
  SELECT media_id,
         CAST(4 + media_id % 4 AS INT) AS n_frames,
         CAST(8 + media_id % 5 AS INT) AS width,
         CAST(8 + (3 * media_id) % 5 AS INT) AS height
  FROM ids
),
samples AS ({_plant_series_sql(k)}),
sampled AS (
  SELECT s.media_id, s.n_frames, s.width, s.height,
         CAST((sm.i * s.n_frames) // {k} AS INT) AS frame_idx
  FROM shape s JOIN samples sm ON sm.i < {k}
),
series AS ({_plant_series_sql(_AVI_MAX_DIM)}),
px AS (
  SELECT d.media_id, d.frame_idx, d.n_frames, d.width, d.height, sc.i AS c,
         (11 * d.media_id + 7 * d.frame_idx + 5 * sx.i + 3 * sy.i
          + 13 * sc.i) % 256 AS v
  FROM sampled d
  JOIN series sx ON sx.i < d.width
  JOIN series sy ON sy.i < d.height
  JOIN series sc ON sc.i < 3
)
SELECT media_id, frame_idx, n_frames,
       CAST({_AVI_FPS} AS INT) AS fps, width, height,
       round(CAST(sum(CASE WHEN c = 0 THEN v END) AS DOUBLE)
             / (width * height), 6) AS mean_r,
       round(CAST(sum(CASE WHEN c = 1 THEN v END) AS DOUBLE)
             / (width * height), 6) AS mean_g,
       round(CAST(sum(CASE WHEN c = 2 THEN v END) AS DOUBLE)
             / (width * height), 6) AS mean_b
FROM px GROUP BY media_id, frame_idx, n_frames, width, height
"""


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: treat document text bytes as opaque media payloads so the
    binary pipeline is exercisable with the driver's testdata."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.lit("blob").alias("media_type"),
        F.create_map(F.lit("source"), F.col("source")).alias("meta"),
    )
