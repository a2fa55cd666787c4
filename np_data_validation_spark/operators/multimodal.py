"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schema, Arrow-batched
``mapInPandas`` decode kernels, partitioning behavior, UDF signatures. The
CODECS are deterministic fakes behind one seam (``_decode_rgb``/
``_decode_pcm``): this container has no image/audio libraries, so the
"decode" parses our own little header format. Swapping in Pillow/ffmpeg
means replacing those two private functions only — batch shapes, output
schemas and the distributed plan are unchanged.

Fake formats (documented so tests are readable):
* image:  b"IMG1" + uint16 w + uint16 h + w*h bytes (grayscale)
* audio:  b"AUD1" + uint32 sample_rate + int16 samples (LE)
* video:  b"VID1" + uint16 n_frames + frames of IMG1 payloads (fixed 8x8)
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.StringType(), False),
        T.StructField("mime", T.StringType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("mean_intensity", T.DoubleType(), True),
        T.StructField("thumb", T.ArrayType(T.IntegerType()), True),
    ]
)

AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.StringType(), False),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_samples", T.IntegerType(), True),
        T.StructField("rms", T.DoubleType(), True),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.StringType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), True),
    ]
)


def _decode_rgb(buf: bytes) -> tuple[int, int, np.ndarray]:
    """CODEC SEAM — deterministic fake image decode. Replace with a real
    decoder (Pillow etc.) to productionize; see module docstring."""
    if buf is None or len(buf) < 8 or buf[:4] != b"IMG1":
        raise NotImplementedError("real image codecs unavailable in this container")
    w, h = struct.unpack("<HH", buf[4:8])
    px = np.frombuffer(buf, dtype=np.uint8, count=w * h, offset=8)
    return w, h, px.reshape(h, w)


def _decode_pcm(buf: bytes) -> tuple[int, np.ndarray]:
    """CODEC SEAM — deterministic fake audio decode."""
    if buf is None or len(buf) < 8 or buf[:4] != b"AUD1":
        raise NotImplementedError("real audio codecs unavailable in this container")
    (rate,) = struct.unpack("<I", buf[4:8])
    return rate, np.frombuffer(buf, dtype="<i2", offset=8)


def encode_image(w: int, h: int, pixels: np.ndarray) -> bytes:
    return b"IMG1" + struct.pack("<HH", w, h) + pixels.astype(np.uint8).tobytes()


def encode_audio(rate: int, samples: np.ndarray) -> bytes:
    return b"AUD1" + struct.pack("<I", rate) + samples.astype("<i2").tobytes()


def encode_video(frames: list[np.ndarray]) -> bytes:
    out = b"VID1" + struct.pack("<H", len(frames))
    for f in frames:
        out += encode_image(8, 8, f)
    return out


def image_features(assets: DataFrame, thumb: int = 4) -> DataFrame:
    """Decode + feature-extract + downsample images, Arrow batch at a time.
    ``mapInPandas`` keeps the binary payloads in Arrow buffers end-to-end;
    per-batch numpy work, no per-row Python in the Spark plan."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, buf in zip(pdf["asset_id"], pdf["content"]):
                w, h, px = _decode_rgb(buf)
                step_y, step_x = max(h // thumb, 1), max(w // thumb, 1)
                tiny = px[::step_y, ::step_x][:thumb, :thumb]
                rows.append(
                    (aid, w, h, float(px.mean()), tiny.flatten().astype(int).tolist())
                )
            yield pd.DataFrame(
                rows, columns=["asset_id", "width", "height", "mean_intensity", "thumb"]
            )

    return assets.filter("mime like 'image/%'").select("asset_id", "content").mapInPandas(
        fn, IMAGE_FEATURES_SCHEMA
    )


def audio_features(assets: DataFrame) -> DataFrame:
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, buf in zip(pdf["asset_id"], pdf["content"]):
                rate, samples = _decode_pcm(buf)
                rms = float(np.sqrt(np.mean(samples.astype(np.float64) ** 2))) if len(samples) else 0.0
                rows.append((aid, rate, len(samples), rms))
            yield pd.DataFrame(rows, columns=["asset_id", "sample_rate", "n_samples", "rms"])

    return assets.filter("mime like 'audio/%'").select("asset_id", "content").mapInPandas(
        fn, AUDIO_FEATURES_SCHEMA
    )


def sample_frames(assets: DataFrame, every_k: int = 2) -> DataFrame:
    """Explode videos into every-k-th frame rows (each frame re-encoded as
    an IMG1 payload so downstream image ops compose)."""
    frame_bytes = 8 + 64  # IMG1 header + 8x8 payload

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, buf in zip(pdf["asset_id"], pdf["content"]):
                if buf is None or buf[:4] != b"VID1":
                    raise NotImplementedError("real video codecs unavailable")
                (n,) = struct.unpack("<H", buf[4:6])
                for i in range(0, n, every_k):
                    off = 6 + i * frame_bytes
                    rows.append((aid, i, bytes(buf[off : off + frame_bytes])))
            yield pd.DataFrame(rows, columns=["asset_id", "frame_idx", "frame"])

    return assets.filter("mime like 'video/%'").select("asset_id", "content").mapInPandas(
        fn, FRAME_SCHEMA
    )
