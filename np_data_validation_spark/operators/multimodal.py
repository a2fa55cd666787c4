"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schema, Arrow-batched
``mapInPandas`` decode kernels, partitioning behavior, UDF signatures. The
codec seam (``_decode_rgb``/``_decode_pcm``) dispatches on magic bytes:

* REAL codecs, pure stdlib+numpy (VERDICT r7 task #8 — no Pillow/ffmpeg
  in this container, so the real path covers the formats decodable from
  public specs without a library): binary netpbm images (``P5`` grayscale
  PGM, ``P6`` RGB PPM -> BT.601 luma) and RIFF/WAVE 16-bit PCM audio
  (mono or multi-channel, downmixed) via the stdlib ``wave`` module.
* deterministic FAKE formats retained for the synthetic test path and as
  the documented seam for everything else (JPEG/PNG/MP3/MP4 need real
  libraries; swapping in Pillow/ffmpeg means extending these two private
  functions only — batch shapes, output schemas and the distributed plan
  are unchanged):
  - image:  b"IMG1" + uint16 w + uint16 h + w*h bytes (grayscale)
  - audio:  b"AUD1" + uint32 sample_rate + int16 samples (LE)
  - video:  b"VID1" + uint16 n_frames + frames of IMG1 payloads (8x8)

The contract tests (tests/test_similarity_multimodal.py) run the SAME
feature kernels against both implementations of the seam — real PGM/PPM/
WAV payloads and fake IMG1/AUD1 payloads in one DataFrame.
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


def _pnm_header(buf: bytes, n_fields: int) -> tuple[list[int], int]:
    """Parse the whitespace/comment-separated integer header fields of a
    binary netpbm payload; returns (fields, offset of raster start). The
    raster begins exactly one whitespace byte after the last field (per
    the netpbm spec)."""
    fields: list[int] = []
    i = 2  # past the P5/P6 magic
    while len(fields) < n_fields:
        # skip whitespace and '#' comments (comment runs to end of line)
        while i < len(buf) and (buf[i : i + 1].isspace() or buf[i : i + 1] == b"#"):
            if buf[i : i + 1] == b"#":
                nl = buf.find(b"\n", i)
                i = len(buf) if nl < 0 else nl
            i += 1
        j = i
        while j < len(buf) and buf[j : j + 1].isdigit():
            j += 1
        if j == i:
            raise ValueError("malformed netpbm header")
        fields.append(int(buf[i:j]))
        i = j
    return fields, i + 1  # single whitespace byte before the raster


def _decode_rgb(buf: bytes) -> tuple[int, int, np.ndarray]:
    """CODEC SEAM — image decode to (width, height, grayscale uint8 array).

    Real path: binary netpbm (P5 grayscale PGM; P6 RGB PPM reduced to
    BT.601 luma) — decodable from the public spec with stdlib+numpy only.
    Fake path: the deterministic IMG1 test format. Anything else raises
    NotImplementedError (JPEG/PNG need a real image library)."""
    if buf is None or len(buf) < 8:
        raise NotImplementedError("real image codecs unavailable in this container")
    if buf[:4] == b"IMG1":
        w, h = struct.unpack("<HH", buf[4:8])
        px = np.frombuffer(buf, dtype=np.uint8, count=w * h, offset=8)
        return w, h, px.reshape(h, w)
    if buf[:2] in (b"P5", b"P6"):
        (w, h, maxval), off = _pnm_header(buf, 3)
        if maxval > 255:
            raise NotImplementedError("16-bit netpbm rasters not supported")
        if buf[:2] == b"P5":
            px = np.frombuffer(buf, dtype=np.uint8, count=w * h, offset=off)
            return w, h, px.reshape(h, w)
        rgb = np.frombuffer(buf, dtype=np.uint8, count=w * h * 3, offset=off)
        rgb = rgb.reshape(h, w, 3).astype(np.float64)
        luma = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        return w, h, np.round(luma).astype(np.uint8)
    raise NotImplementedError("real image codecs unavailable in this container")


def _decode_pcm(buf: bytes) -> tuple[int, np.ndarray]:
    """CODEC SEAM — audio decode to (sample_rate, mono int16 samples).

    Real path: RIFF/WAVE 16-bit PCM via the stdlib ``wave`` module
    (multi-channel payloads are downmixed by channel mean). Fake path:
    the deterministic AUD1 test format. Anything else raises
    NotImplementedError (MP3/OGG need a real audio library)."""
    if buf is None or len(buf) < 8:
        raise NotImplementedError("real audio codecs unavailable in this container")
    if buf[:4] == b"AUD1":
        (rate,) = struct.unpack("<I", buf[4:8])
        return rate, np.frombuffer(buf, dtype="<i2", offset=8)
    if buf[:4] == b"RIFF" and buf[8:12] == b"WAVE":
        import io
        import wave

        with wave.open(io.BytesIO(buf), "rb") as wf:
            if wf.getsampwidth() != 2:
                raise NotImplementedError("only 16-bit PCM WAV supported")
            rate = wf.getframerate()
            ch = wf.getnchannels()
            raw = wf.readframes(wf.getnframes())
        samples = np.frombuffer(raw, dtype="<i2")
        if ch > 1:
            samples = (
                samples.reshape(-1, ch).mean(axis=1).round().astype(np.int16)
            )
        return rate, samples
    raise NotImplementedError("real audio codecs unavailable in this container")


def encode_image(w: int, h: int, pixels: np.ndarray) -> bytes:
    return b"IMG1" + struct.pack("<HH", w, h) + pixels.astype(np.uint8).tobytes()


def encode_audio(rate: int, samples: np.ndarray) -> bytes:
    return b"AUD1" + struct.pack("<I", rate) + samples.astype("<i2").tobytes()


def encode_video(frames: list[np.ndarray]) -> bytes:
    out = b"VID1" + struct.pack("<H", len(frames))
    for f in frames:
        out += encode_image(8, 8, f)
    return out


def encode_pgm(pixels: np.ndarray) -> bytes:
    """Binary P5 PGM (real, public format) from an (h, w) uint8 array."""
    h, w = pixels.shape
    return f"P5\n{w} {h}\n255\n".encode() + pixels.astype(np.uint8).tobytes()


def encode_ppm(pixels: np.ndarray) -> bytes:
    """Binary P6 PPM (real, public format) from an (h, w, 3) uint8 array."""
    h, w, _ = pixels.shape
    return f"P6\n{w} {h}\n255\n".encode() + pixels.astype(np.uint8).tobytes()


def encode_wav(rate: int, samples: np.ndarray, channels: int = 1) -> bytes:
    """RIFF/WAVE 16-bit PCM (real, public format) via the stdlib writer.
    ``samples`` is int16; for multi-channel pass shape (n, channels)."""
    import io
    import wave

    bio = io.BytesIO()
    with wave.open(bio, "wb") as wf:
        wf.setnchannels(channels)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(samples.astype("<i2").tobytes())
    return bio.getvalue()


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
