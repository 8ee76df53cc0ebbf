"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The engine treats media as `binary` payload columns with a typed metadata
struct (mime_type, width/height/duration, ...), exactly how the reference
stores FileInfoton content (Infoton.scala:335,418 — bytes + mimeType, big
payloads behind a dataPointer into a blob store). Processing steps are
Arrow-batched Pandas functions over `mapInPandas`:

  decode_images      bytes -> (height, width, channels) + pixel stats
  resize_images      bytes -> resized bytes
  sample_frames      video bytes -> n frame payloads (explode)
  extract_audio_features  bytes -> (duration, rms, ...)

The actual codec calls are STUBBED (this environment has no image/audio
libraries): `codec="fake"` decodes a deterministic synthetic header
format so the whole Spark surface — schema, batching, partition sizing,
UDF signatures — runs and is tested for real; `codec="pil"`/"ffmpeg"
raise NotImplementedError at the exact seam where Pillow/ffmpeg plug in.

FAKE format (deterministic, used by tests and the synthetic generator):
  b"IMG1" + height:4BE + width:4BE + channels:1 + payload
  b"AUD1" + sample_rate:4BE + n_samples:4BE + payload
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_META = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("mean_byte", T.DoubleType()),
        T.StructField("ok", T.BooleanType()),
    ]
)


def fake_image(height: int, width: int, channels: int = 3, fill: int = 127) -> bytes:
    payload = bytes([fill]) * (height * width * channels)
    return b"IMG1" + struct.pack(">IIB", height, width, channels) + payload


def fake_audio(sample_rate: int, n_samples: int, fill: int = 64) -> bytes:
    return b"AUD1" + struct.pack(">II", sample_rate, n_samples) + bytes([fill]) * n_samples


def _decode_fake_image(b: bytes):
    if b is None or len(b) < 13 or b[:4] != b"IMG1":
        return None
    h, w, c = struct.unpack(">IIB", b[4:13])
    payload = np.frombuffer(b, dtype=np.uint8, offset=13)
    mean = float(payload.mean()) if payload.size else 0.0
    return h, w, c, len(b), mean


def decode_images(
    df: DataFrame, data_col: str = "data", id_col: str = "id", codec: str = "fake"
) -> DataFrame:
    """mapInPandas decode: one Arrow batch in, one metadata frame out.
    Corrupt/foreign payloads yield ok=False rows, never exceptions (a
    100 TB crawl always contains garbage)."""
    if codec != "fake":
        raise NotImplementedError(
            f"codec {codec!r}: real decoders (Pillow/ffmpeg) are not available in this "
            "environment — plug them in here; the 'fake' codec exercises the full plumbing"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # zip over the column ndarrays (iterrows materializes a Series per
        # row — ~100x slower); the byte math is numpy inside the decoder
        for pdf in it:
            out = []
            for rid, b in zip(pdf[id_col].to_numpy(), pdf[data_col].to_numpy()):
                meta = _decode_fake_image(b)
                if meta is None:
                    out.append({"id": rid, "height": None, "width": None, "channels": None,
                                "n_bytes": len(b) if b is not None else 0,
                                "mean_byte": None, "ok": False})
                else:
                    h, w, c, nb, mean = meta
                    out.append({"id": rid, "height": h, "width": w, "channels": c,
                                "n_bytes": nb, "mean_byte": mean, "ok": True})
            yield pd.DataFrame(out, columns=[f.name for f in IMAGE_META.fields])

    return df.select(F.col(id_col).alias(id_col), F.col(data_col)).mapInPandas(batches, IMAGE_META)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("data", T.BinaryType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
    ]
)


def resize_images(
    df: DataFrame, height: int, width: int, data_col: str = "data", id_col: str = "id", codec: str = "fake"
) -> DataFrame:
    """Resize = re-encode at the target dims (fake codec: synthesizes the
    target-size payload, preserving mean byte — the real codec slot is the
    same signature)."""
    if codec != "fake":
        raise NotImplementedError("real resize needs an image library — same seam as decode_images")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for rid, b in zip(pdf[id_col].to_numpy(), pdf[data_col].to_numpy()):
                meta = _decode_fake_image(b)
                if meta is None:
                    continue
                _, _, c, _, mean = meta
                out.append(
                    {"id": rid, "data": fake_image(height, width, c, int(mean)), "height": height, "width": width}
                )
            yield pd.DataFrame(out, columns=[f.name for f in RESIZED_SCHEMA.fields])

    return df.select(F.col(id_col).alias(id_col), F.col(data_col)).mapInPandas(batches, RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(
    df: DataFrame, every_n: int = 10, data_col: str = "data", id_col: str = "id", codec: str = "fake"
) -> DataFrame:
    """Frame sampling explodes one video row into frame rows (fake codec:
    the 'video' is a concatenation of IMG1 frames)."""
    if codec != "fake":
        raise NotImplementedError("real frame sampling needs ffmpeg — same seam")

    def split_frames(b: bytes) -> list[bytes]:
        frames, i = [], 0
        while b and i + 13 <= len(b) and b[i : i + 4] == b"IMG1":
            h, w, c = struct.unpack(">IIB", b[i + 4 : i + 13])
            end = i + 13 + h * w * c
            frames.append(b[i:end])
            i = end
        return frames

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for rid, b in zip(pdf[id_col].to_numpy(), pdf[data_col].to_numpy()):
                for idx, fr in enumerate(split_frames(b)):
                    if idx % every_n == 0:
                        out.append({"id": rid, "frame_idx": idx, "frame": fr})
            yield pd.DataFrame(out, columns=[f.name for f in FRAME_SCHEMA.fields])

    return df.select(F.col(id_col).alias(id_col), F.col(data_col)).mapInPandas(batches, FRAME_SCHEMA)


AUDIO_META = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("ok", T.BooleanType()),
    ]
)


def extract_audio_features(
    df: DataFrame, data_col: str = "data", id_col: str = "id", codec: str = "fake"
) -> DataFrame:
    if codec != "fake":
        raise NotImplementedError("real audio features need an audio library — same seam")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for rid, b in zip(pdf[id_col].to_numpy(), pdf[data_col].to_numpy()):
                if b is None or len(b) < 12 or b[:4] != b"AUD1":
                    out.append({"id": rid, "sample_rate": None, "n_samples": None,
                                "duration_s": None, "rms": None, "ok": False})
                    continue
                sr, n = struct.unpack(">II", b[4:12])
                payload = np.frombuffer(b, dtype=np.uint8, offset=12)[:n].astype(np.float64)
                rms = float(np.sqrt((payload * payload).mean())) if payload.size else 0.0
                out.append({"id": rid, "sample_rate": sr, "n_samples": n,
                            "duration_s": n / sr if sr else None, "rms": rms, "ok": True})
            yield pd.DataFrame(out, columns=[f.name for f in AUDIO_META.fields])

    return df.select(F.col(id_col).alias(id_col), F.col(data_col)).mapInPandas(batches, AUDIO_META)
