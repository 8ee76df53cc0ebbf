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

Codecs: `codec="fake"` decodes a deterministic synthetic header format
so the whole Spark surface — schema, batching, partition sizing, UDF
signatures — runs and is tested everywhere; `codec="pil"` is a REAL
adapter (Pillow, imported lazily inside the Arrow batch function so the
driver never needs it) for decode/resize — it raises NotImplementedError
only when Pillow is genuinely absent at runtime. `codec="ffmpeg"` for
video/audio remains a marked seam (no ffmpeg binding to adapt to here).

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


def _import_pil():
    """Lazy Pillow import at the codec seam: called INSIDE the Arrow batch
    function, so only executors need the library and a driver-side plan
    build never fails on a missing codec."""
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError as e:  # pragma: no cover - exercised via skipif tests
        raise NotImplementedError(
            "codec 'pil' needs Pillow on the executors (pip install Pillow); "
            "the 'fake' codec exercises the identical Spark plumbing without it"
        ) from e


def _decode_pil_image(Image, b: bytes):
    """Real decode: bytes -> (h, w, channels, n_bytes, mean_byte). Same
    contract as the fake codec; any decode failure returns None (ok=False
    row) — a 100 TB crawl always contains garbage."""
    import io

    if b is None:
        return None
    try:
        img = Image.open(io.BytesIO(bytes(b)))
        arr = np.asarray(img)
        h, w = arr.shape[0], arr.shape[1]
        c = 1 if arr.ndim == 2 else arr.shape[2]
        return h, w, c, len(b), float(arr.mean())
    except Exception:
        return None


def decode_images(
    df: DataFrame, data_col: str = "data", id_col: str = "id", codec: str = "fake"
) -> DataFrame:
    """mapInPandas decode: one Arrow batch in, one metadata frame out.
    Corrupt/foreign payloads yield ok=False rows, never exceptions (a
    100 TB crawl always contains garbage). codec='pil' decodes real image
    formats via Pillow (loaded lazily on the executor); codec='fake'
    decodes the synthetic IMG1 format."""
    if codec not in ("fake", "pil"):
        raise NotImplementedError(
            f"codec {codec!r}: supported codecs are 'fake' and 'pil' — plug other "
            "decoders in at this seam (same batch-function contract)"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if codec == "pil":
            Image = _import_pil()
            decode = lambda b: _decode_pil_image(Image, b)  # noqa: E731
        else:
            decode = _decode_fake_image
        # zip over the column ndarrays (iterrows materializes a Series per
        # row — ~100x slower); the byte math is numpy inside the decoder
        for pdf in it:
            out = []
            for rid, b in zip(pdf[id_col].to_numpy(), pdf[data_col].to_numpy()):
                meta = decode(b)
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
    """Resize = re-encode at the target dims. codec='pil' decodes, resizes
    (bilinear) and re-encodes PNG via Pillow on the executor; the fake
    codec synthesizes the target-size payload preserving mean byte.
    Undecodable rows are dropped (the decode step reports them)."""
    if codec not in ("fake", "pil"):
        raise NotImplementedError(
            f"codec {codec!r}: supported codecs are 'fake' and 'pil' — same seam as decode_images"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if codec == "pil":
            import io

            Image = _import_pil()

            def resize(b):
                try:
                    img = Image.open(io.BytesIO(bytes(b)))
                    resized = img.resize((width, height))
                    buf = io.BytesIO()
                    resized.save(buf, format="PNG")
                    return buf.getvalue()
                except Exception:
                    return None

        else:

            def resize(b):
                meta = _decode_fake_image(b)
                if meta is None:
                    return None
                _, _, c, _, mean = meta
                return fake_image(height, width, c, int(mean))

        for pdf in it:
            out = []
            for rid, b in zip(pdf[id_col].to_numpy(), pdf[data_col].to_numpy()):
                data = resize(b)
                if data is None:
                    continue
                out.append({"id": rid, "data": data, "height": height, "width": width})
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
