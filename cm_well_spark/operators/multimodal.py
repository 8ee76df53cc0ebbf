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
signatures — runs and is tested everywhere. REAL adapters plug in at
the same seam, each imported lazily INSIDE the Arrow batch function so
only executors need the library and a missing codec errors at run, not
plan, time:

  codec="pil"        decode/resize via Pillow
  codec="wav"        audio features via stdlib `wave` (PCM WAV — no
                     third-party dependency, always available)
  codec="soundfile"  audio features via libsndfile (flac/ogg/wav ...)
  codec="av"         video frame sampling via PyAV (ffmpeg binding);
                     frames are emitted re-packed in the IMG1 raw-RGB
                     format so decode_images(codec="fake") composes
                     downstream

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


def _import_av():
    """Lazy PyAV import at the video codec seam (executor-side only)."""
    try:
        import av  # noqa: PLC0415

        return av
    except ImportError as e:  # pragma: no cover - exercised via skipif tests
        raise NotImplementedError(
            "codec 'av' needs PyAV (ffmpeg binding) on the executors "
            "(pip install av); the 'fake' codec exercises the identical "
            "Spark plumbing without it"
        ) from e


def _import_soundfile():
    """Lazy libsndfile import at the audio codec seam (executor-side only)."""
    try:
        import soundfile  # noqa: PLC0415

        return soundfile
    except ImportError as e:  # pragma: no cover - exercised via skipif tests
        raise NotImplementedError(
            "codec 'soundfile' needs libsndfile (pip install soundfile); "
            "codec 'wav' (stdlib) or 'fake' cover the same plumbing"
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
    """Frame sampling explodes one video row into frame rows. codec='fake':
    the 'video' is a concatenation of IMG1 frames. codec='av' decodes real
    containers (mp4/mkv/webm ...) via PyAV on the executor and re-packs each
    sampled frame as IMG1 raw RGB, so decode_images(codec='fake') reads the
    output either way. Undecodable videos yield no frames (a 100 TB crawl
    always contains garbage)."""
    if codec not in ("fake", "av"):
        raise NotImplementedError(
            f"codec {codec!r}: supported codecs are 'fake' and 'av' — plug other "
            "decoders in at this seam (same batch-function contract)"
        )

    def split_frames_fake(b: bytes) -> Iterator[bytes]:
        i = 0
        while b and i + 13 <= len(b) and b[i : i + 4] == b"IMG1":
            h, w, c = struct.unpack(">IIB", b[i + 4 : i + 13])
            end = i + 13 + h * w * c
            yield b[i:end]
            i = end

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if codec == "av":
            av = _import_av()
            import io

            def split_frames(b):
                if b is None:
                    return
                try:
                    with av.open(io.BytesIO(bytes(b))) as container:
                        for frame in container.decode(video=0):
                            arr = frame.to_ndarray(format="rgb24")
                            h, w, c = arr.shape
                            yield b"IMG1" + struct.pack(">IIB", h, w, c) + arr.tobytes()
                except Exception:
                    return

        else:
            split_frames = split_frames_fake
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


def _decode_fake_audio(b):
    if b is None or len(b) < 12 or b[:4] != b"AUD1":
        return None
    sr, n = struct.unpack(">II", b[4:12])
    payload = np.frombuffer(b, dtype=np.uint8, offset=12)[:n].astype(np.float64)
    rms = float(np.sqrt((payload * payload).mean())) if payload.size else 0.0
    return sr, n, rms


def _decode_wav_audio(b):
    """Real PCM WAV decode via the stdlib `wave` module: (sample_rate,
    n_samples, rms over samples normalized to [-1, 1]). No third-party
    dependency, so the real-codec path is exercised in every environment."""
    import io
    import wave

    if b is None:
        return None
    try:
        with wave.open(io.BytesIO(bytes(b))) as w:
            sr, n, width = w.getframerate(), w.getnframes(), w.getsampwidth()
            raw = w.readframes(n)
        if width == 2:
            samples = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
        elif width == 1:
            samples = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
        elif width == 4:
            samples = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
        else:
            return None
        rms = float(np.sqrt((samples * samples).mean())) if samples.size else 0.0
        return sr, n, rms
    except Exception:
        return None


def extract_audio_features(
    df: DataFrame, data_col: str = "data", id_col: str = "id", codec: str = "fake"
) -> DataFrame:
    """Audio features per row: (sample_rate, n_samples, duration_s, rms).
    codec='fake' reads the AUD1 synthetic format (rms over raw bytes);
    codec='wav' is a REAL stdlib-`wave` PCM decoder (rms over [-1,1]-
    normalized samples); codec='soundfile' decodes flac/ogg/wav via
    libsndfile, lazily imported on the executor. Undecodable payloads
    yield ok=False rows, never exceptions."""
    if codec not in ("fake", "wav", "soundfile"):
        raise NotImplementedError(
            f"codec {codec!r}: supported codecs are 'fake', 'wav' and 'soundfile' — "
            "plug other decoders in at this seam (same batch-function contract)"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if codec == "soundfile":
            sf_mod = _import_soundfile()
            import io

            def decode(b):
                if b is None:
                    return None
                try:
                    samples, sr = sf_mod.read(io.BytesIO(bytes(b)), dtype="float64")
                    n = samples.shape[0]
                    rms = float(np.sqrt((samples * samples).mean())) if n else 0.0
                    return sr, n, rms
                except Exception:
                    return None

        elif codec == "wav":
            decode = _decode_wav_audio
        else:
            decode = _decode_fake_audio
        for pdf in it:
            out = []
            for rid, b in zip(pdf[id_col].to_numpy(), pdf[data_col].to_numpy()):
                meta = decode(b)
                if meta is None:
                    out.append({"id": rid, "sample_rate": None, "n_samples": None,
                                "duration_s": None, "rms": None, "ok": False})
                    continue
                sr, n, rms = meta
                out.append({"id": rid, "sample_rate": sr, "n_samples": n,
                            "duration_s": n / sr if sr else None, "rms": rms, "ok": True})
            yield pd.DataFrame(out, columns=[f.name for f in AUDIO_META.fields])

    return df.select(F.col(id_col).alias(id_col), F.col(data_col)).mapInPandas(batches, AUDIO_META)


# ---------------------------------------------------------------------------
# image perceptual hashing + near-dup pairs
# ---------------------------------------------------------------------------


def fake_image_pattern(height: int, width: int, channels: int = 3, seed: int = 0) -> bytes:
    """A structured deterministic IMG1 image (LCG-filled payload): unlike
    fake_image's constant fill, patterned pixels give perceptual hashes
    something to see, and identical seeds produce identical images —
    exactly what a dedup fixture needs."""
    n = height * width * channels
    out = bytearray(n)
    x = (seed * 2654435761 + 12345) & 0xFFFFFFFF
    for i in range(n):
        x = (x * 1103515245 + 12345) & 0x7FFFFFFF
        out[i] = (x >> 16) & 0xFF
    return b"IMG1" + struct.pack(">IIB", height, width, channels) + bytes(out)


def _dhash64(arr, hash_size: int = 8) -> int:
    """Difference hash (dHash, the standard perceptual hash): grayscale,
    area-resize to (hash_size x hash_size+1), one bit per horizontal
    gradient sign. Pure numpy — runs identically on any decoded RGB
    array, fake or real codec."""
    gray = arr.astype(np.float64).mean(axis=2) if arr.ndim == 3 else arr.astype(np.float64)
    h, w = gray.shape
    rows = np.array_split(np.arange(h), hash_size)
    cols = np.array_split(np.arange(w), hash_size + 1)
    small = np.empty((hash_size, hash_size + 1))
    for i, r in enumerate(rows):
        for j, c in enumerate(cols):
            block = gray[np.ix_(r, c)] if len(r) and len(c) else np.zeros((1, 1))
            small[i, j] = block.mean()
    bits = (small[:, 1:] > small[:, :-1]).flatten()
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    # two's-complement into a signed 64-bit long (Spark LongType)
    return v - (1 << 64) if v >= (1 << 63) else v


DHASH_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("dhash", T.LongType()),
        T.StructField("ok", T.BooleanType()),
    ]
)


def image_dhash(
    df: DataFrame,
    data_col: str = "data",
    id_col: str = "id",
    hash_size: int = 8,
    codec: str = "fake",
) -> DataFrame:
    """Per-image 64-bit perceptual hash (dHash) via Arrow-batched
    mapInPandas — the multimodal twin of text simhash: near-identical
    images (re-encodes, minor crops/noise) land within a small Hamming
    distance. codec='fake' reads IMG1 raw RGB; codec='pil' decodes real
    formats through the Pillow seam. Undecodable rows report ok=False
    with a null hash (a 100 TB crawl always contains garbage)."""
    if codec not in ("fake", "pil"):
        raise NotImplementedError(
            f"codec {codec!r}: supported codecs are 'fake' and 'pil' — plug other "
            "decoders in at this seam (same batch-function contract)"
        )
    if hash_size * (hash_size) > 64:
        raise ValueError("hash_size^2 must fit in 64 bits (hash_size <= 8)")

    def to_array_fake(b):
        if b is None or len(b) < 13 or bytes(b[:4]) != b"IMG1":
            return None
        h, w, c = struct.unpack(">IIB", bytes(b[4:13]))
        payload = np.frombuffer(bytes(b), dtype=np.uint8, offset=13)
        if payload.size != h * w * c or h == 0 or w == 0:
            return None
        return payload.reshape(h, w, c)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if codec == "pil":
            Image = _import_pil()
            import io

            def to_array(b):
                if b is None:
                    return None
                try:
                    with Image.open(io.BytesIO(bytes(b))) as im:
                        return np.asarray(im.convert("RGB"))
                except Exception:
                    return None

        else:
            to_array = to_array_fake
        for pdf in it:
            ids, hs, oks = [], [], []
            for rid, b in zip(pdf[id_col].to_numpy(), pdf[data_col].to_numpy()):
                arr = to_array(b)
                ids.append(rid)
                hs.append(None if arr is None else _dhash64(arr, hash_size))
                oks.append(arr is not None)
            # nullable Int64, NOT object/float64: a batch mixing None with
            # hashes must not round 64-bit values through float64
            yield pd.DataFrame(
                {"id": ids, "dhash": pd.array(hs, dtype="Int64"), "ok": oks}
            )

    return df.select(F.col(id_col).alias("id"), F.col(data_col)).mapInPandas(batches, DHASH_SCHEMA)


def image_dup_pairs(hashes: DataFrame, max_distance: int = 3) -> DataFrame:
    """Near-duplicate image pairs from dHash values — (id_a, id_b,
    distance), id_a < id_b, Hamming distance <= max_distance.

    Shape at 100 TB: the same pigeonhole-band plan as text simhash —
    the 64-bit hash splits into max_distance+1 blocks, a pair within
    the distance budget must agree on at least one whole block, so
    candidates meet through block-value equi-joins (never all-pairs)
    and only candidates pay the exact popcount verify."""
    from cm_well_spark.operators.dedup import hamming64

    n_blocks = max_distance + 1
    width = 64 // n_blocks
    mask = -1 if width == 64 else (1 << width) - 1  # width 64: AND -1 = identity
    h = hashes.where(F.col("dhash").isNotNull()).select(
        F.col("id"), F.col("dhash")
    )
    blocks = [
        F.struct(
            F.lit(i).alias("blk"),
            F.shiftrightunsigned(F.col("dhash"), i * width).bitwiseAND(
                F.lit(mask)
            ).alias("val"),
        )
        for i in range(n_blocks)
    ]
    exploded = h.select("id", "dhash", F.explode(F.array(*blocks)).alias("b"))
    a, b = exploded.alias("a"), exploded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.b") == F.col("b.b")) & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.dhash").alias("h_a"),
            F.col("b.dhash").alias("h_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn("distance", hamming64(F.col("h_a"), F.col("h_b")))
        .where(F.col("distance") <= max_distance)
        .select("id_a", "id_b", "distance")
    )


# ---------------------------------------------------------------------------
# audio fingerprinting (energy-contrast hash, reuses image_dup_pairs)
# ---------------------------------------------------------------------------


def _audio_samples_fake(b):
    if b is None or len(b) < 12 or bytes(b[:4]) != b"AUD1":
        return None
    n = struct.unpack(">II", bytes(b[4:12]))[1]
    s = np.frombuffer(bytes(b), dtype=np.uint8, offset=12)[:n].astype(np.float64)
    return (s - 128.0) / 128.0


def _audio_samples_wav(b):
    import io
    import wave

    if b is None:
        return None
    try:
        with wave.open(io.BytesIO(bytes(b))) as w:
            n, width = w.getnframes(), w.getsampwidth()
            raw = w.readframes(n)
        if width == 2:
            return np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
        if width == 1:
            return (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
        if width == 4:
            return np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
        return None
    except Exception:
        return None


def _afp64(samples, n_frames: int = 65) -> int:
    """Energy-contrast audio fingerprint: split the waveform into
    n_frames windows, one bit per adjacent-window energy increase —
    the time-domain cousin of the Haitsma-Kalker scheme (band energy
    differences), 64 bits so the banded Hamming join applies as-is."""
    if samples is None or samples.size == 0:
        return None
    chunks = np.array_split(samples, n_frames)
    energy = np.array([float((c * c).mean()) if c.size else 0.0 for c in chunks])
    bits = energy[1:] > energy[:-1]
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    return v - (1 << 64) if v >= (1 << 63) else v


def audio_fingerprint(
    df: DataFrame, data_col: str = "data", id_col: str = "id", codec: str = "fake"
) -> DataFrame:
    """Per-row 64-bit audio fingerprint (id, dhash, ok) — the same output
    contract as image_dhash, so image_dup_pairs generates audio near-dup
    pairs with the identical pigeonhole-banded plan. codec='fake' reads
    AUD1; codec='wav' real PCM via stdlib wave. Undecodable rows report
    ok=False, never raise."""
    if codec not in ("fake", "wav"):
        raise NotImplementedError(
            f"codec {codec!r}: supported codecs are 'fake' and 'wav' — plug other "
            "decoders in at this seam (same batch-function contract)"
        )
    to_samples = _audio_samples_wav if codec == "wav" else _audio_samples_fake

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, hs, oks = [], [], []
            for rid, b in zip(pdf[id_col].to_numpy(), pdf[data_col].to_numpy()):
                s = to_samples(b)
                fp = _afp64(s) if s is not None else None
                ids.append(rid)
                hs.append(fp)
                oks.append(fp is not None)
            yield pd.DataFrame({"id": ids, "dhash": pd.array(hs, dtype="Int64"), "ok": oks})

    return df.select(F.col(id_col).alias("id"), F.col(data_col)).mapInPandas(batches, DHASH_SCHEMA)


def fake_audio_pattern(sample_rate: int, n_samples: int, seed: int = 0) -> bytes:
    """Structured deterministic AUD1 payload (LCG bytes) — identical
    seeds produce identical waveforms; the audio analog of
    fake_image_pattern."""
    out = bytearray(n_samples)
    x = (seed * 2654435761 + 99991) & 0xFFFFFFFF
    for i in range(n_samples):
        x = (x * 1103515245 + 12345) & 0x7FFFFFFF
        out[i] = (x >> 16) & 0xFF
    return b"AUD1" + struct.pack(">II", sample_rate, n_samples) + bytes(out)


def video_dup_pairs(
    df: DataFrame,
    data_col: str = "data",
    id_col: str = "id",
    every_n: int = 1,
    min_shared: int = 2,
    codec: str = "fake",
) -> DataFrame:
    """Video near-dup pairs by shared perceptual frame hashes — the
    standard sampled-frame fingerprint scheme: sample frames, dHash each,
    and call two videos near-duplicates when they share >= `min_shared`
    distinct frame hashes (id_a < id_b, n_shared).

    Composition of existing operators: sample_frames (one explode) ->
    image_dhash (Arrow batches) -> distinct (video, hash) -> hash
    equi-join. Videos meet only through equal frame hashes — never
    all-pairs — and the join key is a 64-bit long. Same 100 TB posture
    as the text shingle join, with the same hot-key caveat (intro/outro
    boilerplate frames; filter them like jaccard_pairs' shingle guard if
    a corpus has them)."""
    frames = sample_frames(df, every_n=every_n, data_col=data_col, id_col=id_col, codec=codec)
    hashed = image_dhash(frames, data_col="frame", id_col="id", codec="fake")
    vh = (
        hashed.where(F.col("ok"))
        .select(F.col("id"), F.col("dhash"))
        .distinct()
    )
    a, b = vh.alias("a"), vh.alias("b")
    return (
        a.join(b, (F.col("a.dhash") == F.col("b.dhash")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )
