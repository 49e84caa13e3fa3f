"""Multimodal columns: opaque binary media + typed metadata (beyond the
reference — a training-data-pipeline capability the engine adds first-class).

Model: media is an opaque ``binary`` column plus a typed ``meta`` struct
(the same shape the reference uses for news provenance — a nested struct,
/root/reference/flow/scripts/crawl_mapping.py:12-20 — applied to media).
Decode / resize / feature-extract / frame-sample run as Arrow-batched
``mapInPandas`` stages: the only sane shape at 100 TB, since each batch
moves one Arrow RecordBatch of blobs into Python, processes vectorized, and
returns columnar results — no per-row pickling, no driver involvement.

Codecs: a self-describing RAW format (header + uint8 payload) plus REAL
decoders for PNG (optional PIL first, else a stdlib zlib/struct decoder for
8-bit gray/RGB/RGBA, the overwhelmingly common case) and WAV (optional
soundfile first, else the stdlib ``wave`` module). JPEG and exotic PNG
variants still need an external lib; blobs nothing can decode are
QUARANTINED per blob (skipped by the feature stages, surfaced by
``decode_audit``) — never a job-killing raise.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# ---------------------------------------------------------------- schemas

META_SCHEMA = StructType(
    [
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("sample_rate", IntegerType()),
    ]
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),  # image | video | audio
        StructField("content", BinaryType()),
        StructField("meta", META_SCHEMA),
    ]
)

_MAGIC = b"PKRW"  # engine-native RAW codec magic
_HDR = struct.Struct("<4sIIII")  # magic, frames, height, width, channels


def encode_raw(frames: np.ndarray) -> bytes:
    """RAW codec encode: (n_frames, h, w, c) uint8 → bytes."""
    f, h, w, c = frames.shape
    return _HDR.pack(_MAGIC, f, h, w, c) + frames.tobytes()


class UnsupportedMediaError(ValueError):
    """Blob that no available codec can decode — quarantined per blob by the
    feature stages, never allowed to kill the job."""


def decode_raw(blob: bytes) -> np.ndarray:
    magic, f, h, w, c = _HDR.unpack_from(blob)
    if magic != _MAGIC:
        raise UnsupportedMediaError("not a RAW blob")
    return np.frombuffer(blob, dtype=np.uint8, offset=_HDR.size).reshape(f, h, w, c)


# --------------------------------------------------------------- PNG codec

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
# color type → channels for the 8-bit cases the builtin decoder handles
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def decode_png(blob: bytes) -> np.ndarray:
    """Real PNG decode → (1, h, w, c) uint8. Tries PIL when importable;
    otherwise a stdlib decoder (zlib inflate + per-scanline unfilter) for
    8-bit depth, color types gray/RGB/gray-alpha/RGBA, non-interlaced —
    i.e. what PNG encoders emit by default. Anything else raises
    UnsupportedMediaError (quarantined upstream)."""
    try:
        import io

        from PIL import Image  # optional accelerator, absent in this env

        img = Image.open(io.BytesIO(blob))
        # Preserve native channel count for the modes the stdlib decoder
        # also handles, so features are identical with or without PIL;
        # quarantine everything else exactly like the stdlib path would.
        if img.mode not in ("L", "LA", "RGB", "RGBA"):
            raise UnsupportedMediaError(f"PNG mode {img.mode} needs conversion policy")
        arr = np.asarray(img, dtype=np.uint8)
        if arr.ndim == 2:  # L mode: add the channel axis
            arr = arr[..., None]
        return arr[None, ...]
    except ImportError:
        pass
    import zlib

    if blob[:8] != _PNG_MAGIC:
        raise UnsupportedMediaError("not a PNG")
    pos, idat, hdr = 8, b"", None
    while pos + 8 <= len(blob):
        (length,), ctype = struct.unpack(">I", blob[pos : pos + 4]), blob[pos + 4 : pos + 8]
        data = blob[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            hdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + data + crc
    if hdr is None:
        raise UnsupportedMediaError("PNG missing IHDR")
    w, h, depth, color, _comp, _filt, interlace = hdr
    if depth != 8 or color not in _PNG_CHANNELS or interlace != 0:
        raise UnsupportedMediaError(
            f"PNG variant needs external codec (depth={depth} color={color} interlace={interlace})"
        )
    c = _PNG_CHANNELS[color]
    raw = zlib.decompress(idat)
    stride = w * c
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).copy()
        if ftype == 0:  # None
            cur = line
        elif ftype == 2:  # Up
            cur = line + prev
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth: sequential in x
            cur = line
            for x in range(stride):
                a = int(cur[x - c]) if x >= c else 0
                b = int(prev[x])
                if ftype == 1:
                    cur[x] = (int(line[x]) + a) & 0xFF
                elif ftype == 3:
                    cur[x] = (int(line[x]) + ((a + b) >> 1)) & 0xFF
                else:
                    cc = int(prev[x - c]) if x >= c else 0
                    p = a + b - cc
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else cc)
                    cur[x] = (int(line[x]) + pred) & 0xFF
        else:
            raise UnsupportedMediaError(f"PNG filter {ftype}")
        out[y] = cur
        prev = out[y]
    return out.reshape(h, w, c)[None, ...]


# --------------------------------------------------------------- WAV codec

_WAV_MAGIC_RIFF = b"RIFF"


def decode_wav(blob: bytes) -> np.ndarray:
    """Real WAV decode → (1, 1, n_samples, channels) uint8 (16-bit PCM maps
    to the high byte, offset to unsigned — lossy but feature-equivalent for
    the mean/std/histogram stages). Tries soundfile when importable, else
    the stdlib ``wave`` module."""
    import io

    try:
        import soundfile as sf  # optional, absent in this env

        data, _rate = sf.read(io.BytesIO(blob), dtype="int16", always_2d=True)
        arr = ((data.astype(np.int32) >> 8) + 128).astype(np.uint8)
        return arr[None, None, ...]
    except ImportError:
        pass
    import wave

    try:
        with wave.open(io.BytesIO(blob), "rb") as wf:
            nch, sampwidth, _rate, nframes = (
                wf.getnchannels(),
                wf.getsampwidth(),
                wf.getframerate(),
                wf.getnframes(),
            )
            payload = wf.readframes(nframes)
    except (wave.Error, EOFError) as e:
        raise UnsupportedMediaError(f"WAV: {e}") from e
    if sampwidth == 1:  # 8-bit PCM is already unsigned
        arr = np.frombuffer(payload, dtype=np.uint8).reshape(-1, nch)
    elif sampwidth == 2:
        pcm = np.frombuffer(payload, dtype="<i2").reshape(-1, nch)
        arr = ((pcm.astype(np.int32) >> 8) + 128).astype(np.uint8)
    else:
        raise UnsupportedMediaError(f"WAV sample width {sampwidth}")
    return arr[None, None, ...]


def decode_media(blob: bytes) -> np.ndarray:
    """Codec dispatch on magic bytes → (frames, h, w, c) uint8. RAW, PNG,
    and WAV decode for real; anything else (JPEG, …) raises
    UnsupportedMediaError for per-blob quarantine. A TRUNCATED or corrupt
    blob of a known format (struct/zlib/reshape errors mid-decode) is also
    mapped to UnsupportedMediaError — a malformed blob must route to the
    quarantine, never kill the job."""
    head = bytes(blob[:12])
    try:
        if head[:4] == _MAGIC:
            return decode_raw(blob)
        if head[:8] == _PNG_MAGIC:
            return decode_png(blob)
        if head[:4] == _WAV_MAGIC_RIFF and head[8:12] == b"WAVE":
            return decode_wav(blob)
    except UnsupportedMediaError:
        raise
    except Exception as e:  # truncated/corrupt payloads of a known magic
        raise UnsupportedMediaError(f"corrupt {head[:4]!r} blob: {e}") from e
    raise UnsupportedMediaError(f"unknown media magic {head[:4]!r}")


# ---------------------------------------------------------------- synthesis


def synth_media(
    spark: SparkSession,
    n: int = 64,
    height: int = 32,
    width: int = 32,
    channels: int = 3,
    frames_for_video: int = 8,
    partitions: int = 8,
) -> DataFrame:
    """Deterministic synthetic media corpus, generated ON EXECUTORS
    (spark.range → mapInPandas): no driver-side materialization, so the same
    call scales to any n. Even ids are images (1 frame), odd ids are videos.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf["id"]:
                mid = int(mid)
                is_video = mid % 2 == 1
                f = frames_for_video if is_video else 1
                rng = np.random.default_rng(mid)  # deterministic per id
                frames = rng.integers(0, 256, (f, height, width, channels), dtype=np.uint8)
                rows.append(
                    {
                        "media_id": mid,
                        "media_type": "video" if is_video else "image",
                        "content": encode_raw(frames),
                        "meta": {
                            "format": "raw",
                            "width": width,
                            "height": height,
                            "channels": channels,
                            "n_frames": f,
                            "sample_rate": None,
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return (
        spark.range(0, n, numPartitions=partitions)
        .mapInPandas(gen, schema=MEDIA_SCHEMA)
    )


# ---------------------------------------------------------------- operators

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_frames", IntegerType()),
        StructField("mean_channel", ArrayType(DoubleType())),
        StructField("std_channel", ArrayType(DoubleType())),
        StructField("histogram", ArrayType(DoubleType())),
    ]
)


def extract_features(df: DataFrame, hist_bins: int = 16) -> DataFrame:
    """Decode + per-channel mean/std + normalized intensity histogram, one
    Arrow batch at a time. Output is a compact feature frame (the
    'embedding' stage of a multimodal training pipeline)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                try:
                    arr = decode_media(bytes(blob)).astype(np.float64)
                except UnsupportedMediaError:
                    continue  # per-blob quarantine; surfaced by decode_audit
                hist, _ = np.histogram(arr, bins=hist_bins, range=(0, 256), density=False)
                out.append(
                    {
                        "media_id": int(mid),
                        "n_frames": arr.shape[0],
                        "mean_channel": arr.mean(axis=(0, 1, 2)).tolist(),
                        "std_channel": arr.std(axis=(0, 1, 2)).tolist(),
                        "histogram": (hist / hist.sum()).tolist(),
                    }
                )
            yield pd.DataFrame(out)

    return df.select("media_id", "content").mapInPandas(run, schema=FEATURES_SCHEMA)


AUDIT_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("ok", BooleanType()),
        StructField("error", StringType()),
    ]
)


def decode_audit(df: DataFrame) -> DataFrame:
    """W4 for media: which blobs decode, and why the rest don't — the
    quarantine ledger feeding a dead-letter sink. One Arrow pass; never
    raises."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                try:
                    decode_media(bytes(blob))
                    out.append({"media_id": int(mid), "ok": True, "error": None})
                except UnsupportedMediaError as e:
                    out.append({"media_id": int(mid), "ok": False, "error": str(e)})
            yield pd.DataFrame(out)

    return df.select("media_id", "content").mapInPandas(run, schema=AUDIT_SCHEMA)


def resize(df: DataFrame, out_h: int, out_w: int) -> DataFrame:
    """Nearest-neighbor resize of every frame, re-encoded RAW. Same schema
    in and out → resize stages compose/pipeline freely."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keep, contents, metas = [], [], []
            for idx, (blob, meta) in enumerate(zip(pdf["content"], pdf["meta"])):
                try:
                    arr = decode_media(bytes(blob))
                except UnsupportedMediaError:
                    continue  # per-blob quarantine (decode_audit explains)
                keep.append(idx)
                f, h, w, c = arr.shape
                yi = (np.arange(out_h) * h // out_h).clip(0, h - 1)
                xi = (np.arange(out_w) * w // out_w).clip(0, w - 1)
                resized = arr[:, yi][:, :, xi]
                contents.append(encode_raw(np.ascontiguousarray(resized)))
                m = dict(meta) if meta is not None else {}
                m["width"], m["height"] = out_w, out_h
                metas.append(m)
            if not keep:  # whole batch quarantined: nothing to emit
                continue
            pdf = pdf.iloc[keep].copy()
            pdf["content"], pdf["meta"] = contents, metas
            yield pdf

    return df.mapInPandas(run, schema=MEDIA_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_index", IntegerType()),
        StructField("frame", BinaryType()),  # single-frame RAW
    ]
)


def sample_frames(df: DataFrame, every: int = 2) -> DataFrame:
    """Video → every k-th frame as its own row (1:N mapInPandas — the UDTF
    shape). Downstream image ops apply unchanged to the single-frame RAW."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                try:
                    arr = decode_media(bytes(blob))
                except UnsupportedMediaError:
                    continue  # per-blob quarantine
                for idx in range(0, arr.shape[0], every):
                    out.append(
                        {
                            "media_id": int(mid),
                            "frame_index": idx,
                            "frame": encode_raw(arr[idx : idx + 1]),
                        }
                    )
            yield pd.DataFrame(out)

    return df.select("media_id", "content").mapInPandas(run, schema=FRAME_SCHEMA)


def byte_stats(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Pure-JVM binary column stats (no Python): size, head/tail bytes.
    The cheap pre-filter a pipeline runs BEFORE any decode — corrupt/empty
    blob triage at scan speed."""
    c = F.col(content_col)
    return df.select(
        "media_id",
        F.octet_length(c).alias("n_bytes"),
        F.substring(c, 1, 4).cast("string").alias("magic"),
    )
