"""Multimodal column plumbing: images/audio/video as opaque ``binary``
columns with typed metadata.

The decode libraries (PIL/ffmpeg/librosa) are not in this container, so the
decode kernels are STUBBED behind ``SPARK_GRAFT_FAKE_DECODE`` (deterministic
fake) / ``NotImplementedError`` — but the Spark-side plumbing is real and
tested: schemas, Arrow batch shapes, ``mapInPandas`` signatures, and
partitioning all match what a real decoder drops into.

Batch sizing note for 100 TB: binary payloads make rows wide — set
``spark.sql.execution.arrow.maxRecordsPerBatch`` low (e.g. 256) and size
``spark.sql.files.maxPartitionBytes`` so a partition of blobs fits executor
memory; the ops below are pure per-partition maps (no shuffle).
"""

from __future__ import annotations

import os
import zlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

IMAGE_META_SCHEMA = T.StructType([
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("channels", T.IntegerType()),
    T.StructField("format", T.StringType()),
])

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("media_type", T.StringType()),   # image|audio|video
    T.StructField("meta", IMAGE_META_SCHEMA),
])


def synth_media_table(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table (payload = compressed id bytes)."""
    rows = []
    for i in range(n):
        payload = zlib.compress((f"media-{i:06d}" * 7).encode())
        rows.append((
            f"media-{i:06d}", payload,
            ["image", "audio", "video"][i % 3],
            (64 + i % 128, 64 + (i * 3) % 128, 3, "fake"),
        ))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_allowed() -> bool:
    return os.environ.get("SPARK_GRAFT_FAKE_DECODE", "1") == "1"


def decode_features(df: DataFrame, feat_dim: int = 8) -> DataFrame:
    """Decode + feature-extract via Arrow-batched ``mapInPandas``.

    Real deployment: replace ``_fake_features`` with the PIL/ffmpeg kernel —
    the schema, batch iteration, and partitioning stay identical. Without the
    fake flag this raises ``NotImplementedError`` (the decode libs are not in
    this container)."""
    out_schema = ("media_id string, media_type string, "
                  f"features array<double>, n_bytes int")
    # capture the stub flag on the DRIVER (worker processes don't see
    # driver-side env mutations after the session starts)
    fake = _fake_allowed()

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image/audio decode libraries unavailable in this "
                    "container; set SPARK_GRAFT_FAKE_DECODE=1 for the "
                    "deterministic fake kernel")
            feats, nbytes = [], []
            for payload in pdf["payload"]:
                raw = zlib.decompress(bytes(payload))
                # deterministic fake "features": byte-histogram moments
                acc = [0.0] * feat_dim
                for j, byte in enumerate(raw):
                    acc[j % feat_dim] += byte / 255.0
                feats.append([round(x / max(len(raw), 1) * feat_dim, 9)
                              for x in acc])
                nbytes.append(len(raw))
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "media_type": pdf["media_type"],
                "features": feats,
                "n_bytes": nbytes,
            })

    return df.mapInPandas(kernel, schema=out_schema)


def frame_sample(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: emits one row per sampled frame index.
    The real kernel would decode frames; the fake derives frame count from
    payload size. Output schema matches a real sampler."""
    out_schema = "media_id string, frame_idx int, frame binary"
    fake = _fake_allowed()

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError("video decode unavailable")
            ids, idxs, frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                n_frames = max(1, len(bytes(payload)) // 16)
                for fi in range(0, n_frames, every_n):
                    ids.append(mid)
                    idxs.append(fi)
                    frames.append(bytes([fi % 256]) * 4)
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs,
                                "frame": frames})

    return (df.where(F.col("media_type") == "video")
            .mapInPandas(kernel, schema=out_schema))
