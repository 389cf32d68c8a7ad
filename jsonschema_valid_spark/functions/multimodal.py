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


# ---------------------------------------------------------------------------
# REAL decoders for library-free formats (r4 wave 14)
#
# PPM (P6) and WAV (PCM16) are fully specified byte formats parseable with
# numpy alone — no PIL/ffmpeg needed — so for THESE formats the decode /
# feature-extract / resize kernels below are REAL, not stubs: actual
# header parsing, actual pixel/sample math, round-trippable bytes. The
# fake-flag kernels above remain for container-absent codecs (JPEG/MP4).
# ---------------------------------------------------------------------------

def _ppm_encode(arr) -> bytes:
    """numpy (h, w, 3) uint8 -> binary PPM (P6)."""
    h, w, _ = arr.shape
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def _ppm_decode(raw: bytes):
    """Binary PPM (P6) -> numpy (h, w, 3) uint8. Real parser: magic,
    whitespace/comment-tolerant header tokens, maxval check."""
    import numpy as np

    if raw[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    tokens, pos = [], 2
    while len(tokens) < 3:
        while pos < len(raw) and raw[pos:pos + 1].isspace():
            pos += 1
        if raw[pos:pos + 1] == b"#":          # comment to end of line
            while pos < len(raw) and raw[pos:pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(raw) and not raw[pos:pos + 1].isspace():
            pos += 1
        tokens.append(int(raw[start:pos]))
    pos += 1  # single whitespace after maxval per spec
    w, h, maxval = tokens
    if maxval != 255:
        raise ValueError(f"only maxval 255 supported, got {maxval}")
    px = np.frombuffer(raw, dtype=np.uint8, count=w * h * 3, offset=pos)
    return px.reshape(h, w, 3)


def _wav_encode(samples, rate: int = 8000) -> bytes:
    """numpy int16 mono samples -> RIFF/WAVE PCM16 bytes."""
    import struct

    data = samples.astype("<i2").tobytes()
    return (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate,
                                    rate * 2, 2, 16)
            + b"data" + struct.pack("<I", len(data)) + data)


def _wav_decode(raw: bytes):
    """RIFF/WAVE PCM16 -> (rate, numpy int16 samples). Real chunk walk
    (fmt then data, skipping unknown chunks)."""
    import struct

    import numpy as np

    if raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, bits, channels, data = 12, None, None, None, None
    while pos + 8 <= len(raw):
        cid, size = raw[pos:pos + 4], struct.unpack(
            "<I", raw[pos + 4:pos + 8])[0]
        body = raw[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt, channels, rate, _, _, bits = struct.unpack(
                "<HHIIHH", body[:16])
            if fmt != 1:
                raise ValueError(f"only PCM supported, got format {fmt}")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)          # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    if bits != 16 or channels != 1:
        raise ValueError("only 16-bit mono supported")
    return rate, np.frombuffer(data, dtype="<i2")


def _ensure_worker_pickling() -> None:
    """Executors may lack this package on sys.path (a bare session
    without --py-files); registering the module for by-value pickling
    ships the PPM/WAV codecs inside the serialized kernels (same fix as
    operators/tdigest.py)."""
    try:
        import sys

        from pyspark import cloudpickle

        cloudpickle.register_pickle_by_value(sys.modules[__name__])
    except Exception:
        pass  # vendored cloudpickle without the API → --py-files path


def synth_ppm_wav_table(spark, n: int = 32) -> DataFrame:
    """Deterministic REAL media: even ids get an 8×8 RGB gradient PPM,
    odd ids a 400-sample 8 kHz sine WAV (frequency varies with id)."""
    import math

    import numpy as np

    rows = []
    for i in range(n):
        if i % 2 == 0:
            a = np.zeros((8, 8, 3), dtype=np.uint8)
            for y in range(8):
                for x in range(8):
                    a[y, x] = ((x * 32 + i) % 256, (y * 32) % 256, 7)
            rows.append((f"img-{i:04d}", _ppm_encode(a), "image",
                         (8, 8, 3, "ppm")))
        else:
            t = np.arange(400)
            s = (8000 * np.sin(2 * math.pi * (100 + 10 * i) * t / 8000)
                 ).astype(np.int16)
            rows.append((f"wav-{i:04d}", _wav_encode(s, 8000), "audio",
                         (0, 0, 1, "wav")))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def decode_ppm_stats(df: DataFrame) -> DataFrame:
    """REAL image decode + feature extraction (PPM payloads): parses the
    P6 header and pixel buffer with numpy and emits
    ``(media_id, width, height, mean_r, mean_g, mean_b, std_all)``
    rounded to 6. Arrow-batched ``mapInPandas``, pure per-partition map
    (no shuffle); corrupt payloads surface as real errors, not NULLs —
    quarantine upstream with x-rowExpr on the magic bytes if the feed
    is dirty."""
    out_schema = ("media_id string, width int, height int, "
                  "mean_r double, mean_g double, mean_b double, "
                  "std_all double")
    _ensure_worker_pickling()

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = {k: [] for k in ("media_id", "width", "height",
                                   "mean_r", "mean_g", "mean_b",
                                   "std_all")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                a = _ppm_decode(bytes(payload))
                out["media_id"].append(mid)
                out["height"].append(a.shape[0])
                out["width"].append(a.shape[1])
                for ci, name in enumerate(("mean_r", "mean_g", "mean_b")):
                    out[name].append(round(float(a[:, :, ci].mean()), 6))
                out["std_all"].append(
                    round(float(a.astype(np.float64).std()), 6))
            yield pd.DataFrame(out)

    return (df.where(F.col("media_type") == "image")
            .mapInPandas(kernel, schema=out_schema))


def decode_wav_stats(df: DataFrame) -> DataFrame:
    """REAL audio decode (PCM16 WAV): RIFF chunk walk with numpy sample
    math — ``(media_id, sample_rate, n_samples, duration_s, rms,
    peak)``. Same Arrow-batched no-shuffle shape as the image kernel."""
    out_schema = ("media_id string, sample_rate int, n_samples int, "
                  "duration_s double, rms double, peak int")
    _ensure_worker_pickling()

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = {k: [] for k in ("media_id", "sample_rate",
                                   "n_samples", "duration_s", "rms",
                                   "peak")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                rate, s = _wav_decode(bytes(payload))
                out["media_id"].append(mid)
                out["sample_rate"].append(rate)
                out["n_samples"].append(len(s))
                out["duration_s"].append(round(len(s) / rate, 6))
                out["rms"].append(round(float(np.sqrt(
                    np.mean(s.astype(np.float64) ** 2))), 6))
                out["peak"].append(int(np.abs(
                    s.astype(np.int32)).max()) if len(s) else 0)
            yield pd.DataFrame(out)

    return (df.where(F.col("media_type") == "audio")
            .mapInPandas(kernel, schema=out_schema))


def resize_ppm(df: DataFrame, width: int, height: int) -> DataFrame:
    """REAL nearest-neighbor image resize for PPM payloads: numpy index
    sampling, re-encoded to valid P6 bytes (round-trippable through
    :func:`decode_ppm_stats`). Emits ``(media_id, payload, width,
    height)``."""
    out_schema = "media_id string, payload binary, width int, height int"
    _ensure_worker_pickling()
    tw, th = int(width), int(height)
    if tw < 1 or th < 1:
        raise ValueError("target size must be >= 1")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, payloads = [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                a = _ppm_decode(bytes(payload))
                h, w, _ = a.shape
                ys = (np.arange(th) * h // th)
                xs = (np.arange(tw) * w // tw)
                ids.append(mid)
                payloads.append(_ppm_encode(a[np.ix_(ys, xs)]))
            yield pd.DataFrame({
                "media_id": ids, "payload": payloads,
                "width": tw, "height": th,
            })

    return (df.where(F.col("media_type") == "image")
            .mapInPandas(kernel, schema=out_schema))
