"""REAL multimodal kernels (wave 14): PPM/WAV are fully specified,
library-free byte formats — these decoders do actual header parsing and
pixel/sample math (numpy only), unlike the env-gated fake kernels for
container-absent codecs."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from jsonschema_valid_spark.functions.multimodal import (
    _ppm_decode,
    _ppm_encode,
    _wav_decode,
    _wav_encode,
    decode_ppm_stats,
    decode_wav_stats,
    resize_ppm,
    synth_ppm_wav_table,
)


def test_ppm_roundtrip_and_comments():
    a = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    assert np.array_equal(_ppm_decode(_ppm_encode(a)), a)
    # comment-tolerant header
    withc = b"P6\n# made by hand\n3 2\n255\n" + a.tobytes()
    assert np.array_equal(_ppm_decode(withc), a)
    with pytest.raises(ValueError):
        _ppm_decode(b"P5\n1 1\n255\n\x00")


def test_wav_roundtrip_and_chunk_walk():
    s = (1000 * np.sin(np.arange(100))).astype(np.int16)
    rate, got = _wav_decode(_wav_encode(s, 8000))
    assert rate == 8000 and np.array_equal(got, s)
    with pytest.raises(ValueError):
        _wav_decode(b"RIFFxxxxNOPE")


def test_decode_ppm_stats_exact(spark):
    media = synth_ppm_wav_table(spark, 8)
    rows = {r.media_id: r for r in decode_ppm_stats(media).collect()}
    assert set(rows) == {f"img-{i:04d}" for i in (0, 2, 4, 6)}
    r0 = rows["img-0000"]
    assert (r0.width, r0.height) == (8, 8)
    # exact oracle: blue plane is constant 7, red = (x*32 + i) % 256
    assert r0.mean_b == 7.0
    exp_r = np.mean([[(x * 32) % 256 for x in range(8)]] * 8)
    assert r0.mean_r == pytest.approx(exp_r)


def test_decode_wav_stats_exact(spark):
    media = synth_ppm_wav_table(spark, 8)
    rows = {r.media_id: r for r in decode_wav_stats(media).collect()}
    assert set(rows) == {f"wav-{i:04d}" for i in (1, 3, 5, 7)}
    r1 = rows["wav-0001"]
    assert r1.sample_rate == 8000 and r1.n_samples == 400
    assert r1.duration_s == 0.05
    # a full-scale-ish sine's RMS ~ amplitude/sqrt(2)
    assert r1.rms == pytest.approx(8000 / math.sqrt(2), rel=0.02)
    assert 7900 <= r1.peak <= 8000


def test_resize_ppm_roundtrips(spark):
    media = synth_ppm_wav_table(spark, 4)
    small = resize_ppm(media, 4, 4)
    stats = {r.media_id: r for r in decode_ppm_stats(
        small.withColumn("media_type", F.lit("image"))).collect()}
    assert all((r.width, r.height) == (4, 4) for r in stats.values())
    # nearest-neighbor of the constant blue plane stays constant
    assert all(r.mean_b == 7.0 for r in stats.values())
    # downsample of the x-gradient keeps every other column: exact oracle
    exp_r = np.mean([[(x * 32) % 256 for x in (0, 2, 4, 6)]] * 4)
    assert stats["img-0000"].mean_r == pytest.approx(exp_r)

