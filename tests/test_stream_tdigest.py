"""Streaming x-quantile tdigest (streaming/checks.py
stream_tdigest_quantile_verdicts): per-window quantile verdicts from a
mergeable digest state — exact in the singleton regime, digest-of-digests
across micro-batches."""

import time

import numpy as np
import pytest

from pyspark.sql import functions as F

from jsonschema_valid_spark.streaming.checks import (
    stream_tdigest_quantile_verdicts,
)


def _write_batch(spark, path, rows):
    df = spark.createDataFrame(rows, "v: double, ts_s: string") \
        .select("v", F.to_timestamp("ts_s").alias("ts"))
    df.coalesce(1).write.mode("append").parquet(path)
    time.sleep(1.1)


def _run(spark, path, name, **kw):
    sdf = (spark.readStream.schema("v double, ts timestamp")
           .option("maxFilesPerTrigger", 1).parquet(path))
    out = stream_tdigest_quantile_verdicts(sdf, "v", "ts",
                                           window_duration="1 hour", **kw)
    qr = (out.writeStream.format("memory").queryName(name)
          .outputMode("append").trigger(availableNow=True).start())
    qr.awaitTermination(180)
    return {(str(r["window_start"])): (r["q"], r["value"], r["passed"])
            for r in spark.sql(f"select * from {name}").collect()}


def test_cross_batch_digest_exact_in_singleton_regime(spark, tmp_path):
    """Window values split across two micro-batches: the merged digest's
    median equals np.quantile over ALL the window's values — a per-batch
    computation would see only half."""
    path = str(tmp_path / "in")
    h = "2024-01-01 00:15:00"
    vals_a = [1.0, 5.0, 9.0, 13.0]
    vals_b = [2.0, 40.0, 80.0, 120.0]
    _write_batch(spark, path, [(v, h) for v in vals_a])
    _write_batch(spark, path, [(v, h) for v in vals_b])
    _write_batch(spark, path, [(0.0, "2024-01-01 05:00:00")])

    got = _run(spark, path, "td_sink1", q=0.5, hi=50.0)
    expect = float(np.quantile(vals_a + vals_b, 0.5, method="linear"))
    assert got["2024-01-01 00:00:00"] == (0.5, expect, True)


def test_batch_parity_and_bound_trip(spark, tmp_path):
    from jsonschema_valid_spark.operators.tdigest import tdigest_quantiles

    path = str(tmp_path / "in2")
    w0 = [(float(i), "2024-01-01 00:30:00") for i in range(40)]
    w1 = [(float(i * 10), "2024-01-01 01:30:00") for i in range(30)]
    _write_batch(spark, path, w0[:25])
    _write_batch(spark, path, w0[25:] + w1[:10])
    _write_batch(spark, path, w1[10:])
    _write_batch(spark, path, [(0.0, "2024-01-01 08:00:00")])

    got = _run(spark, path, "td_sink2", q=0.9, hi=100.0)
    # per-window parity with the batch two-phase operator
    for ws, rows in [("2024-01-01 00:00:00", w0), ("2024-01-01 01:00:00", w1)]:
        bdf = spark.createDataFrame(rows, "v: double, ts_s: string")
        bval = tdigest_quantiles(bdf, "v", [0.9]).first()["value"]
        assert got[ws][1] == pytest.approx(bval, rel=1e-12)
    # w0 p90 = 35.1 passes hi=100; w1 p90 = 261 trips
    assert got["2024-01-01 00:00:00"][2] is True
    assert got["2024-01-01 01:00:00"][2] is False


def test_rejects_bad_args(spark, tmp_path):
    sdf = (spark.readStream.schema("v double, ts timestamp")
           .parquet(str(tmp_path)))
    with pytest.raises(ValueError):
        stream_tdigest_quantile_verdicts(sdf, "v", "ts", q=1.5, hi=1.0)
    with pytest.raises(ValueError):
        stream_tdigest_quantile_verdicts(sdf, "v", "ts", q=0.5)
