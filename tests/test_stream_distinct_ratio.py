"""Streaming x-distinctRatio (streaming/checks.py
stream_distinct_ratio_verdicts): per-window distinct/count verdicts from
a native windowed HLL aggregation."""

import time

import pytest

from pyspark.sql import functions as F

from jsonschema_valid_spark.streaming.checks import (
    stream_distinct_ratio_verdicts,
)


def _write_batch(spark, path, rows):
    df = spark.createDataFrame(rows, "g: string, v: long, ts_s: string") \
        .select("g", "v", F.to_timestamp("ts_s").alias("ts"))
    df.coalesce(1).write.mode("append").parquet(path)
    time.sleep(1.1)


def test_cross_batch_ratio_and_bounds(spark, tmp_path):
    path = str(tmp_path / "in")
    h0 = "2024-01-01 00:20:00"
    h1 = "2024-01-01 01:20:00"
    # window 0 group A: values 1,2,3,4 ACROSS batches -> ratio 1.0;
    # window 1 group A: 7,7,7,7 -> ratio 0.25 (the fan-out signature)
    _write_batch(spark, path, [("A", 1, h0), ("A", 2, h0)])
    _write_batch(spark, path,
                 [("A", 3, h0), ("A", 4, h0),
                  ("A", 7, h1), ("A", 7, h1), ("A", 7, h1), ("A", 7, h1)])
    _write_batch(spark, path, [("Z", 1, "2024-01-01 06:00:00")])

    sdf = (spark.readStream.schema("g string, v long, ts timestamp")
           .option("maxFilesPerTrigger", 1).parquet(path))
    out = stream_distinct_ratio_verdicts(
        sdf, "v", "ts", group_col="g", min_ratio=0.5,
        window_duration="1 hour")
    q = (out.writeStream.format("memory").queryName("dr_sink")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = {(str(r["window_start"]), r["group"]):
           (r["ratio"], r["n"], r["passed"])
           for r in spark.sql("select * from dr_sink").collect()}
    r0 = got[("2024-01-01 00:00:00", "A")]
    # cross-batch HLL merge: 4 distinct over 4 rows (exact at this size)
    assert r0 == (pytest.approx(1.0), 4, True)
    r1 = got[("2024-01-01 01:00:00", "A")]
    assert r1 == (pytest.approx(0.25), 4, False)


def test_min_count_suppression_and_rejection(spark, tmp_path):
    path = str(tmp_path / "in2")
    _write_batch(spark, path, [("A", 5, "2024-01-01 00:10:00"),
                               ("A", 5, "2024-01-01 00:11:00")])
    _write_batch(spark, path, [("Z", 1, "2024-01-01 06:00:00")])
    sdf = (spark.readStream.schema("g string, v long, ts timestamp")
           .option("maxFilesPerTrigger", 1).parquet(path))
    out = stream_distinct_ratio_verdicts(
        sdf, "v", "ts", group_col="g", min_ratio=0.9, min_count=3,
        window_duration="1 hour")
    q = (out.writeStream.format("memory").queryName("dr_sink2")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = {r["group"]: r["passed"]
           for r in spark.sql("select * from dr_sink2").collect()}
    # ratio 0.5 < 0.9 but only 2 rows: suppressed
    assert got["A"] is True

    with pytest.raises(ValueError):
        stream_distinct_ratio_verdicts(sdf, "v", "ts")


def test_stream_compliance_windows(spark, tmp_path):
    """Streaming x-compliance: the healthy window passes the 0.9 budget,
    the degraded window (50% positive, NULLs counting as fail) trips —
    cross-batch conditional sums merge."""
    from jsonschema_valid_spark.streaming.checks import (
        stream_compliance_verdicts,
    )

    path = str(tmp_path / "cin")
    h0 = "2024-01-01 00:20:00"
    h1 = "2024-01-01 01:20:00"
    _write_batch(spark, path, [("A", 1, h0), ("A", 2, h0)])
    _write_batch(spark, path,
                 [("A", 3, h0), ("A", 4, h0),
                  ("A", 5, h1), ("A", -1, h1), ("A", 6, h1), ("A", None, h1)])
    _write_batch(spark, path, [("Z", 1, "2024-01-01 06:00:00")])

    sdf = (spark.readStream.schema("g string, v long, ts timestamp")
           .option("maxFilesPerTrigger", 1).parquet(path))
    out = stream_compliance_verdicts(
        sdf, "v > 0", "ts", group_col="g", min_rate=0.9,
        window_duration="1 hour")
    q = (out.writeStream.format("memory").queryName("cp_sink")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = {(str(r["window_start"]), r["group"]):
           (r["rate"], r["pass_n"], r["n"], r["passed"])
           for r in spark.sql("select * from cp_sink").collect()}
    # window 0: 4/4 positive across batches
    assert got[("2024-01-01 00:00:00", "A")] == \
        (pytest.approx(1.0), 4, 4, True)
    # window 1: 2 positive of 4 (NULL counts as fail)
    assert got[("2024-01-01 01:00:00", "A")] == \
        (pytest.approx(0.5), 2, 4, False)

    with pytest.raises(ValueError):
        stream_compliance_verdicts(sdf, "v > 0", "ts")


def test_stream_trend_windows_match_batch(spark, tmp_path):
    """Streaming x-trend: per-window OLS slope from four mergeable sums
    — cross-batch merge is exact, each closed window's slope equals the
    batch operator on the same slice; the runaway window trips."""
    from jsonschema_valid_spark.operators.trend import trend_slopes
    from jsonschema_valid_spark.streaming.checks import (
        stream_trend_verdicts,
    )

    def _write(rows):
        df = spark.createDataFrame(
            rows, "g: string, x: double, y: double, ts_s: string") \
            .select("g", "x", "y", F.to_timestamp("ts_s").alias("ts"))
        df.coalesce(1).write.mode("append").parquet(path)
        time.sleep(1.1)

    path = str(tmp_path / "tin")
    h0 = "2024-01-01 00:20:00"
    h1 = "2024-01-01 01:20:00"
    # window 0: slope 0.5 split ACROSS batches; window 1: slope 3.0
    _write([("A", float(i), 10.0 + 0.5 * i, h0) for i in range(5)])
    _write([("A", float(i), 10.0 + 0.5 * i, h0) for i in range(5, 10)]
           + [("A", float(i), 3.0 * i, h1) for i in range(8)])
    _write([("Z", 1.0, 1.0, "2024-01-01 06:00:00")])

    sdf = (spark.readStream
           .schema("g string, x double, y double, ts timestamp")
           .option("maxFilesPerTrigger", 1).parquet(path))
    out = stream_trend_verdicts(sdf, "y", "x", "ts", group_col="g",
                                min_slope=-1.0, max_slope=1.0,
                                window_duration="1 hour")
    q = (out.writeStream.format("memory").queryName("tr_sink")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = {(str(r["window_start"]), r["group"]):
           (r["slope"], r["n"], r["passed"])
           for r in spark.sql("select * from tr_sink").collect()}
    w0 = got[("2024-01-01 00:00:00", "A")]
    assert w0[0] == pytest.approx(0.5) and w0[1] == 10 and w0[2] is True
    w1 = got[("2024-01-01 01:00:00", "A")]
    assert w1[0] == pytest.approx(3.0) and w1[2] is False

    # parity with the batch operator on the same slices
    batch = spark.read.parquet(path)
    b0 = trend_slopes(
        batch.where("g = 'A' AND ts < timestamp'2024-01-01 01:00:00'"),
        "y", "x").collect()[0]
    assert w0[0] == pytest.approx(b0["slope"])

    with pytest.raises(ValueError):
        stream_trend_verdicts(sdf, "y", "x", "ts")


def test_stream_correlation_windows_match_batch(spark, tmp_path):
    """Streaming x-correlation: per-window Pearson r from five mergeable
    sums — cross-batch merge equals the batch corr; the anti-correlated
    window trips min; zero-variance windows pass."""
    from jsonschema_valid_spark.streaming.checks import (
        stream_correlation_verdicts,
    )

    def _write(rows):
        df = spark.createDataFrame(
            rows, "g: string, x: double, y: double, ts_s: string") \
            .select("g", "x", "y", F.to_timestamp("ts_s").alias("ts"))
        df.coalesce(1).write.mode("append").parquet(path)
        time.sleep(1.1)

    path = str(tmp_path / "cin2")
    h0 = "2024-01-01 00:20:00"
    h1 = "2024-01-01 01:20:00"
    # window 0: perfect track split across batches; window 1: perfect
    # anti-correlation; window 2 (same h1, group B): constant y
    _write([("A", float(i), 2.0 * i + 1, h0) for i in range(5)])
    _write([("A", float(i), 2.0 * i + 1, h0) for i in range(5, 10)]
           + [("A", float(i), -3.0 * i, h1) for i in range(8)]
           + [("B", float(i), 7.0, h1) for i in range(6)])
    _write([("Z", 1.0, 1.0, "2024-01-01 06:00:00")])

    sdf = (spark.readStream
           .schema("g string, x double, y double, ts timestamp")
           .option("maxFilesPerTrigger", 1).parquet(path))
    out = stream_correlation_verdicts(sdf, "y", "x", "ts", group_col="g",
                                      min_corr=0.0,
                                      window_duration="1 hour")
    q = (out.writeStream.format("memory").queryName("cr_sink")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = {(str(r["window_start"]), r["group"]):
           (r["corr"], r["n"], r["passed"])
           for r in spark.sql("select * from cr_sink").collect()}
    w0 = got[("2024-01-01 00:00:00", "A")]
    assert w0[0] == pytest.approx(1.0) and w0[1] == 10 and w0[2] is True
    w1 = got[("2024-01-01 01:00:00", "A")]
    assert w1[0] == pytest.approx(-1.0) and w1[2] is False
    wb = got[("2024-01-01 01:00:00", "B")]
    assert wb[2] is True  # zero variance: undefined r, suppressed

    # batch parity on the window-0 slice
    batch = spark.read.parquet(path).where(
        "g = 'A' AND ts < timestamp'2024-01-01 01:00:00'")
    bc = batch.agg(F.corr("y", "x")).first()[0]
    assert w0[0] == pytest.approx(bc)

    with pytest.raises(ValueError):
        stream_correlation_verdicts(sdf, "y", "x", "ts")
