"""Streaming x-rowCount (streaming/checks.py stream_rowcount_verdicts):
per-(window, group) cardinality verdicts from a native windowed
aggregation, emitted as the watermark closes each window."""

import time

import pytest

from pyspark.sql import functions as F

from jsonschema_valid_spark.streaming.checks import stream_rowcount_verdicts


def _write_batch(spark, path, rows):
    df = spark.createDataFrame(rows, "g: string, ts_s: string") \
        .select("g", F.to_timestamp("ts_s").alias("ts"))
    df.coalesce(1).write.mode("append").parquet(path)
    time.sleep(1.1)


def test_cross_batch_counts_and_bounds(spark, tmp_path):
    path = str(tmp_path / "in")
    h0 = "2024-01-01 00:20:00"
    h1 = "2024-01-01 01:20:00"
    # window 0: A has 2+2=4 rows ACROSS batches, B has 1; window 1: A has 2
    _write_batch(spark, path, [("A", h0), ("A", h0), ("B", h0)])
    _write_batch(spark, path, [("A", h0), ("A", h0), ("A", h1), ("A", h1)])
    _write_batch(spark, path, [("Z", "2024-01-01 06:00:00")])

    sdf = (spark.readStream.schema("g string, ts timestamp")
           .option("maxFilesPerTrigger", 1).parquet(path))
    out = stream_rowcount_verdicts(sdf, "g", "ts", min_count=2, max_count=3,
                                   window_duration="1 hour")
    q = (out.writeStream.format("memory").queryName("rc_sink")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = {(str(r["window_start"]), r["group"]): (r["n"], r["passed"])
           for r in spark.sql("select * from rc_sink").collect()}
    # cross-batch merge: A's window-0 count is 4 (over max), not 2+2
    assert got[("2024-01-01 00:00:00", "A")] == (4, False)
    assert got[("2024-01-01 00:00:00", "B")] == (1, False)  # under min
    assert got[("2024-01-01 01:00:00", "A")] == (2, True)   # in bounds


def test_batch_parity_per_window(spark, tmp_path):
    from jsonschema_valid_spark.operators.cardinality import (
        row_count_group_verdicts,
    )

    path = str(tmp_path / "in2")
    rows = ([("A", "2024-01-01 00:10:00")] * 3
            + [("B", "2024-01-01 00:40:00")] * 5
            + [("A", "2024-01-01 01:10:00")] * 2)
    _write_batch(spark, path, rows[:4])
    _write_batch(spark, path, rows[4:])
    _write_batch(spark, path, [("Z", "2024-01-01 07:00:00")])

    sdf = (spark.readStream.schema("g string, ts timestamp")
           .option("maxFilesPerTrigger", 1).parquet(path))
    out = stream_rowcount_verdicts(sdf, "g", "ts", min_count=3,
                                   window_duration="1 hour")
    q = (out.writeStream.format("memory").queryName("rc_sink2")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = sorted((str(r["window_start"]), r["group"], r["n"], r["passed"])
                 for r in spark.sql("select * from rc_sink2").collect())

    bdf = spark.createDataFrame(rows, "g: string, ts_s: string") \
        .select("g", F.to_timestamp("ts_s").alias("ts"))
    expect = []
    for ws, lo, hi in [("2024-01-01 00:00:00", "00", "01"),
                       ("2024-01-01 01:00:00", "01", "02")]:
        sl = bdf.where((F.col("ts") >= f"2024-01-01 {lo}:00:00")
                       & (F.col("ts") < f"2024-01-01 {hi}:00:00"))
        for r in row_count_group_verdicts(sl, "g", "c",
                                          min_count=3).collect():
            expect.append((ws, r["partition_id"],
                           int(r["metric_value"]), r["passed"]))
    assert got == sorted(expect)


def test_rejects_no_bounds(spark, tmp_path):
    sdf = (spark.readStream.schema("g string, ts timestamp")
           .parquet(str(tmp_path)))
    with pytest.raises(ValueError):
        stream_rowcount_verdicts(sdf, "g", "ts")
