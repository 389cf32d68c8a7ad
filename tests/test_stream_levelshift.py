"""Streaming x-levelShift (streaming/checks.py
stream_level_shift_alerts): cross-batch rolling-mean shift alerts from
bounded per-group buffer state."""

import time

import pytest

from pyspark.sql import functions as F

from jsonschema_valid_spark.streaming.checks import stream_level_shift_alerts

W = 4          # rolling window
THR = 5.0


def _series():
    # group A: flat at 10 for 12 points, step to 30 (shift 20), back
    # to flat; group B: gentle ramp (max shift under threshold)
    rows = []
    for i in range(12):
        rows.append(("A", float(i), 10.0))
    for i in range(12, 24):
        rows.append(("A", float(i), 30.0))
    for i in range(24):
        rows.append(("B", float(i), float(i) * 0.5))
    return rows


def _expected_batch_positions(spark, rows):
    from jsonschema_valid_spark.operators.changepoint import level_shifts

    df = spark.createDataFrame(rows, "g: string, x: double, v: double")
    s = level_shifts(df, "v", "x", key="x", by="g", window=W)
    return {(r["g"], r["x"]) for r in s.collect()
            if r["__shift"] is not None and r["__shift"] > THR}


def test_alert_positions_match_batch_series(spark, tmp_path):
    rows = _series()
    want = _expected_batch_positions(spark, rows)
    assert want, "fixture must produce shifts"
    # the step is at x=12; split batches at x=14 so the 2W window
    # STRADDLES the batch boundary — a stateless recompute would miss it
    path = str(tmp_path / "ls_in")

    def _write(batch):
        df = spark.createDataFrame(
            batch, "g: string, x: double, v: double") \
            .select("g", "x", "v",
                    F.timestamp_seconds(F.col("x") * 60).alias("ts"))
        df.coalesce(1).write.mode("append").parquet(path)
        time.sleep(1.1)

    _write([r for r in rows if r[1] < 14])
    _write([r for r in rows if r[1] >= 14])

    sdf = (spark.readStream
           .schema("g string, x double, v double, ts timestamp")
           .option("maxFilesPerTrigger", 1).parquet(path))
    out = stream_level_shift_alerts(
        sdf, "v", order_by="x", by="g", key="x", ts_col="ts",
        window=W, max_shift=THR)
    q = (out.writeStream.format("memory").queryName("ls_sink")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = set()
    for r in spark.sql("select * from ls_sink").collect():
        at = float(r["observed"].split(",at=")[1])
        got.add((r["doc_id"], at))
        assert r["check_id"] == "properties/v/x-levelShift"
    assert got == want
    # the straddling positions specifically exist (x in [14, 15]: prior
    # window reaches back into batch 1)
    assert any(14.0 <= at <= 15.0 for _, at in got)

    with pytest.raises(ValueError):
        stream_level_shift_alerts(sdf, "v", order_by="x", by="g",
                                  key="x", ts_col="ts", window=1)
