"""Streaming x-seasonality (streaming/checks.py
stream_seasonality_verdicts): per-(window, group) lag-k autocorrelation
verdicts from a windowed collect + post-aggregation array algebra."""

import time

import pytest
from pyspark.sql import functions as F

from jsonschema_valid_spark.streaming.checks import (
    stream_seasonality_verdicts,
)


def _write_batch(spark, path, rows):
    df = spark.createDataFrame(rows, "g: string, o: int, v: double, "
                                     "ts_s: string") \
        .select("g", "o", "v", F.to_timestamp("ts_s").alias("ts"))
    df.coalesce(1).write.mode("append").parquet(path)
    time.sleep(1.1)


def _run(spark, path, name, **kw):
    sdf = (spark.readStream
           .schema("g string, o int, v double, ts timestamp")
           .option("maxFilesPerTrigger", 1).parquet(path))
    out = stream_seasonality_verdicts(
        sdf, "v", "o", "ts", group_col="g", window_duration="1 hour",
        **kw)
    q = (out.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)
    return spark.sql(f"select * from {name}").collect()


def _rows(g, hour, vals):
    # one row per minute so every order value is unique in its window
    return [(g, i, float(v), f"2024-01-01 {hour:02d}:{i:02d}:00")
            for i, v in enumerate(vals)]


def test_cross_batch_series_and_bounds(spark, tmp_path):
    path = str(tmp_path / "in")
    # 'per': period-3 sawtooth SPLIT ACROSS BATCHES -> acf@3 = 1
    # 'alt': period-2 alternation -> acf@3 = -1 -> trips min 0.5
    # 'flat': constant -> undefined acf -> suppressed pass
    per = _rows("per", 0, [(i % 3) * 10 for i in range(12)])
    alt = _rows("alt", 0, [(i % 2) * 8 for i in range(12)])
    flat = _rows("flat", 0, [5] * 12)
    _write_batch(spark, path, per[:5] + alt[:4] + flat[:6])
    _write_batch(spark, path, per[5:] + alt[4:] + flat[6:])
    _write_batch(spark, path, [("zz", 0, 0.0, "2024-01-01 06:00:00")])

    got = {r["group"]: (r["passed"], round(r["acf"], 4), r["n"])
           for r in _run(spark, path, "ssn_sink", lag=3, min_acf=0.5)}
    assert got["per"] == (True, 1.0, 9)
    assert got["alt"] == (False, -1.0, 9)
    assert got["flat"] == (True, 0.0, 9)  # zero variance -> suppressed


def test_window_scoping_and_min_count(spark, tmp_path):
    path = str(tmp_path / "in2")
    # window 0: full sawtooth; window 1: only 4 rows -> 1 pair at lag 3
    w0 = _rows("per", 0, [(i % 3) * 10 for i in range(9)])
    w1 = _rows("per", 1, [(i % 3) * 10 for i in range(4)])
    _write_batch(spark, path, w0 + w1)
    _write_batch(spark, path, [("zz", 0, 0.0, "2024-01-01 06:00:00")])

    got = {str(r["window_start"]): (r["passed"], r["n"])
           for r in _run(spark, path, "ssn_sink2", lag=3, min_acf=0.5)
           if r["group"] == "per"}
    assert got["2024-01-01 00:00:00"] == (True, 6)
    assert got["2024-01-01 01:00:00"] == (True, 1)  # under min_count


def test_batch_parity_per_window(spark, tmp_path):
    from jsonschema_valid_spark.operators.seasonality import (
        seasonality_group_verdicts,
    )

    path = str(tmp_path / "in3")
    vals = [3, 7, 1, 9, 2, 8, 4, 6, 0, 5, 7, 3]   # aperiodic
    saw = [(i % 4) * 10 for i in range(12)]        # period 4
    rows = _rows("a", 0, vals) + _rows("b", 0, saw)
    _write_batch(spark, path, rows[:10])
    _write_batch(spark, path, rows[10:])
    _write_batch(spark, path, [("zz", 0, 0.0, "2024-01-01 06:00:00")])

    got = {r["group"]: (r["passed"], round(r["acf"], 6), r["n"])
           for r in _run(spark, path, "ssn_sink3", lag=4, min_acf=0.6)}

    bdf = spark.createDataFrame(
        [(g, o, v) for g, o, v, _ in rows], "g: string, o: int, v: double")
    expect = {}
    for r in seasonality_group_verdicts(
            bdf, "v", "c", key="o", order_by="o", lag=4, by="g",
            min_acf=0.6).collect():
        expect[r["partition_id"]] = (r["passed"],
                                     round(r["metric_value"], 6))
    assert set(got) == set(expect)
    for g in expect:
        assert got[g][0] == expect[g][0], g
        assert got[g][1] == pytest.approx(expect[g][1], abs=1e-9), g


def test_max_bound_stuck_sensor(spark, tmp_path):
    path = str(tmp_path / "in4")
    ramp = _rows("ramp", 0, list(range(12)))       # acf@1 ~ 1
    noise = _rows("noise", 0, [3, 7, 1, 9, 2, 8, 4, 6, 0, 5, 7, 3])
    _write_batch(spark, path, ramp + noise)
    _write_batch(spark, path, [("zz", 0, 0.0, "2024-01-01 06:00:00")])

    got = {r["group"]: r["passed"]
           for r in _run(spark, path, "ssn_sink4", lag=1, max_acf=0.5)}
    assert got == {"ramp": False, "noise": True}


def test_rejects_bad_args(spark, tmp_path):
    sdf = (spark.readStream
           .schema("g string, o int, v double, ts timestamp")
           .parquet(str(tmp_path)))
    with pytest.raises(ValueError, match="min and/or max"):
        stream_seasonality_verdicts(sdf, "v", "o", "ts", lag=3)
    with pytest.raises(ValueError, match="lag must be >= 1"):
        stream_seasonality_verdicts(sdf, "v", "o", "ts", lag=0,
                                    min_acf=0.5)
