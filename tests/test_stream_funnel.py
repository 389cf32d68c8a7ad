"""Streaming ordered funnel (streaming/checks.py
stream_funnel_conversions): per-(window, key) chain depth from one
native windowed collect + staged array chain."""

import time

import pytest

from pyspark.sql import functions as F

from jsonschema_valid_spark.streaming.checks import stream_funnel_conversions

STEPS = [("view", "et = 'view'"), ("click", "et = 'click'"),
         ("buy", "et = 'buy'")]


def _write(spark, path, rows):
    df = spark.createDataFrame(rows, "u: string, et: string, ts_s: string") \
        .select("u", "et", F.to_timestamp("ts_s").alias("ts"))
    df.coalesce(1).write.mode("append").parquet(path)
    time.sleep(1.1)


def test_cross_batch_chain_and_batch_parity(spark, tmp_path):
    path = str(tmp_path / "fin")
    # user a: full chain ACROSS batches inside window 0; user b: clicks
    # before any view (order violated -> depth 1 via its later view);
    # user c: view+click only; window 1: user a views again (depth 1)
    _write(spark, path, [("a", "view", "2024-01-01 00:05:00"),
                         ("b", "click", "2024-01-01 00:06:00"),
                         ("c", "view", "2024-01-01 00:07:00")])
    _write(spark, path, [("a", "click", "2024-01-01 00:10:00"),
                         ("a", "buy", "2024-01-01 00:15:00"),
                         ("b", "view", "2024-01-01 00:11:00"),
                         ("c", "click", "2024-01-01 00:12:00"),
                         ("a", "view", "2024-01-01 01:30:00")])
    _write(spark, path, [("z", "view", "2024-01-01 06:00:00")])

    sdf = (spark.readStream.schema("u string, et string, ts timestamp")
           .option("maxFilesPerTrigger", 1).parquet(path))
    out = stream_funnel_conversions(sdf, "u", "ts", STEPS,
                                    window_duration="1 hour")
    q = (out.writeStream.format("memory").queryName("fn_sink")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = {(str(r["window_start"]), r["key"]): r
           for r in spark.sql("select * from fn_sink").collect()}
    w0 = "2024-01-01 00:00:00"
    assert got[(w0, "a")]["depth"] == 3
    # cross-batch chain: a's view (batch 1) chains to click/buy (batch 2)
    assert got[(w0, "a")]["step_ts"][0] is not None
    assert got[(w0, "b")]["depth"] == 1   # click-before-view doesn't count
    assert got[(w0, "c")]["depth"] == 2
    assert got[("2024-01-01 01:00:00", "a")]["depth"] == 1

    # batch parity: per-step conversion counts on the window-0 slice
    from jsonschema_valid_spark.operators.funnel import funnel

    batch = (spark.read.parquet(path)
             .where("ts < timestamp'2024-01-01 01:00:00'"))
    bcounts = {r["step_name"]: r["n_converted"]
               for r in funnel(batch, "u", "ts", STEPS).collect()}
    scounts = {name: sum(1 for (w, _), r in got.items()
                         if w == w0 and r["depth"] > i)
               for i, (name, _) in enumerate(STEPS)}
    assert bcounts == scounts == {"view": 3, "click": 2, "buy": 1}


def test_within_seconds_and_validation(spark, tmp_path):
    path = str(tmp_path / "fin2")
    # chain completes but the buy lands 40 min after the view: a
    # 10-minute within window rejects step 3
    _write(spark, path, [("a", "view", "2024-01-01 00:05:00"),
                         ("a", "click", "2024-01-01 00:10:00"),
                         ("a", "buy", "2024-01-01 00:45:00")])
    _write(spark, path, [("z", "view", "2024-01-01 06:00:00")])
    sdf = (spark.readStream.schema("u string, et string, ts timestamp")
           .option("maxFilesPerTrigger", 1).parquet(path))
    out = stream_funnel_conversions(sdf, "u", "ts", STEPS,
                                    window_duration="1 hour",
                                    within_seconds=600)
    q = (out.writeStream.format("memory").queryName("fn_sink2")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = {r["key"]: r["depth"]
           for r in spark.sql("select * from fn_sink2").collect()}
    assert got["a"] == 2

    with pytest.raises(ValueError):
        stream_funnel_conversions(sdf, "u", "ts", [])
