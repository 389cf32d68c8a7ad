"""Stream-stream window attribution (streaming/joins.py, wave 14):
native watermarked stream-stream join with an event-time range
condition — must equal the batch interval_point_join on full history."""

import datetime as dt
import time

from pyspark.sql import functions as F

from jsonschema_valid_spark.operators.temporal import interval_point_join
from jsonschema_valid_spark.streaming.joins import (
    stream_window_attribution,
)


def _ts(minutes):
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=minutes)


def test_stream_attribution_matches_batch(spark, tmp_path):
    cpath, ppath = str(tmp_path / "clicks"), str(tmp_path / "purch")
    clicks = [
        ("u1", _ts(5), 100),    # inside u1's window [0, 30)
        ("u1", _ts(30), 101),   # == end: excluded (half-open)
        ("u1", _ts(29), 102),   # last minute: inside
        ("u2", _ts(5), 103),    # wrong user for the only window
        ("u1", _ts(65), 104),   # inside the SECOND u1 window [60, 90)
    ]
    purchases = [("u1", _ts(0), 900), ("u1", _ts(60), 901)]
    spark.createDataFrame(clicks, "uid string, ts timestamp, cid long") \
        .coalesce(1).write.mode("append").parquet(cpath)
    # second batch arrives later: the join must still match rows from
    # the FIRST click batch against a purchase seen in batch 2
    spark.createDataFrame(purchases[:1],
                          "uid string, pts timestamp, pid long") \
        .coalesce(1).write.mode("append").parquet(ppath)
    time.sleep(1.1)
    spark.createDataFrame(purchases[1:],
                          "uid string, pts timestamp, pid long") \
        .coalesce(1).write.mode("append").parquet(ppath)

    cs = (spark.readStream.schema("uid string, ts timestamp, cid long")
          .option("maxFilesPerTrigger", 1).parquet(cpath))
    ps = (spark.readStream.schema("uid string, pts timestamp, pid long")
          .option("maxFilesPerTrigger", 1).parquet(ppath))
    j = stream_window_attribution(cs, ps, on="uid", point_ts="ts",
                                  window_ts="pts",
                                  within_seconds=1800.0,
                                  watermark="5 minutes")
    assert j.isStreaming
    q = (j.writeStream.format("memory").queryName("attr_sink")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = {(r.cid, r.w_pid)
           for r in spark.sql("select * from attr_sink").collect()}
    assert got == {(100, 900), (102, 900), (104, 901)}

    # batch parity: the binned interval join over the full histories
    bc = spark.read.parquet(cpath)
    bp = (spark.read.parquet(ppath)
          .withColumn("w_end", F.timestamp_micros(
              F.unix_micros(F.col("pts").cast("timestamp"))
              + 1800 * 1_000_000)))
    batch = interval_point_join(bc, bp, point_col="ts",
                                start_col="pts", end_col="w_end",
                                by="uid", bin_width_seconds=600.0,
                                interval_cols=["pid"], prefix="b_")
    assert {(r.cid, r.b_pid) for r in batch.collect()} == got
