"""Streaming sessionization (streaming/checks.py stream_session_stats):
native session_window roll-ups that merge across micro-batch boundaries
and match the batch operator (gap − 1 µs identity) on closed sessions."""

import datetime as dt
import time

from pyspark.sql import functions as F

from jsonschema_valid_spark.operators.temporal import session_stats
from jsonschema_valid_spark.streaming.checks import stream_session_stats


def _ts(minutes):
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=minutes)


def _run(spark, path, name, gap_seconds):
    sdf = (spark.readStream.schema("uid string, ts timestamp, eid long")
           .option("maxFilesPerTrigger", 1).parquet(path))
    out = stream_session_stats(sdf, key="uid", ts_col="ts",
                               gap_seconds=gap_seconds,
                               watermark="10 minutes")
    q = (out.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)
    return spark.sql(f"select * from {name}").collect()


def test_cross_batch_merge_and_batch_parity(spark, tmp_path):
    gap = 600.0  # 10 min
    # uid=a: min 0 alone (12 min > gap breaks), then min 12 in batch 1
    # and min 20 in batch 2 (8 min <= gap) — merged ONLY if the engine
    # carries the open session across the micro-batch boundary.
    # uid=b: an exact-boundary gap (10 min sharp) must MERGE — native
    # session_window extends at gap == gapDuration, the same
    # strictly-greater break as the batch operator.
    b1 = [("a", _ts(0), 1), ("a", _ts(12), 2), ("b", _ts(0), 3)]
    b2 = [("a", _ts(20), 4), ("b", _ts(10), 5),
          # flush row: pushes the watermark far past every session
          ("zz", _ts(600), 99)]
    path = str(tmp_path / "in")
    spark.createDataFrame(b1, "uid string, ts timestamp, eid long") \
        .coalesce(1).write.mode("append").parquet(path)
    time.sleep(1.1)
    spark.createDataFrame(b2, "uid string, ts timestamp, eid long") \
        .coalesce(1).write.mode("append").parquet(path)

    rows = _run(spark, path, "sess_sink", gap)
    got = {(r.uid, r.start_micros, r.n_events, r.duration_micros)
           for r in rows if r.uid != "zz"}

    def us(minutes):
        return int(_ts(minutes).replace(
            tzinfo=dt.timezone.utc).timestamp() * 1_000_000)

    assert got == {
        ("a", us(0), 1, 0),
        ("a", us(12), 2, 8 * 60_000_000),    # merged across batches
        ("b", us(0), 2, 10 * 60_000_000),    # merged at the exact gap
    }

    # batch parity: streaming(gap) == batch(gap), session for session.
    batch = session_stats(spark.read.parquet(path), key="uid", ts="ts",
                          gap_seconds=gap, order_tiebreak="eid")
    bset = {(r.uid, r.start_micros, r.n_events, r.duration_micros)
            for r in batch.collect() if r.uid != "zz"}
    assert bset == got


def test_open_session_held_back_by_watermark(spark, tmp_path):
    # Without a watermark-advancing flush row, the sole session stays
    # OPEN and append mode emits nothing — the state actually waits.
    b1 = [("a", _ts(0), 1), ("a", _ts(2), 2)]
    path = str(tmp_path / "in")
    spark.createDataFrame(b1, "uid string, ts timestamp, eid long") \
        .coalesce(1).write.mode("append").parquet(path)
    rows = _run(spark, path, "sess_open_sink", 600.0)
    assert rows == []
