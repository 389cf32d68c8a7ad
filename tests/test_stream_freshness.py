"""Streaming x-freshness (streaming/checks.py stream_freshness_alerts):
event-time-timer staleness — a group whose rows STOP arriving alerts when
the watermark (advanced by other groups) passes last_seen + max_age.
Timers are event-time only, so replaying the same batches is deterministic
(the engine's wall-clock-free promise, kept in streaming)."""

import time

from pyspark.sql import functions as F

from jsonschema_valid_spark.streaming.checks import stream_freshness_alerts


def _write_batch(spark, path, rows):
    df = spark.createDataFrame(rows, "grp: string, ts_s: string") \
        .select("grp", F.to_timestamp("ts_s").alias("ts"))
    df.coalesce(1).write.mode("append").parquet(path)
    time.sleep(1.1)  # distinct mtimes => file-source batch order


def test_stalled_group_alerts_active_group_does_not(spark, tmp_path):
    path = str(tmp_path / "in")
    # batch 1: A and B alive; batches 2-3: only B — A stalls
    _write_batch(spark, path, [("A", "2024-01-01 00:00:00"),
                               ("B", "2024-01-01 00:00:00")])
    _write_batch(spark, path, [("B", "2024-01-01 01:00:00")])
    _write_batch(spark, path, [("B", "2024-01-01 02:00:00")])

    schema = "grp string, ts timestamp"
    sdf = (spark.readStream.schema(schema)
           .option("maxFilesPerTrigger", 1).parquet(path))
    out = stream_freshness_alerts(sdf, "grp", "ts", max_age="30 minutes")
    q = (out.writeStream.format("memory").queryName("fresh_sink")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = spark.sql("select * from fresh_sink").collect()
    # A alerted exactly once (timer 00:30 < watermark 01:00 at batch 3);
    # B kept re-arming and never fired
    assert [(r["grp"], str(r["last_seen"]), r["status"]) for r in got] \
        == [("A", "2024-01-01 00:00:00", "stale")]


def test_replay_is_deterministic(spark, tmp_path):
    path = str(tmp_path / "in2")
    _write_batch(spark, path, [("A", "2024-01-01 00:00:00"),
                               ("B", "2024-01-01 00:00:00")])
    _write_batch(spark, path, [("B", "2024-01-01 01:00:00")])
    _write_batch(spark, path, [("B", "2024-01-01 02:00:00")])
    schema = "grp string, ts timestamp"

    def run(name):
        sdf = (spark.readStream.schema(schema)
               .option("maxFilesPerTrigger", 1).parquet(path))
        out = stream_freshness_alerts(sdf, "grp", "ts",
                                      max_age="30 minutes")
        q = (out.writeStream.format("memory").queryName(name)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(180)
        return sorted((r["grp"], str(r["last_seen"]), r["status"])
                      for r in spark.sql(f"select * from {name}").collect())

    assert run("fresh_r1") == run("fresh_r2") \
        == [("A", "2024-01-01 00:00:00", "stale")]
