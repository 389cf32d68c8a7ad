"""Streaming x-noOverlap (streaming/checks.py stream_overlap_violations):
stateful per-group interval disjointness whose running-max-end survives
micro-batch boundaries — and matches the batch operator on the same
start-ordered input."""

import time

from pyspark.sql import functions as F

from jsonschema_valid_spark.operators.intervals import overlap_violations
from jsonschema_valid_spark.streaming.checks import stream_overlap_violations

_SCHEMA = "doc_id: long, grp: string, s: double, e: double"


def _run(spark, path, name, **kw):
    schema = "doc_id long, grp string, s double, e double, ts timestamp"
    sdf = (spark.readStream.schema(schema)
           .option("maxFilesPerTrigger", 1).parquet(path))
    out = stream_overlap_violations(
        sdf, "s", end_column="e", by="grp", key="doc_id", ts_col="ts", **kw)
    q = (out.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)
    return spark.sql(f"select * from {name}").collect()


def test_cross_batch_running_max_and_batch_parity(spark, tmp_path):
    # batch 1 ends group 'a' with a LONG interval [0,100); batch 2's
    # [30,40) overlaps it — the violation exists only if the running max
    # crosses the batch boundary. [100,110) touches: allowed by default.
    ts = F.to_timestamp(F.lit("2024-01-01 00:00:00"))
    b1 = [(1, "a", 0.0, 100.0), (5, "b", 0.0, 10.0)]
    b2 = [(2, "a", 30.0, 40.0), (3, "a", 100.0, 110.0),
          (6, "b", 10.0, 20.0), (7, "b", 12.0, 15.0)]
    path = str(tmp_path / "in")
    spark.createDataFrame(b1, _SCHEMA).withColumn("ts", ts) \
        .coalesce(1).write.mode("append").parquet(path)
    time.sleep(1.1)  # distinct mtimes => file-source batch order
    spark.createDataFrame(b2, _SCHEMA).withColumn("ts", ts) \
        .coalesce(1).write.mode("append").parquet(path)

    got = {(r["doc_id"], r["observed"])
           for r in _run(spark, path, "ovl_sink")}
    assert got == {("2", "start=30,prev_end=100"),
                   ("7", "start=12,prev_end=20")}

    # parity on membership: the batch operator renders double witnesses
    # as "30.0" (CAST AS STRING) vs the stream's "%g" "30" — same
    # convention as test_stream_monotonic
    batch = overlap_violations(spark.read.parquet(path), "s", "c",
                               key="doc_id", end_column="e", by="grp")
    assert ({r["doc_id"] for r in batch.collect()} == {d for d, _ in got})


def test_null_endpoints_and_strict_touch(spark, tmp_path):
    ts = F.to_timestamp(F.lit("2024-01-01 00:00:00"))
    rows = [(1, "g", 0.0, 10.0), (2, "g", 5.0, None),
            (3, "g", None, 30.0), (4, "g", 10.0, 20.0)]
    path = str(tmp_path / "in2")
    spark.createDataFrame(rows, _SCHEMA).withColumn("ts", ts) \
        .coalesce(1).write.parquet(path)
    # NULL start/end rows never violate and never feed the max; the
    # 10 == 10 touch violates only under allowTouch=False
    assert _run(spark, path, "ovl_sink2") == []
    got = {(r["doc_id"], r["observed"])
           for r in _run(spark, path, "ovl_sink3", allow_touch=False)}
    assert got == {("4", "start=10,prev_end=10")}
