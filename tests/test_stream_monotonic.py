"""Streaming x-monotonic (streaming/checks.py stream_monotonic_violations):
stateful per-group monotonicity whose chain survives micro-batch boundaries
— and matches the batch operator on the same ordered input."""

import time

from pyspark.sql import functions as F

from jsonschema_valid_spark.operators.ordering import monotonic_violations
from jsonschema_valid_spark.streaming.checks import stream_monotonic_violations


def _run(spark, path, name, **kw):
    schema = "doc_id long, grp string, seq long, v double, ts timestamp"
    sdf = (spark.readStream.schema(schema)
           .option("maxFilesPerTrigger", 1).parquet(path))
    out = stream_monotonic_violations(
        sdf, "v", order_by="seq", by="grp", key="doc_id", ts_col="ts", **kw)
    q = (out.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)
    return spark.sql(f"select * from {name}").collect()


def test_cross_batch_chain_and_batch_parity(spark, tmp_path):
    # batch 1 ends group 'a' at 20; batch 2 opens with 15 — the violation
    # exists ONLY if state carries the chain across the batch boundary.
    ts = F.to_timestamp(F.lit("2024-01-01 00:00:00"))
    b1 = [(1, "a", 1, 10.0), (2, "a", 2, 20.0), (5, "b", 1, 7.0)]
    b2 = [(3, "a", 3, 15.0), (4, "a", 4, 25.0), (6, "b", 2, 3.0)]
    schema = "doc_id: long, grp: string, seq: long, v: double"
    path = str(tmp_path / "in")
    spark.createDataFrame(b1, schema).withColumn("ts", ts) \
        .coalesce(1).write.mode("append").parquet(path)
    time.sleep(1.1)  # distinct mtimes => file-source batch order
    spark.createDataFrame(b2, schema).withColumn("ts", ts) \
        .coalesce(1).write.mode("append").parquet(path)

    got = {(r["doc_id"], r["observed"])
           for r in _run(spark, path, "mono_sink")}
    assert got == {("3", "prev=20,cur=15"), ("6", "prev=7,cur=3")}

    batch_df = spark.read.parquet(path)
    batch = monotonic_violations(batch_df, "v", "c", key="doc_id",
                                 order_by="seq", by="grp")
    assert ({r["doc_id"] for r in batch.collect()}
            == {d for d, _ in got})


def test_null_breaks_chain_and_strict_direction(spark, tmp_path):
    ts = F.to_timestamp(F.lit("2024-01-01 00:00:00"))
    rows = [(1, "g", 1, 5.0), (2, "g", 2, None), (3, "g", 3, 1.0),
            (4, "g", 4, 1.0)]
    schema = "doc_id: long, grp: string, seq: long, v: double"
    path = str(tmp_path / "in2")
    spark.createDataFrame(rows, schema).withColumn("ts", ts) \
        .coalesce(1).write.parquet(path)
    got = {(r["doc_id"], r["observed"])
           for r in _run(spark, path, "mono_sink2",
                         direction="increasing")}
    # NULL pairs (1,2) and (2,3) never violate; the 1==1 tie breaks
    # strict `increasing`
    assert got == {("4", "prev=1,cur=1")}
