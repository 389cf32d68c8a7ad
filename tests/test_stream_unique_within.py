"""Streaming x-unique withinSeconds (streaming/checks.py
stream_recent_duplicate_violations): time-scoped uniqueness whose
recurrence detection survives micro-batch boundaries — and matches the
batch operator on the same input."""

import time

from pyspark.sql import functions as F

from jsonschema_valid_spark.operators.uniqueness import (
    recent_duplicate_violations,
)
from jsonschema_valid_spark.streaming.checks import (
    stream_recent_duplicate_violations,
)

SCHEMA = "doc_id: long, val: string, grp: string, ts_s: string"


def _write(spark, path, rows):
    (spark.createDataFrame(rows, SCHEMA)
     .withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
     .coalesce(1).write.mode("append").parquet(path))


def _run(spark, path, name, **kw):
    schema = "doc_id long, val string, grp string, ts timestamp"
    sdf = (spark.readStream.schema(schema)
           .option("maxFilesPerTrigger", 1).parquet(path))
    out = stream_recent_duplicate_violations(
        sdf, "val", key="doc_id", ts_col="ts", **kw)
    q = (out.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)
    return spark.sql(f"select * from {name}").collect()


def test_cross_batch_recurrence_and_batch_parity(spark, tmp_path):
    # batch 1 ends with val 'a' at 00:00:00; batch 2 re-posts it at
    # 00:00:30 — the violation exists ONLY if state carries the last
    # occurrence across the boundary. 'b' legitimately recurs 2h later.
    path = str(tmp_path / "in")
    _write(spark, path, [(1, "a", "g", "2024-01-01 00:00:00"),
                         (2, "b", "g", "2024-01-01 00:00:10")])
    time.sleep(1.1)  # distinct mtimes => file-source batch order
    _write(spark, path, [(3, "a", "g", "2024-01-01 00:00:30"),
                         (4, "b", "g", "2024-01-01 02:00:00"),
                         (5, "c", "g", "2024-01-01 02:00:01"),
                         (6, "c", "g", "2024-01-01 02:00:05")])

    got = {(r["doc_id"], r["observed"])
           for r in _run(spark, path, "uw_sink", within_seconds=60)}
    assert got == {("3", "value=a,gap_us=30000000"),
                   ("6", "value=c,gap_us=4000000")}

    # batch parity on the identical input: same rows, same witnesses
    batch_df = spark.read.parquet(path)
    cid = "properties/val/x-unique"
    batch = recent_duplicate_violations(
        batch_df, "val", cid, key="doc_id", ts="ts", within_seconds=60)
    assert {(r["doc_id"], r["observed"]) for r in batch.collect()} == got

    # every emitted row carries the engine violation shape
    one = _run(spark, path, "uw_sink_shape", within_seconds=60)[0]
    assert one["check_id"] == cid
    assert one["expected"].startswith("val must not recur within 60s")


def test_by_scopes_recurrence_to_group(spark, tmp_path):
    # same value 10s apart but in DIFFERENT groups: only the unscoped
    # check flags it
    path = str(tmp_path / "in2")
    _write(spark, path, [(1, "x", "g1", "2024-01-01 00:00:00"),
                         (2, "x", "g2", "2024-01-01 00:00:10")])
    scoped = _run(spark, path, "uw_scoped", within_seconds=60, by="grp")
    assert scoped == []
    unscoped = _run(spark, path, "uw_unscoped", within_seconds=60)
    assert [(r["doc_id"], r["observed"]) for r in unscoped] \
        == [("2", "value=x,gap_us=10000000")]


def test_chain_updates_even_on_violation(spark, tmp_path):
    # three posts 40s apart with W=60: each compares to its IMMEDIATE
    # predecessor (the batch lag semantics), so BOTH later rows violate
    # with gap 40s — not one violation against the first occurrence
    path = str(tmp_path / "in3")
    _write(spark, path, [(1, "a", "g", "2024-01-01 00:00:00")])
    time.sleep(1.1)
    _write(spark, path, [(2, "a", "g", "2024-01-01 00:00:40")])
    time.sleep(1.1)
    _write(spark, path, [(3, "a", "g", "2024-01-01 00:01:20")])
    got = {(r["doc_id"], r["observed"])
           for r in _run(spark, path, "uw_chain", within_seconds=60)}
    assert got == {("2", "value=a,gap_us=40000000"),
                   ("3", "value=a,gap_us=40000000")}
