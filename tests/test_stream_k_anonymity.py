"""Streaming x-kAnonymity (streaming/checks.py stream_k_anonymity_alerts):
per-(window, quasi-cell) anonymity verdicts — cross-batch merge, window
as the release unit, batch parity on the window slice."""

import time

import pytest
from pyspark.sql import functions as F

from jsonschema_valid_spark.operators.anonymity import anonymity_violations
from jsonschema_valid_spark.streaming.checks import stream_k_anonymity_alerts

SCHEMA = "id long, zip string, diag string, ts_s string"


def _write(spark, path, rows):
    (spark.createDataFrame(rows, SCHEMA)
     .withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
     .coalesce(1).write.mode("append").parquet(path))


def _run(spark, path, name, **kw):
    schema = "id long, zip string, diag string, ts timestamp"
    sdf = (spark.readStream.schema(schema)
           .option("maxFilesPerTrigger", 1).parquet(path))
    out = stream_k_anonymity_alerts(sdf, ["zip"], "ts", **kw)
    q = (out.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)
    return spark.sql(f"select * from {name}").collect()


def test_window_is_the_release_unit_and_cross_batch_merge(spark, tmp_path):
    """zip z1 has 3 rows in window :00 (2 arriving in batch 1 + 1 in
    batch 2 — the count is right only if the windowed state merges) and
    a SINGLETON row in window :01 — k-anonymous overall, not per
    release window."""
    path = str(tmp_path / "in")
    _write(spark, path, [(1, "z1", "a", "2024-01-01 00:00:01"),
                         (2, "z1", "b", "2024-01-01 00:00:02")])
    time.sleep(1.1)
    _write(spark, path, [(3, "z1", "c", "2024-01-01 00:00:03"),
                         (4, "z1", "d", "2024-01-01 00:01:30")])
    time.sleep(1.1)
    # a later row pushes the watermark past the :01 window so it closes
    # (its own :09 window stays open and is excluded below)
    _write(spark, path, [(99, "flush", "f", "2024-01-01 00:09:00")])

    rows = _run(spark, path, "ka_sink1", k=2)
    got = {(str(r["window_start"]), r["cell"], r["n"], r["passed"])
           for r in rows if r["cell"] != "flush"}
    assert got == {
        ("2024-01-01 00:00:00", "z1", 3, True),
        ("2024-01-01 00:01:00", "z1", 1, False),
    }


def test_l_diversity_window_and_null_cell(spark, tmp_path):
    """A homogeneous window fails l even when k passes; NULL quasi
    renders as its own cell like the batch operator."""
    path = str(tmp_path / "in")
    _write(spark, path, [(1, "z2", "same", "2024-01-01 00:00:01"),
                         (2, "z2", "same", "2024-01-01 00:00:02"),
                         (3, None, "x", "2024-01-01 00:00:03"),
                         (4, None, "y", "2024-01-01 00:00:04")])
    time.sleep(1.1)
    _write(spark, path, [(99, "flush", "f", "2024-01-01 00:09:00")])
    rows = _run(spark, path, "ka_sink2", k=2, l=2, sensitive="diag")
    got = {(r["cell"], r["n"], r["d"], r["passed"]) for r in rows
           if r["cell"] != "flush"}
    assert got == {("z2", 2, 1, False), ("NULL", 2, 2, True)}


def test_batch_parity_on_window_slice(spark, tmp_path):
    """Failing stream cells == the batch operator's violations over the
    same window slice (small exact-regime HLL)."""
    path = str(tmp_path / "in")
    rows = [(i, f"z{i % 3}", f"s{i % 2}", "2024-01-01 00:00:05")
            for i in range(7)]
    _write(spark, path, rows)
    time.sleep(1.1)
    _write(spark, path, [(99, "flush", "f", "2024-01-01 00:09:00")])
    failed = {r["cell"] for r in _run(spark, path, "ka_sink3", k=3)
              if not r["passed"] and r["cell"] != "flush"}
    batch = anonymity_violations(
        spark.read.parquet(path).where("zip <> 'flush'"), ["zip"],
        "c", k=3)
    assert failed == {r["doc_id"] for r in batch.collect()} == {"z1", "z2"}


def test_rejections(spark):
    sdf = (spark.readStream.format("rate").load()
           .select(F.col("value").alias("zip"),
                   F.col("value").alias("diag"),
                   F.col("timestamp").alias("ts")))
    with pytest.raises(ValueError, match="k and/or l"):
        stream_k_anonymity_alerts(sdf, ["zip"], "ts")
    with pytest.raises(ValueError, match="sensitive"):
        stream_k_anonymity_alerts(sdf, ["zip"], "ts", l=2)
    with pytest.raises(ValueError, match="quasi"):
        stream_k_anonymity_alerts(sdf, [], "ts", k=2)


def test_cells_group_raw_not_rendered(spark, tmp_path):
    """Distinct cells whose RENDERED labels collide ('a/b','c') vs
    ('a','b/c') must stay separate groups — grouping by the label would
    merge them and ship the singleton the floor exists to stop."""
    from jsonschema_valid_spark.streaming.checks import (
        stream_k_anonymity_alerts,
    )
    rows = ([(1, "a/b", "c", "s", "2024-01-01 00:00:01")]
            + [(10 + i, "a", "b/c", "s", "2024-01-01 00:00:02")
               for i in range(3)]
            + [(99, "flush", "f", "s", "2024-01-01 00:09:00")])
    path = str(tmp_path / "in")
    (spark.createDataFrame(
        rows, "id long, q1 string, q2 string, diag string, ts_s string")
     .withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
     .coalesce(1).write.mode("append").parquet(path))
    sdf = (spark.readStream
           .schema("id long, q1 string, q2 string, diag string, "
                   "ts timestamp")
           .option("maxFilesPerTrigger", 1).parquet(path))
    out = stream_k_anonymity_alerts(sdf, ["q1", "q2"], "ts", k=2)
    q = (out.writeStream.format("memory").queryName("ka_raw")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = {(r["cell"], r["n"], r["passed"])
           for r in spark.sql("select * from ka_raw").collect()
           if not r["cell"].startswith("flush")}
    assert got == {("a/b/c", 1, False), ("a/b/c", 3, True)}
