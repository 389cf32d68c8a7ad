"""Streaming historical uniqueness (streaming/checks.py
stream_index_collisions): stream-static semi join against the
UniqueIndex catalog table — per-row collision alerts at ingest time,
value-set parity with the batch probe, no streaming state."""

import time

import pytest
from pyspark.sql import functions as F

from jsonschema_valid_spark.operators.unique_index import UniqueIndex
from jsonschema_valid_spark.streaming.checks import stream_index_collisions

SCHEMA = "doc_id long, val long"


@pytest.fixture()
def idx(spark, tmp_path):
    u = UniqueIndex("uix_stream_test", "val", buckets=4)
    hist = spark.range(100, 150).select(F.col("id").alias("val"))
    u.build(hist, path=str(tmp_path / "uix"))
    yield u
    spark.sql("DROP TABLE IF EXISTS uix_stream_test")


def _write(spark, path, rows):
    (spark.createDataFrame(rows, SCHEMA)
     .coalesce(1).write.mode("append").parquet(path))


def _run(spark, path, idx, name):
    sdf = (spark.readStream.schema(SCHEMA)
           .option("maxFilesPerTrigger", 1).parquet(path))
    out = stream_index_collisions(sdf, idx, key="doc_id")
    q = (out.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)
    return spark.sql(f"select * from {name}").collect()


def test_collisions_across_batches(spark, tmp_path, idx):
    """Rows colliding with history are flagged per row, in every
    micro-batch; new values and NULLs pass silently."""
    path = str(tmp_path / "in")
    _write(spark, path, [(1, 110), (2, 200), (3, None)])
    time.sleep(1.1)  # distinct mtimes => deterministic batch order
    _write(spark, path, [(4, 110), (5, 149), (6, 201)])

    rows = _run(spark, path, idx, "uix_sink1")
    got = {(r["doc_id"], r["observed"]) for r in rows}
    assert got == {
        ("1", "value=110; exists in index"),
        ("4", "value=110; exists in index"),
        ("5", "value=149; exists in index"),
    }
    r = rows[0]
    assert r["check_id"] == "properties/val/x-unique"
    assert r["expected"] == "unique incl. index"


def test_batch_value_set_parity(spark, tmp_path, idx):
    """The distinct colliding VALUES equal the batch probe's hits on the
    same input (the stream is row-level, the batch value-level — the
    documented semantic pair)."""
    path = str(tmp_path / "in")
    _write(spark, path, [(1, 105), (2, 105), (3, 300), (4, 131)])
    stream_vals = {r["observed"].split("=")[1].split(";")[0]
                   for r in _run(spark, path, idx, "uix_sink2")}
    batch_vals = {str(r["val"])
                  for r in idx.hits(spark.read.parquet(path)).collect()}
    assert stream_vals == batch_vals == {"105", "131"}


def test_validation_rejections(spark, idx):
    sdf = (spark.readStream.format("rate").load()
           .select(F.col("value").alias("doc_id"),
                   F.col("value").alias("val")))
    with pytest.raises(ValueError, match="must be a UniqueIndex"):
        stream_index_collisions(sdf, object(), key="doc_id")
    with pytest.raises(ValueError, match="needs columns"):
        stream_index_collisions(sdf.select("doc_id"), idx, key="doc_id")
    bad = sdf.select("doc_id", F.col("val").cast("string").alias("val"))
    with pytest.raises(ValueError, match="type"):
        stream_index_collisions(bad, idx, key="doc_id")
