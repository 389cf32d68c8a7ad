"""Streaming historical near-dup membership (streaming/checks.py
stream_neardup_collisions): inline shingle/sign/band on the stream +
stream-static joins against the NearDupIndex catalog tables —
per-arrival contamination alerts, flagged-doc parity with the batch
probe; only the opt-out pair-distinct is stateful."""

import time

import pytest

from jsonschema_valid_spark.operators.neardup_index import NearDupIndex
from jsonschema_valid_spark.streaming.checks import stream_neardup_collisions

SCHEMA = "doc_id string, text string"


def _text(seed: int, nwords: int = 40) -> str:
    return " ".join(f"tok{seed}x{i}" for i in range(nwords))


@pytest.fixture()
def ndx(spark, tmp_path):
    idx = NearDupIndex("ndx_stream_test", num_perm=64, bands=16, n=3,
                       seed=42, buckets=4)
    hist = spark.createDataFrame(
        [(f"h{i}", _text(i)) for i in range(6)], SCHEMA)
    idx.build(hist, "doc_id", "text",
              bands_path=str(tmp_path / "bands"),
              sigs_path=str(tmp_path / "sigs"))
    yield idx
    spark.sql("DROP TABLE IF EXISTS ndx_stream_test_bands")
    spark.sql("DROP TABLE IF EXISTS ndx_stream_test_sigs")


def _write(spark, path, rows):
    (spark.createDataFrame(rows, SCHEMA)
     .coalesce(1).write.mode("append").parquet(path))


def _run(spark, path, ndx, name, **kw):
    sdf = (spark.readStream.schema(SCHEMA)
           .option("maxFilesPerTrigger", 1).parquet(path))
    out = stream_neardup_collisions(sdf, ndx, "text", key="doc_id",
                                    est_threshold=0.5, **kw)
    q = (out.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(240)
    return spark.sql(f"select * from {name}").collect()


def test_neardup_alerts_across_batches(spark, tmp_path, ndx):
    """An exact copy and a one-word edit of ingested docs alert as they
    arrive (across micro-batches); novel text passes silently. Flagged
    docs match the batch probe on the same rows."""
    path = str(tmp_path / "in")
    near = _text(3).split()
    near[20] = "edited"
    _write(spark, path, [("s0", _text(2)), ("s1", " ".join(near))])
    time.sleep(1.1)
    _write(spark, path, [("s2", _text(99)), ("s3", _text(2))])

    rows = _run(spark, path, ndx, "ndx_sink1")
    flagged = {r["doc_id"] for r in rows}
    assert flagged == {"s0", "s1", "s3"}
    by_doc = {r["doc_id"]: r for r in rows}
    assert by_doc["s0"]["observed"].startswith("neardup of h2, est=1")
    assert by_doc["s0"]["check_id"] == "properties/text/x-nearDup"
    assert "ingested history" in by_doc["s0"]["expected"]
    # dedup_pairs=True: exactly one alert per (doc, hist) pair even
    # though an exact copy shares all 16 bands
    assert len(rows) == len({(r["doc_id"], r["observed"]) for r in rows})
    assert len([r for r in rows if r["doc_id"] == "s0"]) == 1

    # batch parity on the same rows
    batch = spark.read.parquet(path)
    batch_flagged = {r["batch_id"] for r in ndx.probe(
        batch, "doc_id", "text", est_threshold=0.5).collect()}
    assert batch_flagged == flagged


def test_stateless_mode_alerts_per_band(spark, tmp_path, ndx):
    """dedup_pairs=False: fully stateless — an exact copy alerts once
    per shared band (16); dedup is the consumer's business."""
    path = str(tmp_path / "in2")
    _write(spark, path, [("s0", _text(2))])
    rows = _run(spark, path, ndx, "ndx_sink2", dedup_pairs=False)
    assert len([r for r in rows if r["doc_id"] == "s0"]) == 16
