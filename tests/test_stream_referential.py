"""Streaming x-referential (streaming/checks.py
stream_referential_violations): membership validated at ingest via the
batch operator's stream-static broadcast anti-join — single and
composite key forms, cross-batch, batch parity."""

import time

import pytest
from pyspark.sql import functions as F

from jsonschema_valid_spark.operators.referential import (
    referential_violations,
)
from jsonschema_valid_spark.streaming.checks import (
    stream_referential_violations,
)

SCHEMA = "doc_id long, uid long, typ string"


def _write(spark, path, rows):
    (spark.createDataFrame(rows, SCHEMA)
     .coalesce(1).write.mode("append").parquet(path))


def _run(spark, path, dom, column, name, **kw):
    sdf = (spark.readStream.schema(SCHEMA)
           .option("maxFilesPerTrigger", 1).parquet(path))
    out = stream_referential_violations(sdf, dom, column, key="doc_id",
                                        **kw)
    q = (out.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)
    return spark.sql(f"select * from {name}").collect()


def _dom(spark):
    return spark.createDataFrame(
        [(10, "a"), (10, "b"), (20, "a")], "d_uid long, d_typ string")


def test_single_column_across_batches(spark, tmp_path):
    path = str(tmp_path / "in")
    _write(spark, path, [(1, 10, "a"), (2, 99, "a")])
    time.sleep(1.1)
    _write(spark, path, [(3, 20, "b"), (4, 77, "x"), (5, None, "a")])
    rows = _run(spark, path, _dom(spark), "uid",
                domain_column="d_uid", name="sr1")
    got = {(r["doc_id"], r["observed"]) for r in rows}
    # 20 and 10 are registered uids; 99/77 are not; NULL exempt
    assert got == {("2", "99"), ("4", "77")}
    assert rows[0]["check_id"] == "properties/uid/x-referential"


def test_composite_tuple_and_batch_parity(spark, tmp_path):
    path = str(tmp_path / "in")
    _write(spark, path, [(1, 10, "a"), (2, 10, "c"), (3, 20, "a"),
                         (4, 20, "b")])
    dom = _dom(spark)
    rows = _run(spark, path, dom, ["uid", "typ"],
                domain_column=["d_uid", "d_typ"], name="sr2")
    stream_docs = {r["doc_id"] for r in rows}
    batch = referential_violations(
        spark.read.parquet(path), ["uid", "typ"], dom, "x-referential",
        key="doc_id", domain_column=["d_uid", "d_typ"])
    assert stream_docs == {r["doc_id"]
                           for r in batch.collect()} == {"2", "4"}


def test_rejections(spark, tmp_path):
    sdf = (spark.readStream.format("rate").load()
           .select(F.col("value").alias("doc_id"),
                   F.col("value").alias("uid")))
    dom = _dom(spark)
    with pytest.raises(ValueError, match="streaming DataFrame"):
        stream_referential_violations(dom, dom, "uid")
    with pytest.raises(ValueError, match="STATIC"):
        stream_referential_violations(sdf, sdf, "uid")
