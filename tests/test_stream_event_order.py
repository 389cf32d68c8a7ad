"""Streaming x-eventOrder (streaming/checks.py
stream_event_order_violations): stateful first-A-before-first-B
causality whose knowledge survives micro-batch boundaries."""

import datetime as dt
import time

from pyspark.sql import functions as F

from jsonschema_valid_spark.operators.temporal import (
    event_order_violations,
)
from jsonschema_valid_spark.streaming.checks import (
    stream_event_order_violations,
)


def _ts(minutes):
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=minutes)


def _run(spark, path, name, **kw):
    sdf = (spark.readStream.schema("uid string, et string, ts timestamp")
           .option("maxFilesPerTrigger", 1).parquet(path))
    out = stream_event_order_violations(
        sdf, column="ts", by="uid", first="et = 'signup'",
        then="et = 'purchase'", **kw)
    q = (out.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)
    return spark.sql(f"select * from {name}").collect()


def _write(spark, path, rows):
    spark.createDataFrame(rows, "uid string, et string, ts timestamp") \
        .coalesce(1).write.mode("append").parquet(path)


def test_cross_batch_and_retroactive(spark, tmp_path):
    path = str(tmp_path / "in")
    # u1: purchase in batch 1 with no signup -> immediate (requireFirst)
    # u2: signup(10) in batch 1, purchase(5) arrives in batch 2 —
    #     violation exists ONLY if first_min survived the boundary
    # u3: clean order across batches
    _write(spark, path, [("u1", "purchase", _ts(0)),
                         ("u2", "signup", _ts(10)),
                         ("u3", "signup", _ts(0))])
    time.sleep(1.1)
    _write(spark, path, [("u2", "purchase", _ts(5)),
                         ("u3", "purchase", _ts(1))])
    rows = _run(spark, path, "eo_sink")
    got = {r.doc_id: r.observed for r in rows}
    assert set(got) == {"u1", "u2"}
    assert got["u1"] == "first=none,then=1704067200000000"
    assert got["u2"].startswith("first=")

    # batch parity on the union of all batches (ordered feed)
    batch = event_order_violations(
        spark.read.parquet(path), "ts", "c", by="uid",
        first="et = 'signup'", then="et = 'purchase'")
    assert {r.doc_id for r in batch.collect()} == set(got)


def test_retroactive_without_require_first(spark, tmp_path):
    path = str(tmp_path / "in")
    # purchase first, no signup yet: with requireFirst=False the group
    # WAITS...
    _write(spark, path, [("u", "purchase", _ts(5))])
    time.sleep(1.1)
    # ...until a later signup proves then_min < first_min retroactively
    _write(spark, path, [("u", "signup", _ts(10))])
    rows = _run(spark, path, "eo_lax_sink", require_first=False)
    assert [r.doc_id for r in rows] == ["u"]
    assert rows[0].observed == (
        "first=1704067800000000,then=1704067500000000")


def test_at_most_one_violation_per_group(spark, tmp_path):
    path = str(tmp_path / "in")
    _write(spark, path, [("u", "purchase", _ts(0)),
                         ("u", "purchase", _ts(1))])
    time.sleep(1.1)
    _write(spark, path, [("u", "purchase", _ts(2))])
    rows = _run(spark, path, "eo_once_sink")
    assert len(rows) == 1
