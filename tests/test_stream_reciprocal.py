"""Streaming x-reciprocal (streaming/checks.py
stream_reciprocity_violations): per-window unreciprocated-pair alerts
from one native windowed aggregation + a post-agg filter — the
settlement-window form of the symmetry contract."""

import time

from pyspark.sql import functions as F

from jsonschema_valid_spark.streaming.checks import (
    stream_reciprocity_violations,
)


def _write_batch(spark, path, rows):
    df = spark.createDataFrame(rows, "a: int, b: int, ts_s: string") \
        .select("a", "b", F.to_timestamp("ts_s").alias("ts"))
    df.coalesce(1).write.mode("append").parquet(path)
    time.sleep(1.1)


def _run(spark, path, name, **kw):
    sdf = (spark.readStream.schema("a int, b int, ts timestamp")
           .option("maxFilesPerTrigger", 1).parquet(path))
    out = stream_reciprocity_violations(
        sdf, "a", "b", "ts", window_duration="1 hour", **kw)
    q = (out.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)
    return spark.sql(f"select * from {name}").collect()


def test_cross_batch_mirror_and_window_scope(spark, tmp_path):
    path = str(tmp_path / "in")
    h0 = "2024-01-01 00:20:00"
    h0b = "2024-01-01 00:40:00"
    h1 = "2024-01-01 01:20:00"
    # window 0: (1,2) mirrored ACROSS batches -> reciprocated, silent;
    #           (6,7) one-way -> violation; (5,5) self-pair -> silent
    # window 1: (2,1) alone — its mirror lives in window 0, NOT here ->
    #           violation (the settlement-window contract)
    _write_batch(spark, path, [(1, 2, h0), (6, 7, h0), (5, 5, h0)])
    _write_batch(spark, path, [(2, 1, h0b), (2, 1, h1)])
    _write_batch(spark, path, [(99, 98, "2024-01-01 06:00:00")])

    got = {r["pair"]: (r["fwd"], r["rev"], str(r["window_start"]))
           for r in _run(spark, path, "rcp_sink")}
    assert got == {"6|7": (1, 0, "2024-01-01 00:00:00"),
                   "1|2": (0, 1, "2024-01-01 01:00:00")}


def test_match_counts_and_batch_parity(spark, tmp_path):
    from jsonschema_valid_spark.operators.reciprocity import (
        reciprocity_violations,
    )

    path = str(tmp_path / "in2")
    rows = [(1, 2, "2024-01-01 00:10:00"), (1, 2, "2024-01-01 00:15:00"),
            (2, 1, "2024-01-01 00:30:00"), (8, 9, "2024-01-01 00:40:00"),
            (3, 4, "2024-01-01 01:10:00"), (4, 3, "2024-01-01 01:20:00")]
    _write_batch(spark, path, rows[:3])
    _write_batch(spark, path, rows[3:])
    _write_batch(spark, path, [(99, 98, "2024-01-01 07:00:00")])

    got = sorted((str(r["window_start"]), r["pair"], r["fwd"], r["rev"])
                 for r in _run(spark, path, "rcp_sink2", match_counts=True))
    # (1,2): fwd=2 rev=1 — present both ways but unequal -> matchCounts
    # trips (cross-batch merge: counts pooled over the window);
    # (3,4) in window 1 balances -> silent
    assert got == [("2024-01-01 00:00:00", "1|2", 2, 1),
                   ("2024-01-01 00:00:00", "8|9", 1, 0)]

    # parity: each window slice == the batch operator on that slice
    bdf = spark.createDataFrame(rows, "a: int, b: int, ts_s: string") \
        .select("a", "b", F.to_timestamp("ts_s").alias("ts"))
    expect = []
    for ws, lo, hi in [("2024-01-01 00:00:00", "00", "01"),
                       ("2024-01-01 01:00:00", "01", "02")]:
        sl = bdf.where((F.col("ts") >= f"2024-01-01 {lo}:00:00")
                       & (F.col("ts") < f"2024-01-01 {hi}:00:00"))
        for r in reciprocity_violations(sl, "a", "c", with_col="b",
                                        match_counts=True).collect():
            f, rv = r["observed"].replace("fwd=", "").split(",rev=")
            expect.append((ws, r["doc_id"], int(f), int(rv)))
    assert got == sorted(expect)


def test_grouped_pairs_stay_per_group(spark, tmp_path):
    path = str(tmp_path / "in3")
    df = spark.createDataFrame(
        [("g0", 1, 2, "2024-01-01 00:10:00"),
         ("g1", 2, 1, "2024-01-01 00:20:00"),
         (None, 3, 4, "2024-01-01 00:25:00")],
        "g: string, a: int, b: int, ts_s: string") \
        .select("g", "a", "b", F.to_timestamp("ts_s").alias("ts"))
    df.coalesce(1).write.mode("append").parquet(path)
    time.sleep(1.1)
    df2 = spark.createDataFrame(
        [("zz", 99, 98, "2024-01-01 06:00:00")],
        "g: string, a: int, b: int, ts_s: string") \
        .select("g", "a", "b", F.to_timestamp("ts_s").alias("ts"))
    df2.coalesce(1).write.mode("append").parquet(path)

    sdf = (spark.readStream.schema("g string, a int, b int, ts timestamp")
           .option("maxFilesPerTrigger", 1).parquet(path))
    out = stream_reciprocity_violations(
        sdf, "a", "b", "ts", by="g", window_duration="1 hour")
    q = (out.writeStream.format("memory").queryName("rcp_sink3")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = {r["pair"] for r in spark.sql("select * from rcp_sink3").collect()}
    # same hour, but (1,2)/(2,1) live in DIFFERENT groups -> both one-way;
    # NULL group renders <null> like the batch operator
    assert got == {"g0|1|2", "g1|1|2", "<null>|3|4"}
