"""Streaming domain-side coverage (streaming/checks.py
stream_coverage_verdicts): per-window "did every domain slice report"
verdicts — the twin of x-referential {"coverageMin"} — cross-batch HLL
merge, member filtering, batch parity within sketch tolerance."""

import time

import pytest
from pyspark.sql import functions as F

from jsonschema_valid_spark.streaming.checks import stream_coverage_verdicts


def _write(spark, path, rows):
    df = spark.createDataFrame(rows, "src: string, ts_s: string") \
        .select("src", F.to_timestamp("ts_s").alias("ts"))
    df.coalesce(1).write.mode("append").parquet(path)
    time.sleep(1.1)


def _dom(spark):
    return spark.createDataFrame(
        [("s1",), ("s2",), ("s3",), ("s4",)], "d_src string")


def _run(spark, path, name, domain, **kw):
    sdf = (spark.readStream.schema("src string, ts timestamp")
           .option("maxFilesPerTrigger", 1).parquet(path))
    out = stream_coverage_verdicts(sdf, "src", "ts", domain,
                                   window_duration="1 hour", **kw)
    q = (out.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)
    return {str(r["window_start"]): (r["n_domain"], r["n_seen"],
                                     round(r["coverage"], 4), r["passed"])
            for r in spark.sql(f"select * from {name}").collect()}


def test_windowed_coverage_across_batches(spark, tmp_path):
    path = str(tmp_path / "in")
    h0, h1 = "2024-01-01 00:30:00", "2024-01-01 01:30:00"
    # window 0: s1+s2 arrive in batch 1, s3+s4 in batch 2 (cross-batch
    # HLL merge -> full coverage); junk/NULL contribute nothing.
    # window 1: only s1 reports -> 1/4, fails.
    _write(spark, path, [("s1", h0), ("s2", h0), ("junk", h0)])
    _write(spark, path, [("s3", h0), ("s4", h0), (None, h0), ("s1", h1)])
    _write(spark, path, [("s1", "2024-01-01 07:00:00")])  # advance watermark
    got = _run(spark, path, "cov1", _dom(spark),
               coverage_min=0.75, domain_column="d_src")
    assert got["2024-01-01 00:00:00"] == (4, 4, 1.0, True)
    assert got["2024-01-01 01:00:00"] == (4, 1, 0.25, False)


def test_literal_domain_and_batch_parity(spark, tmp_path):
    from jsonschema_valid_spark.operators.referential import domain_coverage

    path = str(tmp_path / "in2")
    h0 = "2024-01-01 00:10:00"
    _write(spark, path, [("s1", h0), ("s2", h0), ("bogus", h0)])
    _write(spark, path, [("s1", "2024-01-01 05:00:00")])
    got = _run(spark, path, "cov2", ["s1", "s2", "s3"], coverage_min=0.5)
    n_dom, n_seen, cov, passed = got["2024-01-01 00:00:00"]
    batch = domain_coverage(
        spark.read.parquet(path).where(F.col("ts") < F.lit("2024-01-01 01:00:00")),
        "src", ["s1", "s2", "s3"]).first()
    # HLL at tiny cardinality is exact -> full parity with the batch op
    assert (n_dom, n_seen) == (batch["n_domain"], batch["n_seen"]) == (3, 2)
    assert cov == pytest.approx(batch["coverage"], abs=1e-4)
    assert passed is True


def test_rejections(spark):
    sdf = (spark.readStream.format("rate").load()
           .select(F.col("value").cast("string").alias("src"),
                   F.col("timestamp").alias("ts")))
    dom = _dom(spark)
    with pytest.raises(ValueError, match="streaming DataFrame"):
        stream_coverage_verdicts(dom, "src", "ts", dom, coverage_min=0.5)
    with pytest.raises(ValueError, match="coverage_min"):
        stream_coverage_verdicts(sdf, "src", "ts", dom, coverage_min=0.0)
    with pytest.raises(ValueError, match="empty domain"):
        stream_coverage_verdicts(sdf, "src", "ts", [], coverage_min=0.5)
    with pytest.raises(ValueError, match="STATIC"):
        stream_coverage_verdicts(sdf, "src", "ts", sdf, coverage_min=0.5)
