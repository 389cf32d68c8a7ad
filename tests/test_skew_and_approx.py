"""Hot-key skew correctness + HLL uniqueness pre-filter + stateful
streaming null-rate operator."""

import pytest
from pyspark.sql import functions as F

from jsonschema_valid_spark.operators.uniqueness import (
    approx_unique_verdict,
    duplicate_keys,
)


def test_hot_key_skew_correctness(spark):
    """FIXTURES.md F1: one doc_id duplicated 1000× (hot key). The salted
    two-phase aggregate must report exactly the right dup_count — salting
    splits the hot key across reducers in phase 1, so no single reducer
    sees more than ~1000/64 rows of it."""
    base = spark.range(5000).select(
        F.concat(F.lit("doc-"), F.col("id").cast("string")).alias("doc_id"))
    hot = spark.range(1000).select(F.lit("doc-HOT").alias("doc_id"))
    df = base.unionByName(hot)
    dups = duplicate_keys(df, "doc_id").collect()
    assert len(dups) == 1
    assert dups[0]["doc_id"] == "doc-HOT" and dups[0]["dup_count"] == 1000


def test_approx_unique_verdict(spark):
    clean = spark.range(50000).select(F.col("id").cast("string").alias("k"))
    out = approx_unique_verdict(clean, "k").first()
    assert out["definitely_dups"] is False  # inconclusive → exact pass needed

    # 20% duplicates → far outside HLL error → definite verdict, no shuffle
    dirty = clean.unionByName(
        spark.range(10000).select(F.col("id").cast("string").alias("k")))
    out = approx_unique_verdict(dirty, "k").first()
    assert out["definitely_dups"] is True
    assert out["n_rows"] == 60000


def test_approx_unique_plan_has_no_key_shuffle(spark):
    """The HLL pass must shuffle only sketch bytes (partial_approx...merge),
    never the 10^12 keys."""
    df = spark.range(1000).select(F.col("id").cast("string").alias("k"))
    plan = approx_unique_verdict(df, "k")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "partial_approx_count_distinct" in plan


def test_stream_running_null_rate(spark, tmp_path):
    from jsonschema_valid_spark.streaming.checks import stream_running_null_rate

    rows = [("g1", None if i % 2 == 0 else float(i),
             f"2024-01-01 00:00:{i % 60:02d}") for i in range(40)]
    rows += [("g2", float(i), f"2024-01-01 00:00:{i % 60:02d}")
             for i in range(40)]
    df = (spark.createDataFrame(rows, "grp string, v double, ts string")
          .withColumn("ts", F.to_timestamp("ts")))
    path = str(tmp_path / "in")
    df.write.parquet(path)

    sdf = spark.readStream.schema(df.schema).parquet(path)
    out = stream_running_null_rate(sdf, "grp", "v", "ts", threshold=0.25)
    q = (out.writeStream.format("memory").queryName("nullrate_sink")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r["grp"]: r for r in spark.sql("select * from nullrate_sink").collect()}
    assert got["g1"]["alert"] is True and abs(got["g1"]["null_rate"] - 0.5) < 1e-9
    assert got["g2"]["alert"] is False and got["g2"]["nulls"] == 0


def test_skew_report(spark):
    from jsonschema_valid_spark.operators.skew import heavy_keys, skew_summary

    rows = ([("hot", i) for i in range(90)]
            + [(f"k{i}", i) for i in range(10)])
    df = spark.createDataFrame(rows, "k: string, v: long")
    top = [(r["k"], r["cnt"]) for r in heavy_keys(df, "k", top=3).collect()]
    assert top[0] == ("hot", 90)
    assert all(c == 1 for _, c in top[1:])
    prof = skew_summary(df, "k").first()
    assert prof["n_keys"] == 11 and prof["max_cnt"] == 90
    assert prof["skew_factor"] > 9  # 90 / (100/11) ≈ 9.9
