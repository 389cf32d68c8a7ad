"""Streaming validation tests: file source → availableNow trigger → memory
sink, asserting the violations stream and windowed verdicts."""

import pytest
from pyspark.sql import functions as F

from jsonschema_valid_spark import CheckSuite

SUITE = {
    "version": 7,
    "properties": {
        "v": {"minimum": 0},
        "s": {"x-nullRate": {"max": 0.5}},
    },
}


@pytest.fixture()
def stream_dir(spark, tmp_path):
    rows = [
        (f"d{i}", f"2024-01-01 00:{i // 10:02d}:{(i * 7) % 60:02d}",
         -1 if i % 10 == 0 else i, None if i % 4 == 0 else "src")
        for i in range(100)
    ]
    df = spark.createDataFrame(rows, "doc_id string, ts string, v long, s string") \
        .withColumn("ts", F.to_timestamp("ts"))
    path = str(tmp_path / "in")
    df.coalesce(2).write.parquet(path)
    return path, df


def _run_to_memory(sdf, name):
    q = (sdf.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    return q


def test_stream_row_violations(spark, stream_dir):
    from jsonschema_valid_spark.streaming.checks import stream_row_violations

    path, batch_df = stream_dir
    sdf = spark.readStream.schema(batch_df.schema).parquet(path)
    viol = stream_row_violations(CheckSuite(SUITE), sdf, key="doc_id")
    assert viol.isStreaming
    _run_to_memory(viol, "viol_sink")
    got = spark.sql("select * from viol_sink").collect()
    exp = batch_df.where("v < 0").count()
    assert len(got) == exp > 0
    assert all(r["check_id"] == "properties/v/minimum" for r in got)


def test_stream_windowed_verdicts(spark, stream_dir):
    from jsonschema_valid_spark.streaming.checks import stream_windowed_verdicts

    path, batch_df = stream_dir
    sdf = spark.readStream.schema(batch_df.schema).parquet(path)
    verd = stream_windowed_verdicts(CheckSuite(SUITE), sdf, "ts",
                                    window_duration="1 minute",
                                    watermark="0 seconds")
    _run_to_memory(verd, "verd_sink")
    got = spark.sql("select * from verd_sink").collect()
    assert got
    names = {r["check_id"] for r in got}
    assert "properties/v/minimum" in names
    assert "properties/s/x-nullRate" in names
    # each 1-minute window with an injected negative must fail the minimum
    fails = [r for r in got if r["check_id"] == "properties/v/minimum"
             and not r["passed"]]
    assert fails


def test_stream_dedup(spark, tmp_path):
    from jsonschema_valid_spark.streaming.checks import stream_dedup

    rows = [("a", "2024-01-01 00:00:01"), ("a", "2024-01-01 00:00:02"),
            ("b", "2024-01-01 00:00:03")]
    df = spark.createDataFrame(rows, "k string, ts string") \
        .withColumn("ts", F.to_timestamp("ts"))
    path = str(tmp_path / "dd")
    df.write.parquet(path)
    sdf = spark.readStream.schema(df.schema).parquet(path)
    out = stream_dedup(sdf, "k", "ts", watermark="1 hour")
    _run_to_memory(out, "dedup_sink")
    got = spark.sql("select k from dedup_sink").collect()
    assert sorted(r["k"] for r in got) == ["a", "b"]


def test_stream_windowed_drift_matches_batch(spark, stream_dir):
    """Per-window streaming drift (chained stateful aggs + HOF math) must
    equal the batch operators for ALL SIX statistics — PSI, binned-ECDF
    KS, Pearson chi-square (VERDICT r3 item 5), EMD, KL, and JSD —
    computed over the same window slices, each against its own
    threshold."""
    from jsonschema_valid_spark.operators.drift import (
        chi2_value_df,
        emd_value_df,
        histogram,
        jsd_value_df,
        kl_value_df,
        ks,
        psi,
    )
    from jsonschema_valid_spark.streaming.checks import stream_windowed_drift

    path, batch_df = stream_dir
    baseline = {0: 30, 1: 40, 2: 30, 3: 10}
    taus = {"psi": 0.1, "ks": 0.15, "chi2": 0.5, "emd": 20.0,
            "kl": 0.3, "jsd": 0.1}
    sdf = spark.readStream.schema(batch_df.schema).parquet(path)
    drift = stream_windowed_drift(sdf, "v", "ts", baseline, bucket_width=25.0,
                                  psi_max=taus["psi"], ks_max=taus["ks"],
                                  chi2_max=taus["chi2"],
                                  emd_max=taus["emd"],
                                  kl_max=taus["kl"], jsd_max=taus["jsd"],
                                  window_duration="1 minute",
                                  watermark="0 seconds")
    assert drift.isStreaming
    _run_to_memory(drift, "drift_sink")
    got = spark.sql("select * from drift_sink").collect()
    assert len(got) >= 48  # ≥8 closed windows × 6 statistics
    seen_stats = {r["check_id"].rsplit("/", 1)[-1] for r in got}
    assert seen_stats == {"psi", "ks", "chi2", "emd", "kl", "jsd"}

    def batch_chi2(hist):
        return float(chi2_value_df(hist, baseline, spark).first()["value"])

    def batch_emd(hist):
        return float(emd_value_df(hist, baseline, spark,
                                  bucket_width=25.0).first()["value"])

    fns = {"psi": lambda h: psi(h, baseline, spark),
           "ks": lambda h: ks(h, baseline, spark),
           "chi2": batch_chi2,
           "emd": batch_emd,
           "kl": lambda h: float(
               kl_value_df(h, baseline, spark).first()["value"]),
           "jsd": lambda h: float(
               jsd_value_df(h, baseline, spark).first()["value"])}
    for r in got:
        stat = r["check_id"].rsplit("/", 1)[-1]
        sliced = batch_df.where(
            (F.col("ts") >= r["window_start"]) & (F.col("ts") < r["window_end"]))
        expected = fns[stat](histogram(sliced, "v", 25.0))
        assert abs(r["metric_value"] - expected) < 1e-9, (
            stat, r["window_start"], r["metric_value"], expected)
        assert r["passed"] == (expected <= taus[stat])
        assert r["threshold"] == taus[stat]


def test_quarantine_router_matches_batch_split(spark, stream_dir, tmp_path):
    """VERDICT r2 item 8: the streaming foreachBatch router and the batch
    split_valid quarantine share one code path — identical clean/quarantine
    partitions for the same input."""
    from jsonschema_valid_spark.engine import split_valid
    from jsonschema_valid_spark.streaming.checks import quarantine_router

    path, df = stream_dir
    suite = CheckSuite(SUITE)
    out = str(tmp_path / "routed")

    sdf = spark.readStream.schema(df.schema).parquet(path)
    q = (sdf.writeStream.foreachBatch(quarantine_router(suite, out))
         .option("checkpointLocation", f"{out}/_ckpt")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    s_clean = {r["doc_id"] for r in
               spark.read.parquet(f"{out}/clean").collect()}
    s_bad = {r["doc_id"] for r in
             spark.read.parquet(f"{out}/quarantine").collect()}

    b_clean_df, b_bad_df = split_valid(suite, df)
    b_clean = {r["doc_id"] for r in b_clean_df.collect()}
    b_bad = {r["doc_id"] for r in b_bad_df.collect()}

    assert s_clean == b_clean
    assert s_bad == b_bad
    assert s_bad and s_clean            # both sides non-trivial
    assert s_clean.isdisjoint(s_bad)


def test_hash_sample_streaming_matches_batch(spark, stream_dir):
    """The hash-gate sample is a stateless codegen'd filter, so it applies
    to readStream unchanged — the streamed sample must equal the batch
    sample row-for-row (the property that makes sampled stream taps
    consistent with offline reruns)."""
    from jsonschema_valid_spark.functions.sampling import hash_sample

    path, df = stream_dir
    sdf = spark.readStream.schema(df.schema).parquet(path)
    _run_to_memory(
        hash_sample(sdf, "doc_id", 0.3, seed=5).select("doc_id"),
        "sample_stream")
    s_ids = {r["doc_id"]
             for r in spark.sql("select * from sample_stream").collect()}
    b_ids = {r["doc_id"] for r in
             hash_sample(df, "doc_id", 0.3, seed=5).select("doc_id").collect()}
    assert s_ids == b_ids and 0 < len(b_ids) < 100


def test_stream_categorical_drift_matches_batch(spark, stream_dir):
    """Streaming categorical drift (wave 12): windowed category-frequency
    PSI/chi2 must equal the batch categorical operators on the same
    window slices; undeclared categories land in the 'other' bucket and
    KS/EMD are refused."""
    import pytest as _pytest

    from jsonschema_valid_spark.operators.drift import (
        categorical_histogram,
        chi2_value_df,
        psi_value_df,
    )
    from jsonschema_valid_spark.streaming.checks import stream_windowed_drift

    path, batch_df = stream_dir
    # category column derived from v: 'neg' (10%), 'even', 'odd' — the
    # baseline deliberately omits 'neg' so it exercises the other bucket
    batch_cat = batch_df.withColumn(
        "cat", F.when(F.col("v") < 0, "neg")
        .when(F.col("v") % 2 == 0, "even").otherwise("odd"))
    baseline = {"even": 50, "odd": 50}
    sdf = (spark.readStream.schema(batch_df.schema).parquet(path)
           .withColumn("cat", F.when(F.col("v") < 0, "neg")
                       .when(F.col("v") % 2 == 0, "even")
                       .otherwise("odd")))
    drift = stream_windowed_drift(
        sdf, "cat", "ts", baseline, categorical=True,
        psi_max=0.1, chi2_max=0.5, ks_max=None, emd_max=None,
        window_duration="1 minute", watermark="0 seconds")
    _run_to_memory(drift, "cat_drift_sink")
    got = spark.sql("select * from cat_drift_sink").collect()
    assert len(got) >= 16
    assert ({r["check_id"].rsplit("/", 1)[-1] for r in got}
            == {"psi", "chi2"})

    cats = sorted(baseline)
    int_base = {i: baseline[c] for i, c in enumerate(cats)}
    fns = {
        "psi": lambda h: float(
            psi_value_df(h, int_base, spark).first()["value"]),
        "chi2": lambda h: float(
            chi2_value_df(h, int_base, spark).first()["value"]),
    }
    for r in got:
        stat = r["check_id"].rsplit("/", 1)[-1]
        sliced = batch_cat.where(
            (F.col("ts") >= r["window_start"])
            & (F.col("ts") < r["window_end"]))
        expected = fns[stat](categorical_histogram(sliced, "cat", cats))
        assert abs(r["metric_value"] - expected) < 1e-9, (
            stat, r["window_start"], r["metric_value"], expected)

    with _pytest.raises(ValueError):
        stream_windowed_drift(sdf, "cat", "ts", baseline,
                              categorical=True, ks_max=0.1)


def test_stream_joint_drift_matches_batch(spark, stream_dir):
    """Streaming JOINT drift (r5): per-window (v-bucket × parity-category)
    cell PSI must equal the batch joint operators on the same window
    slices; undeclared cells land in 'other'; KS/EMD and mode mixing are
    refused. Rows with a NULL in any dim (s is null every 4th row) are
    excluded on both sides."""
    import pytest as _pytest

    from jsonschema_valid_spark.operators.drift import (
        joint_histogram,
        psi_value_df,
    )
    from jsonschema_valid_spark.streaming.checks import stream_windowed_drift

    path, batch_df = stream_dir
    dims = [{"column": "v", "bucketWidth": 32.0}, {"column": "s"}]
    baseline = {"0|src": 30, "1|src": 30, "2|src": 20}
    sdf = spark.readStream.schema(batch_df.schema).parquet(path)
    drift = stream_windowed_drift(
        sdf, "v", "ts", baseline, joint=dims,
        psi_max=0.1, ks_max=None,
        window_duration="1 minute", watermark="0 seconds")
    _run_to_memory(drift, "joint_drift_sink")
    got = spark.sql("select * from joint_drift_sink").collect()
    assert len(got) >= 8
    declared = sorted(baseline)
    int_base = {i: baseline[c] for i, c in enumerate(declared)}
    for r in got:
        sliced = batch_df.where(
            (F.col("ts") >= r["window_start"])
            & (F.col("ts") < r["window_end"]))
        expected = float(psi_value_df(
            joint_histogram(sliced, dims, declared), int_base,
            spark).first()["value"])
        assert abs(r["metric_value"] - expected) < 1e-9, (
            r["window_start"], r["metric_value"], expected)

    with _pytest.raises(ValueError):
        stream_windowed_drift(sdf, "v", "ts", baseline, joint=dims,
                              ks_max=0.1)
    with _pytest.raises(ValueError):
        stream_windowed_drift(sdf, "v", "ts", baseline, joint=dims,
                              categorical=True, psi_max=0.1)
