"""Run-over-run metric anomaly detection (operators/anomaly.py)."""

import pytest
from pyspark.sql import Row, functions as F

from jsonschema_valid_spark.operators.anomaly import MetricsHistory, anomaly_flags
from jsonschema_valid_spark.suite.spec import CheckSuite
from tests.conftest import SF_DIR


def _series(spark, values, key="s"):
    return spark.createDataFrame(
        [Row(k=key, t=i, v=float(x)) for i, x in enumerate(values)],
        "k string, t int, v double")


def test_zscore_flags_spike(spark):
    vals = [100, 102, 98, 101, 99, 100, 103, 250]   # last point ~50σ out
    out = anomaly_flags(_series(spark, vals), ["k"], "t", "v",
                        method="zscore", window=10, min_history=3)
    rows = {r["t"]: r for r in out.collect()}
    assert rows[0]["status"] == "insufficient_history"
    assert rows[2]["status"] == "insufficient_history"   # only 2 prior
    assert rows[3]["status"] == "ok"
    assert rows[7]["status"] == "anomaly" and rows[7]["stat"] > 3
    assert all(rows[t]["status"] == "ok" for t in range(3, 7))


def test_zscore_constant_history(spark):
    out = anomaly_flags(_series(spark, [5, 5, 5, 5, 5, 7]), ["k"], "t", "v",
                        method="zscore", window=10, min_history=3)
    rows = {r["t"]: r["status"] for r in out.collect()}
    assert rows[4] == "ok"          # 5 matches the constant history
    assert rows[5] == "anomaly"     # zero-variance history, any departure


def test_relative_method(spark):
    out = anomaly_flags(_series(spark, [100, 120, 240, 0, 0, 50]),
                        ["k"], "t", "v", method="relative", max_change=0.5)
    rows = {r["t"]: r for r in out.collect()}
    assert rows[0]["status"] == "insufficient_history"
    assert rows[1]["status"] == "ok" and rows[1]["stat"] == 0.2
    assert rows[2]["status"] == "anomaly"       # doubled
    assert rows[3]["status"] == "anomaly"       # -100%
    assert rows[4]["status"] == "ok"            # 0 -> 0
    assert rows[5]["status"] == "anomaly"       # 0 -> 50


def test_absolute_method(spark):
    out = anomaly_flags(_series(spark, [1, 5, 11]), ["k"], "t", "v",
                        method="absolute", bounds=(0, 10))
    assert [r["status"] for r in out.orderBy("t").collect()] == [
        "ok", "ok", "anomaly"]


def test_independent_series(spark):
    df = _series(spark, [10, 10, 10, 10, 100], key="a").unionByName(
        _series(spark, [100, 100, 100, 100, 100], key="b"))
    out = anomaly_flags(df, ["k"], "t", "v", method="zscore",
                        window=10, min_history=3)
    got = {(r["k"], r["t"]): r["status"] for r in out.collect()}
    assert got[("a", 4)] == "anomaly"    # b's scale must not mask a's spike
    assert got[("b", 4)] == "ok"


def test_method_validation(spark):
    with pytest.raises(ValueError, match="method"):
        anomaly_flags(_series(spark, [1]), ["k"], "t", "v", method="nope")
    with pytest.raises(ValueError, match="bounds"):
        anomaly_flags(_series(spark, [1]), ["k"], "t", "v", method="absolute")


SUITE = {"properties": {"n_tok": {"minimum": 1, "maximum": 200}},
         "x-rowExpr": "n_tok = size(tokens)"}


def test_metrics_history_end_to_end(spark, tmp_path):
    """Simulated nightly runs: record 5 healthy runs' verdicts, then a
    degraded run whose violation counters jump — the history check flags
    exactly the jumped (partition, check) series."""
    from jsonschema_valid_spark.sources.sequences import load_sequences

    seq = load_sequences(spark, SF_DIR).cache()
    suite = CheckSuite(SUITE)
    hist = MetricsHistory(str(tmp_path / "metrics"))

    healthy = suite.run(seq, key="doc_id", partition_by="source").verdicts.cache()
    for run in range(1, 6):
        hist.record(healthy, run_seq=run)

    degraded = seq.withColumn(
        "n_tok",
        F.when(F.col("source") == "src2", F.lit(-1)).otherwise(F.col("n_tok")))
    bad_verdicts = suite.run(degraded, key="doc_id",
                             partition_by="source").verdicts
    flags = hist.check(bad_verdicts, run_seq=6, method="zscore",
                       window=10, min_history=3).cache()

    anom = {(r["partition_id"], r["check_id"])
            for r in flags.where("status = 'anomaly'").collect()}
    assert any(p == "src2" and "minimum" in c for p, c in anom)
    # untouched partitions stay quiet
    assert not any(p == "src1" for p, _ in anom)
    # every flagged row carries the current run's value
    assert flags.where("run_seq != 6").isEmpty() if "run_seq" in flags.columns \
        else True


def test_metrics_history_empty_store(spark, tmp_path):
    suite = CheckSuite(SUITE)
    from jsonschema_valid_spark.sources.sequences import load_sequences

    seq = load_sequences(spark, SF_DIR)
    verdicts = suite.run(seq, key="doc_id", partition_by="source").verdicts
    flags = MetricsHistory(str(tmp_path / "none")).check(verdicts, run_seq=1)
    assert set(r["status"] for r in flags.collect()) == {"insufficient_history"}


def test_checkpoint_runner_metrics_integration(spark, tmp_path):
    """CheckpointRunner + MetricsHistory: healthy runs record baselines;
    a degraded run's committed verdicts are flagged vs that history."""
    from jsonschema_valid_spark.checkpoint import CheckpointRunner
    from jsonschema_valid_spark.sources.sequences import load_sequences

    seq = load_sequences(spark, SF_DIR).cache()
    suite = CheckSuite(SUITE)
    hist = MetricsHistory(str(tmp_path / "metrics"))

    for run in range(1, 5):
        runner = CheckpointRunner(suite, str(tmp_path / f"run{run}"))
        s = runner.run(seq, partition_by="source", key="doc_id",
                       metrics_history=hist, run_seq=run)
        assert s.anomalies == []    # first runs: insufficient history / ok

    degraded = seq.withColumn(
        "n_tok",
        F.when(F.col("source") == "src3", F.lit(-9)).otherwise(F.col("n_tok")))
    runner = CheckpointRunner(suite, str(tmp_path / "run5"))
    s = runner.run(degraded, partition_by="source", key="doc_id",
                   metrics_history=hist, run_seq=5)
    assert any(p == "src3" and "minimum" in c for p, c, _, _ in s.anomalies)
    assert not any(p == "src1" for p, _, _, _ in s.anomalies)

    with pytest.raises(ValueError, match="run_seq"):
        CheckpointRunner(suite, str(tmp_path / "runx")).run(
            seq, partition_by="source", key="doc_id", metrics_history=hist)


def test_seasonal_method_phase_aligned(spark):
    """A strong weekly rhythm (weekend dip) is normal under the seasonal
    method but trips the plain trailing zscore; a Saturday that's way off
    OTHER Saturdays trips seasonally even though it's an unremarkable
    value for a weekday."""
    from jsonschema_valid_spark.operators.anomaly import anomaly_flags

    rows = []
    for day in range(35):  # 5 weeks
        dow = day % 7
        base = 20.0 if dow in (5, 6) else 100.0
        val = base + (day % 3)  # tiny jitter
        rows.append(("m", day, val))
    # day 33 (dow 5, a Saturday): weekday-like value 100 — seasonal outlier
    rows[33] = ("m", 33, 100.0)
    df = spark.createDataFrame(rows, "series: string, day: long, v: double")

    seas = {r["day"]: r["status"] for r in anomaly_flags(
        df, ["series"], "day", "v", method="seasonal", period=7,
        window=5, min_history=2, k=3.0).collect()}
    assert seas[33] == "anomaly"
    # ordinary weekend dips are NOT anomalies seasonally
    ordinary_weekends = [d for d in range(14, 33) if d % 7 in (5, 6)]
    assert all(seas[d] == "ok" for d in ordinary_weekends)

    # the plain trailing zscore MISSES the seasonal outlier: 100.0 is an
    # unremarkable value against the mixed weekday/weekend trailing
    # window (z ~ +0.6) — only phase alignment exposes it
    plain = {r["day"]: r["status"] for r in anomaly_flags(
        df, ["series"], "day", "v", method="zscore",
        window=7, min_history=3, k=3.0).collect()}
    assert plain[33] == "ok"

    import pytest as _pt
    with _pt.raises(ValueError):
        anomaly_flags(df, ["series"], "day", "v", method="seasonal")
