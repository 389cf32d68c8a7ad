"""Streaming x-maxFrequency (streaming/checks.py stream_frequency_alerts):
per-window dominance alerts from a Misra-Gries state merged across
micro-batches, emitted when the watermark closes the window."""

import time

import pytest

from pyspark.sql import functions as F

from jsonschema_valid_spark.streaming.checks import stream_frequency_alerts


def _write_batch(spark, path, rows):
    df = spark.createDataFrame(rows, "v: string, ts_s: string") \
        .select("v", F.to_timestamp("ts_s").alias("ts"))
    df.coalesce(1).write.mode("append").parquet(path)
    time.sleep(1.1)  # distinct mtimes => file-source batch order


def _run(spark, path, name, **kw):
    sdf = (spark.readStream.schema("v string, ts timestamp")
           .option("maxFilesPerTrigger", 1).parquet(path))
    out = stream_frequency_alerts(sdf, "v", "ts", window_duration="1 hour",
                                  **kw)
    q = (out.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)
    return sorted((str(r["window_start"]), r["value"], r["est"],
                   r["total"], r["status"])
                  for r in spark.sql(f"select * from {name}").collect())


def test_cross_batch_dominance_alert(spark, tmp_path):
    """The hot value's count only crosses the threshold when BOTH
    micro-batches of the same window are merged — a per-batch check
    would miss it (the reason the state is a mergeable sketch)."""
    path = str(tmp_path / "in")
    h = "2024-01-01 00:30:00"
    # window 00:00: hot x5 + 5 distinct across TWO batches (x: 3+2);
    # a later window's row advances the watermark past 01:00
    _write_batch(spark, path, [("x", h)] * 3 + [("a", h), ("b", h)])
    _write_batch(spark, path, [("x", h)] * 2 + [("c", h), ("d", h),
                                                ("e", h)])
    _write_batch(spark, path, [("z", "2024-01-01 05:00:00")])

    got = _run(spark, path, "freq_sink1", max_fraction=0.4, k=100)
    # x: 5/10 = 0.5 > 0.4 -> certain violation; nobody else close
    assert got == [("2024-01-01 00:00:00", "x", 5, 10, "violation")]


def test_batch_parity_when_k_exact(spark, tmp_path):
    """k >= distinct values => the MG state is exact, so per-window
    'violation' rows equal the batch operator on the window slice."""
    from jsonschema_valid_spark.operators.frequency import (
        frequency_violations,
    )

    path = str(tmp_path / "in2")
    h = "2024-01-01 00:10:00"
    rows = ([("hot", h)] * 6 + [(f"u{i}", h) for i in range(4)]
            + [("warm", "2024-01-01 01:20:00")] * 3
            + [(f"w{i}", "2024-01-01 01:20:00") for i in range(2)])
    _write_batch(spark, path, rows[:7])
    _write_batch(spark, path, rows[7:])
    _write_batch(spark, path, [("z", "2024-01-01 09:00:00")])

    got = _run(spark, path, "freq_sink2", max_fraction=0.5, k=100)
    # batch replay per window
    bdf = spark.createDataFrame(rows, "v: string, ts_s: string") \
        .select("v", F.to_timestamp("ts_s").alias("ts"))
    expect = []
    for wstart, lo, hi in [("2024-01-01 00:00:00", "00:00", "01:00"),
                           ("2024-01-01 01:00:00", "01:00", "02:00")]:
        sl = bdf.where(
            (F.col("ts") >= f"2024-01-01 {lo}:00")
            & (F.col("ts") < f"2024-01-01 {hi}:00"))
        for r in frequency_violations(sl, "v", "c",
                                      max_fraction=0.5).collect():
            n, tot = r["observed"], r["expected"]
            expect.append((wstart, r["doc_id"],
                           int(n.split("=")[1]),
                           int(tot.rsplit("=", 1)[1]), "violation"))
    assert sorted(got) == sorted(expect)
    # hot 6/10 violates window 0; warm 3/5 violates window 1
    assert {g[1] for g in got} == {"hot", "warm"}


def test_suspect_band_under_small_k(spark, tmp_path):
    """With a tiny k the undercount slack widens: near-threshold values
    surface as 'suspect' rather than being silently missed."""
    path = str(tmp_path / "in3")
    h = "2024-01-01 00:05:00"
    rows = [("x", h)] * 10 + [(f"u{i}", h) for i in range(10)]
    _write_batch(spark, path, rows)
    _write_batch(spark, path, [("z", "2024-01-01 05:00:00")])
    got = _run(spark, path, "freq_sink3", max_fraction=0.45, k=4)
    # x est >= 10 - 20/5 = 6; true 10/20 = 0.5 > 0.45 must not vanish:
    # it appears as violation (est > 9) or suspect (est + slack > 9)
    assert any(v == "x" and s in ("violation", "suspect")
               for _, v, _, _, s in got)
    # nothing impossible is CERTAIN: every 'violation' row's est clears
    # the integer threshold est*den > num*total
    for _, v, est, tot, s in got:
        if s == "violation":
            assert est * 20 > 9 * tot


def test_rejects_bad_args(spark, tmp_path):
    sdf = (spark.readStream.schema("v string, ts timestamp")
           .parquet(str(tmp_path)))
    with pytest.raises(ValueError):
        stream_frequency_alerts(sdf, "v", "ts", max_fraction=1.5)
    with pytest.raises(ValueError):
        stream_frequency_alerts(sdf, "v", "ts", max_fraction=0.5, k=1)


def test_stream_distribution_uniform_gate(spark, tmp_path):
    """Streaming x-distribution: the window where the hash gate broke is
    named; the healthy window passes. Shares the windowed-drift engine,
    baseline synthesized from the uniform CDF."""
    from jsonschema_valid_spark.streaming.checks import (
        stream_distribution_verdicts,
    )

    def _write_dbl(rows):
        df = spark.createDataFrame(rows, "v: double, ts_s: string") \
            .select("v", F.to_timestamp("ts_s").alias("ts"))
        df.coalesce(1).write.mode("append").parquet(path)
        time.sleep(1.1)

    path = str(tmp_path / "dist_in")
    good = [(float((i * 37) % 100), "2024-01-01 00:20:00")
            for i in range(400)]
    broken = [(float(((i * 37) % 100) ** 2 % 100 // 2), "2024-01-01 01:20:00")
              for i in range(400)]
    _write_dbl(good)
    _write_dbl(broken)
    _write_dbl([(0.0, "2024-01-01 09:00:00")])

    sdf = (spark.readStream.schema("v double, ts timestamp")
           .option("maxFilesPerTrigger", 1).parquet(path))
    out = stream_distribution_verdicts(
        sdf, "v", "ts", family="uniform", params={"min": 0, "max": 100},
        bucket_width=10.0, psi_max=0.05, ks_max=0.05,
        window_duration="1 hour", watermark="0 seconds")
    q = (out.writeStream.format("memory").queryName("dist_sink")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = {(str(r["window_start"]), r["check_id"].rsplit("/", 1)[-1]
            if "/" in r["check_id"] else r["check_id"]): r["passed"]
           for r in spark.sql("select * from dist_sink").collect()}
    w0 = [v for (ws, _), v in got.items() if ws == "2024-01-01 00:00:00"]
    w1 = [v for (ws, _), v in got.items() if ws == "2024-01-01 01:00:00"]
    assert w0 and all(w0), f"healthy window tripped: {got}"
    assert w1 and not any(w1), f"broken window passed: {got}"

    import pytest as _pt
    with _pt.raises(ValueError):
        stream_distribution_verdicts(sdf, "v", "ts", family="uniform",
                                     params={"min": 0, "max": 1})


def test_stream_drift_edges_mode(spark, tmp_path):
    """Streaming x-drift equi-depth: closed windows bucket by the same
    quantile edges as batch; the shifted window trips, the matching one
    passes."""
    from jsonschema_valid_spark.streaming.checks import stream_windowed_drift

    def _write_dbl(path, rows):
        df = spark.createDataFrame(rows, "v: double, ts_s: string") \
            .select("v", F.to_timestamp("ts_s").alias("ts"))
        df.coalesce(1).write.mode("append").parquet(path)
        time.sleep(1.1)

    path = str(tmp_path / "edges_in")
    ok_rows = [(float(i % 100), "2024-01-01 00:20:00") for i in range(400)]
    bad_rows = [(float(i % 100) + 60.0, "2024-01-01 01:20:00")
                for i in range(400)]
    _write_dbl(path, ok_rows)
    _write_dbl(path, bad_rows)
    _write_dbl(path, [(0.0, "2024-01-01 09:00:00")])

    sdf = (spark.readStream.schema("v double, ts timestamp")
           .option("maxFilesPerTrigger", 1).parquet(path))
    out = stream_windowed_drift(
        sdf, "v", "ts", baseline={0: 250, 1: 250, 2: 250, 3: 250},
        edges=[25.0, 50.0, 75.0], psi_max=0.05, ks_max=0.05,
        window_duration="1 hour", watermark="0 seconds")
    q = (out.writeStream.format("memory").queryName("edges_sink")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = {(str(r["window_start"]), r["check_id"]): r["passed"]
           for r in spark.sql("select * from edges_sink").collect()}
    w0 = [v for (ws, _), v in got.items() if ws == "2024-01-01 00:00:00"]
    w1 = [v for (ws, _), v in got.items() if ws == "2024-01-01 01:00:00"]
    assert w0 and all(w0) and w1 and not any(w1), got

    import pytest as _pt
    with _pt.raises(ValueError):
        stream_windowed_drift(sdf, "v", "ts", baseline={0: 1},
                              edges=[2.0, 1.0], psi_max=0.1)
    with _pt.raises(ValueError):
        stream_windowed_drift(sdf, "v", "ts", baseline={0: 1},
                              edges=[1.0], emd_max=0.1, psi_max=0.1)


def test_stream_benford_windows(spark, tmp_path):
    """Streaming x-distribution benford: the log-uniform window passes,
    the uniform-[10,100) (fabricated-numbers) window trips — digit
    bucketing happens at ingestion as a pure projection."""
    from jsonschema_valid_spark.streaming.checks import (
        stream_distribution_verdicts,
    )

    def _write_dbl(rows):
        df = spark.createDataFrame(rows, "v: double, ts_s: string") \
            .select("v", F.to_timestamp("ts_s").alias("ts"))
        df.coalesce(1).write.mode("append").parquet(path)
        time.sleep(1.1)

    path = str(tmp_path / "benford_in")
    natural = [(10.0 ** (((i * 2654435761) % 100000) / 100000.0 * 6.0),
                "2024-01-01 00:20:00") for i in range(2000)]
    fabricated = [(10.0 + ((i * 2654435761) % 100000) / 100000.0 * 90.0,
                   "2024-01-01 01:20:00") for i in range(2000)]
    _write_dbl(natural)
    _write_dbl(fabricated)
    _write_dbl([(1.0, "2024-01-01 09:00:00")])

    sdf = (spark.readStream.schema("v double, ts timestamp")
           .option("maxFilesPerTrigger", 1).parquet(path))
    out = stream_distribution_verdicts(
        sdf, "v", "ts", family="benford", params={},
        psi_max=0.05, chi2_max=0.05,
        window_duration="1 hour", watermark="0 seconds")
    q = (out.writeStream.format("memory").queryName("benford_sink")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = {(str(r["window_start"]), r["check_id"]): r["passed"]
           for r in spark.sql("select * from benford_sink").collect()}
    w0 = [v for (ws, _), v in got.items() if ws == "2024-01-01 00:00:00"]
    w1 = [v for (ws, _), v in got.items() if ws == "2024-01-01 01:00:00"]
    assert w0 and all(w0), f"natural window tripped: {got}"
    assert w1 and not any(w1), f"fabricated window passed: {got}"
