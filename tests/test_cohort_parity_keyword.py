"""x-cohortParity: cohort metric within maxGap of a baseline cohort's
(wave 31) — the A/B-sanity / split-balance / fairness gate."""

import pytest
from pyspark.sql import functions as F

from jsonschema_valid_spark import CheckSuite
from jsonschema_valid_spark.engine import run_suite_summarized
from jsonschema_valid_spark.operators.parity_cohort import (
    cohort_parity_group_verdicts,
    cohort_parity_violations,
)
from jsonschema_valid_spark.suite.spec import SuiteError, validate_suite_spec


def _df(spark):
    rows = []
    i = 0
    # control: mean 10.0 over 40 rows; treatment_ok: mean 10.5;
    # treatment_bad: mean 14.0; tiny: 1 row (suppressed)
    for cohort, base, n in (("control", 10.0, 40),
                            ("t_ok", 10.5, 40),
                            ("t_bad", 14.0, 40)):
        for j in range(n):
            # exact mean by symmetric +/- 1 pairs
            v = base + (1.0 if j % 2 == 0 else -1.0)
            rows.append((i, cohort, v)); i += 1
    rows.append((i, "tiny", 99.0)); i += 1
    rows.append((i, None, 50.0)); i += 1        # NULL cohort excluded
    return spark.createDataFrame(rows, "id: long, arm: string, v: double")


def test_mean_gap_and_suppression(spark):
    df = _df(spark)
    v = cohort_parity_violations(
        df, "v", "c", cohort_col="arm", baseline="control",
        max_gap=1.0, min_count=5)
    got = {r.doc_id: r.observed for r in v.collect()}
    assert set(got) == {"t_bad"}
    assert got["t_bad"] == "m=14.000000,base=10.000000,gap=4.000000,n=40"


def test_rate_metric_exact(spark):
    df = _df(spark)
    # rate of v > 10: control 0.5 (20/40), t_ok 0.5, t_bad 1.0
    v = cohort_parity_violations(
        df, "v", "c", cohort_col="arm", baseline="control",
        metric="rate", expr="v > 10", max_gap=0.25, min_count=5)
    got = {r.doc_id: r.observed for r in v.collect()}
    assert set(got) == {"t_bad"}
    assert got["t_bad"] == "m=1.000000,base=0.500000,gap=0.500000,n=40"


def test_missing_baseline_suppresses(spark):
    df = _df(spark).where(F.col("arm") != "control")
    v = cohort_parity_violations(
        df, "v", "c", cohort_col="arm", baseline="control",
        max_gap=0.1, min_count=5)
    assert v.count() == 0


def test_by_groups_and_pergroup_verdicts(spark):
    rows = []
    i = 0
    for grp, cohort, base in (("en", "control", 10.0), ("en", "t", 10.2),
                              ("de", "control", 20.0), ("de", "t", 26.0)):
        for j in range(20):
            rows.append((i, grp, cohort,
                         base + (1.0 if j % 2 == 0 else -1.0))); i += 1
    df = spark.createDataFrame(rows, "id: long, g: string, arm: string, "
                                     "v: double")
    v = cohort_parity_violations(
        df, "v", "c", cohort_col="arm", baseline="control",
        max_gap=1.0, by="g", min_count=5)
    assert {r.doc_id for r in v.collect()} == {"de|t"}

    gv = cohort_parity_group_verdicts(
        df, "v", "c", cohort_col="arm", baseline="control",
        max_gap=1.0, by="g", min_count=5)
    rows = {r.partition_id: r for r in gv.collect()}
    assert set(rows) == {"en|control", "en|t", "de|control", "de|t"}
    assert rows["en|t"].passed and abs(rows["en|t"].metric_value
                                       - 0.2) < 1e-9
    assert not rows["de|t"].passed
    assert abs(rows["de|t"].metric_value - 6.0) < 1e-9
    assert rows["de|control"].passed      # baseline gap = 0
    assert rows["de|control"].metric_value == 0.0


def test_engine_both_paths(spark):
    df = _df(spark)
    suite = CheckSuite({"properties": {"v": {"x-cohortParity": {
        "cohort": "arm", "baseline": "control", "maxGap": 1.0,
        "minCount": 5}}}})
    res = suite.run(df, key="id")
    assert {r.doc_id for r in res.violations.collect()} == {"t_bad"}
    vd = {r.partition_id: r for r in res.verdicts.collect()}
    assert vd["<global>"].passed is False

    res2 = run_suite_summarized(suite, df, key="id")
    assert {r.doc_id for r in res2.violations.collect()} == {"t_bad"}

    suite3 = CheckSuite({"properties": {"v": {"x-cohortParity": {
        "cohort": "arm", "baseline": "control", "maxGap": 1.0,
        "minCount": 5, "verdicts": "perGroup"}}}})
    vd3 = {r.partition_id: r
           for r in suite3.run(df, key="id").verdicts.collect()}
    assert set(vd3) == {"control", "t_ok", "t_bad", "tiny"}
    assert vd3["t_ok"].passed and not vd3["t_bad"].passed
    assert vd3["tiny"].passed             # min_count suppressed


def test_plan_one_exchange_no_join(spark):
    df = _df(spark)
    v = cohort_parity_violations(
        df, "v", "c", cohort_col="arm", baseline="control", max_gap=1.0)
    plan = v._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "Join" not in plan
    # one Exchange for the cohort aggregate + the single-frame window
    # over #cohort cells (tiny aggregated data)
    assert plan.count("Exchange") <= 2


def test_spec_validation():
    validate_suite_spec({"properties": {"v": {"x-cohortParity": {
        "cohort": "arm", "baseline": "control", "maxGap": 0.5,
        "metric": "rate", "expr": "v > 0", "by": "g"}}}})
    for bad in (
        {"x-cohortParity": {"cohort": "a", "maxGap": 1}},       # no baseline
        {"x-cohortParity": {"baseline": "b", "maxGap": 1}},     # no cohort
        {"x-cohortParity": {"cohort": "a", "baseline": "b"}},   # no gap
        {"x-cohortParity": {"cohort": "a", "baseline": "b",
                            "maxGap": 0}},                      # gap <= 0
        {"x-cohortParity": {"cohort": "a", "baseline": "b",
                            "maxGap": 1, "metric": "rate"}},    # no expr
        {"x-cohortParity": {"cohort": "a", "baseline": "b",
                            "maxGap": 1, "expr": "v>0"}},       # expr w/o rate
        {"x-cohortParity": "arm"},                              # not object
    ):
        with pytest.raises(SuiteError):
            validate_suite_spec({"properties": {"v": bad}})


def test_streaming_matches_batch(spark, tmp_path):
    """stream_cohort_parity_verdicts == the batch operator per closed
    window; cross-batch merge; one-arm regression in window 1 only."""
    import json

    from jsonschema_valid_spark.streaming.checks import (
        stream_cohort_parity_verdicts,
    )

    rows = []
    # window 0: control and t both 50% (v > 10)
    for i in range(20):
        arm = "control" if i % 2 == 0 else "t"
        v = 20.0 if (i // 2) % 2 == 0 else 0.0
        rows.append((f"2024-01-01 00:00:{i:02d}", arm, v))
    # window 1: control 50%, t collapses to 100%
    for i in range(20):
        arm = "control" if i % 2 == 0 else "t"
        v = 20.0 if (arm == "t" or (i // 2) % 2 == 0) else 0.0
        rows.append((f"2024-01-01 00:01:{i:02d}", arm, v))
    src = tmp_path / "src"
    src.mkdir()
    (src / "b0.json").write_text("\n".join(
        json.dumps({"ts": t, "arm": a, "v": v}) for t, a, v in rows[:15]))

    sdf = (spark.readStream.schema("ts string, arm string, v double")
           .option("maxFilesPerTrigger", 1).json(str(src))
           .withColumn("ts", F.col("ts").cast("timestamp")))
    out = stream_cohort_parity_verdicts(
        sdf, "ts", "arm", cohorts=["control", "t"], baseline="control",
        max_gap=0.25, expr="v > 10", window_duration="1 minute")
    q = (out.writeStream.format("memory").queryName("cp_verdicts")
         .outputMode("append").start())
    try:
        q.processAllAvailable()
        (src / "b1.json").write_text("\n".join(
            json.dumps({"ts": t, "arm": a, "v": v})
            for t, a, v in rows[15:]))
        q.processAllAvailable()
        (src / "b2.json").write_text(json.dumps(
            {"ts": "2024-01-01 00:10:00", "arm": "control", "v": 1.0}))
        q.processAllAvailable()
        got = {(str(r.window_start), r.cohort): r
               for r in spark.sql("select * from cp_verdicts").collect()}
    finally:
        q.stop()
    w0t = got[("2024-01-01 00:00:00", "t")]
    w1t = got[("2024-01-01 00:01:00", "t")]
    assert w0t.passed and abs(w0t.gap) < 1e-12 and w0t.n == 10
    assert not w1t.passed and abs(w1t.gap - 0.5) < 1e-12
    assert got[("2024-01-01 00:01:00", "control")].passed

    # batch parity on the window-1 slice
    bdf = spark.createDataFrame(
        [(i, a, v) for i, (t, a, v) in enumerate(rows[20:])],
        "id: long, arm: string, v: double")
    bv = cohort_parity_violations(
        bdf, "v", "c", cohort_col="arm", baseline="control",
        metric="rate", expr="v > 10", max_gap=0.25)
    obs = {r.doc_id: r.observed for r in bv.collect()}
    assert set(obs) == {"t"}
    assert ",gap=0.500000," in obs["t"]


def test_median_metric_robust_to_outliers(spark):
    # control/t medians both 10; t's mean dragged to 20 by one outlier
    rows = []
    i = 0
    for j in range(21):
        rows.append((i, "control", float(j))); i += 1   # median 10
        rows.append((i, "t", float(j))); i += 1          # median 10
    rows.append((i, "t", 10000.0)); i += 1               # one outlier
    df = spark.createDataFrame(rows, "id: long, arm: string, v: double")
    mean_v = cohort_parity_violations(
        df, "v", "c", cohort_col="arm", baseline="control",
        metric="mean", max_gap=50.0, min_count=5)
    assert {r.doc_id for r in mean_v.collect()} == {"t"}  # mean trips
    med_v = cohort_parity_violations(
        df, "v", "c", cohort_col="arm", baseline="control",
        metric="median", max_gap=50.0, min_count=5)
    assert med_v.count() == 0                             # median robust
    # interpolated half-integer median: drop the outlier AND one t
    # value -> even-count cohort, median (9+10)/2 = 9.5
    df2 = df.where(~F.col("id").isin(41, 42))
    med2 = cohort_parity_violations(
        df2, "v", "c", cohort_col="arm", baseline="control",
        metric="median", max_gap=0.2, min_count=5)
    got = {r.doc_id: r.observed for r in med2.collect()}
    assert got == {"t": "m=9.500000,base=10.000000,gap=-0.500000,n=20"}
