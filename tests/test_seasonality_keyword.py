"""x-seasonality: lag-k autocorrelation bounds per group (wave 33) —
rhythm retention (min) and independence / stuck-sensor (max)."""

import pytest
from pyspark.sql import functions as F

from jsonschema_valid_spark import CheckSuite
from jsonschema_valid_spark.engine import run_suite_summarized
from jsonschema_valid_spark.operators.seasonality import (
    seasonality_group_verdicts,
    seasonality_violations,
)
from jsonschema_valid_spark.suite.spec import SuiteError, validate_suite_spec


def _series(spark):
    rows = []
    # 'per': period-3 sawtooth 0,10,20,0,10,20,... -> acf@3 = 1
    for i in range(12):
        rows.append(("per", i, float((i % 3) * 10)))
    # 'alt': period-2 alternation 0,8,0,8,... -> acf@3 = -1
    for i in range(12):
        rows.append(("alt", i, float((i % 2) * 8)))
    # 'flat': constant -> zero variance, acf undefined -> suppressed
    for i in range(12):
        rows.append(("flat", i, 5.0))
    # 'thin': periodic but only 4 rows -> 1 pair at lag 3 -> min_count
    for i in range(4):
        rows.append(("thin", i, float((i % 3) * 10)))
    return spark.createDataFrame(rows, "grp: string, idx: int, v: double")


def test_min_bound_rhythm_retention(spark):
    df = _series(spark)
    out = seasonality_violations(
        df, "v", "c", key="idx", order_by="idx", lag=3, by="grp",
        min_acf=0.9)
    got = {r.doc_id: r.observed for r in out.collect()}
    # 'alt' lost the declared period-3 rhythm (acf@3 = -1); 'per' keeps
    # it; 'flat' undefined and 'thin' under min_count are suppressed
    assert set(got) == {"alt"}
    assert got["alt"].startswith("acf@3=-1.0000,n=")


def test_max_bound_independence(spark):
    # a linear ramp is maximally self-dependent: acf@1 near 1 trips an
    # independence ceiling; the alternation (acf@1 = -1) passes it
    df = _series(spark).withColumn(
        "ramp", F.when(F.col("grp") == "per", F.col("idx").cast("double"))
        .otherwise(F.col("v")))
    out = seasonality_violations(
        df, "ramp", "c", key="idx", order_by="idx", lag=1, by="grp",
        max_acf=0.5)
    assert {r.doc_id for r in out.collect()} == {"per"}


def test_group_verdicts_enumerate_all(spark):
    df = _series(spark)
    g = seasonality_group_verdicts(
        df, "v", "c", key="idx", order_by="idx", lag=3, by="grp",
        min_acf=0.9)
    got = {r.partition_id: (r.passed, round(r.metric_value, 4),
                            r.threshold) for r in g.collect()}
    assert set(got) == {"per", "alt", "flat", "thin"}
    assert got["per"] == (True, 1.0, 0.9)
    assert got["alt"] == (False, -1.0, 0.9)
    assert got["flat"][0] is True      # undefined -> suppressed pass
    assert got["thin"][0] is True      # under min_count -> suppressed


def test_keyword_both_paths_and_where(spark):
    df = _series(spark)
    spec = {"properties": {"v": {"x-seasonality": {
        "orderBy": "idx", "lag": 3, "by": "grp", "min": 0.9,
        "where": "grp <> 'alt'"}}}}
    res = CheckSuite(spec).run(df, key="idx")
    assert res.violations.count() == 0  # the offender is scoped out
    spec2 = {"properties": {"v": {"x-seasonality": {
        "orderBy": "idx", "lag": 3, "by": "grp", "min": 0.9}}}}
    res2 = CheckSuite(spec2).run(df, key="idx")
    assert {r.doc_id for r in res2.violations.collect()} == {"alt"}
    summ = run_suite_summarized(CheckSuite(spec2), df, key="idx")
    assert {r.doc_id for r in summ.violations.collect()} == {"alt"}
    vrows = [r for r in summ.verdicts.collect()
             if "x-seasonality" in r.check_id]
    assert len(vrows) == 1 and vrows[0].passed is False


def test_keyword_pergroup_verdicts(spark):
    df = _series(spark)
    spec = {"properties": {"v": {"x-seasonality": {
        "orderBy": "idx", "lag": 3, "by": "grp", "min": 0.9,
        "verdicts": "perGroup"}}}}
    res = CheckSuite(spec).run(df, key="idx")
    got = {r.partition_id: r.passed for r in res.verdicts.collect()
           if "x-seasonality" in r.check_id}
    assert got == {"per": True, "alt": False, "flat": True, "thin": True}


def test_spec_validation():
    base = {"orderBy": "idx", "lag": 3, "min": 0.9}
    validate_suite_spec({"properties": {"v": {"x-seasonality": base}}})
    for bad in [
        {"orderBy": "idx", "min": 0.9},                      # no lag
        {"orderBy": "idx", "lag": 0, "min": 0.9},            # lag < 1
        {"orderBy": "idx", "lag": 3},                        # no bound
        {"orderBy": "idx", "lag": 3, "min": 1.5},            # out of [-1,1]
        {"orderBy": "idx", "lag": 3, "min": 0.9,
         "verdicts": "perGroup"},                            # perGroup w/o by
        {"lag": 3, "min": 0.9},                              # no orderBy
    ]:
        with pytest.raises(SuiteError):
            validate_suite_spec({"properties": {"v": {
                "x-seasonality": bad}}})


def test_rejects_bad_args(spark):
    df = _series(spark)
    with pytest.raises(ValueError, match="min and/or max"):
        seasonality_violations(df, "v", "c", key="idx", order_by="idx",
                               lag=3, by="grp")
    with pytest.raises(ValueError, match="lag must be >= 1"):
        seasonality_violations(df, "v", "c", key="idx", order_by="idx",
                               lag=0, by="grp", min_acf=0.5)


def test_plan_single_exchange_no_join(spark):
    df = _series(spark)
    out = seasonality_violations(
        df, "v", "c", key="idx", order_by="idx", lag=3, by="grp",
        min_acf=0.9)
    plan = out._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "Join" not in plan, plan
    # window hash-partitioning is CONSUMED by the moment aggregate:
    # one Exchange end-to-end (aliasing the key first would buy two)
    assert plan.count("Exchange") <= 1, plan


# ---- wave 35: period discovery -------------------------------------------

def test_discover_period_finds_dominant_lag(spark):
    from jsonschema_valid_spark.operators.seasonality import (
        discover_period,
    )

    rows = []
    for i in range(40):
        rows.append(("p4", i, float((i % 4) * 10)))   # period 4
        rows.append(("p3", i, float((i % 3) * 10)))   # period 3
        rows.append(("flat", i, 5.0))                  # undefined acf
    df = spark.createDataFrame(rows, "grp: string, idx: int, v: double")
    best = discover_period(df, "v", key="idx", order_by="idx",
                           max_lag=6, by="grp", best_only=True)
    got = {r.group: (r.lag, round(r.acf, 4)) for r in best.collect()}
    # the fundamental wins its harmonics (ties break toward SHORT lag:
    # p3's acf is 1.0 at lags 3 AND 6 -> 3 reported)
    assert got == {"p4": (4, 1.0), "p3": (3, 1.0)}
    tidy = discover_period(df, "v", key="idx", order_by="idx",
                           max_lag=6, by="grp")
    assert tidy.count() == 18  # 3 groups x 6 lags, flat rows kept NULL
    import pytest as _pt
    with _pt.raises(ValueError, match="max_lag"):
        discover_period(df, "v", key="idx", order_by="idx", max_lag=0)


def test_discover_period_feeds_bootstrap(spark):
    from jsonschema_valid_spark.operators.profile import (
        suggest_seasonality_floor,
    )
    from jsonschema_valid_spark.operators.seasonality import (
        discover_period,
    )

    df = spark.createDataFrame(
        [("a", i, float((i % 5) * 10 + (i % 2))) for i in range(60)],
        "grp: string, idx: int, v: double")
    best = discover_period(df, "v", key="idx", order_by="idx",
                           max_lag=8, by="grp", best_only=True).collect()
    assert len(best) == 1 and best[0].lag == 5
    node = suggest_seasonality_floor(df, "v", key="idx", order_by="idx",
                                     lag=best[0].lag, by="grp")
    assert node is not None and node["lag"] == 5
    from jsonschema_valid_spark import CheckSuite
    assert CheckSuite({"properties": {"v": {
        "x-seasonality": node}}}).run(df, key="idx").ok()
