"""x-trend keyword: per-group OLS slope bounds (wave 17)."""

import pytest
from pyspark.sql import functions as F

from jsonschema_valid_spark import CheckSuite
from jsonschema_valid_spark.operators.trend import (
    trend_slopes,
    trend_violations,
)
from jsonschema_valid_spark.suite.spec import SuiteError, validate_suite_spec


def _df(spark):
    rows = []
    for i in range(40):
        rows.append((i, "steady", float(i), 10.0 + 0.5 * i))   # slope 0.5
        rows.append((100 + i, "runaway", float(i), 3.0 * i))   # slope 3.0
        rows.append((200 + i, "falling", float(i), -2.0 * i))  # slope -2.0
        rows.append((300 + i, "flat_x", 7.0, float(i)))        # slope undef
    rows += [(400, "tiny", 1.0, 1.0), (401, "tiny", 2.0, 9.0)]  # n < 3
    return spark.createDataFrame(
        rows, "id: long, grp: string, x: double, y: double")


def test_trend_slopes_exact(spark):
    m = {r.grp: r for r in trend_slopes(_df(spark), "y", "x",
                                        by="grp").collect()}
    assert m["steady"].slope == pytest.approx(0.5)
    assert m["runaway"].slope == pytest.approx(3.0)
    assert m["falling"].slope == pytest.approx(-2.0)
    assert m["flat_x"].slope is None          # constant x: NULL, no ANSI error
    assert m["steady"].n == 40


def test_trend_bounds_and_suppression(spark):
    df = _df(spark)
    v = trend_violations(df, "y", "c", order_by="x", by="grp",
                         max_slope=1.0)
    got = {r.doc_id: r.observed for r in v.collect()}
    # only the runaway group violates max=1; undefined slope (flat_x)
    # and the 2-row group are suppressed; steady passes
    assert set(got) == {"runaway"}
    assert got["runaway"].startswith("slope=3.000000,")

    both = trend_violations(df, "y", "c", order_by="x", by="grp",
                            min_slope=0.0, max_slope=1.0)
    assert {r.doc_id for r in both.collect()} == {"runaway", "falling"}

    # tiny group violates once min_count is relaxed (slope 8.0 > 1)
    relaxed = trend_violations(df, "y", "c", order_by="x", by="grp",
                               max_slope=1.0, min_count=2)
    assert {r.doc_id for r in relaxed.collect()} == {"runaway", "tiny"}


def test_trend_keyword_both_paths_and_plan(spark):
    df = _df(spark)
    spec = {"properties": {"y": {"x-trend": {
        "orderBy": "x", "by": "grp", "max": 1.0, "min": 0.0}}}}
    res = CheckSuite(spec).run(df, key="id")
    assert {r.doc_id for r in res.violations.collect()} == \
        {"runaway", "falling"}
    assert not res.ok()
    verd = {r.check_id: r.passed for r in res.verdicts.collect()}
    assert verd["properties/y/x-trend"] is False

    from jsonschema_valid_spark.engine import run_suite_summarized
    summ = run_suite_summarized(CheckSuite(spec), df, key="id")
    assert {r.doc_id for r in summ.violations.collect()} == \
        {"runaway", "falling"}

    # moment statistic: ONE hash Exchange (the #groups aggregate),
    # never a sort or window over the fact rows
    v = trend_violations(df, "y", "c", order_by="x", by="grp",
                         max_slope=1.0)
    plan = v._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "SortMergeJoin" not in plan and "Window" not in plan


def test_trend_global_scope(spark):
    df = _df(spark).where(F.col("grp") == "falling")
    res = CheckSuite({"properties": {"y": {"x-trend": {
        "orderBy": "x", "min": 0.0}}}}).run(df, key="id")
    rows = res.violations.collect()
    assert [r.doc_id for r in rows] == ["<global>"]
    assert rows[0].observed.startswith("slope=-2.000000,")


def test_trend_spec_validation():
    for bad in (
        {"min": 0.5},                        # orderBy missing
        {"orderBy": "x"},                    # no bound
        {"orderBy": "x", "min": True},
        {"orderBy": "x", "min": 0.0, "minCount": 2},
        {"orderBy": "", "min": 0.0},
        "x",
    ):
        with pytest.raises(SuiteError):
            validate_suite_spec({"properties": {"v": {"x-trend": bad}}})
    validate_suite_spec({"properties": {"v": {"x-trend": {
        "orderBy": "x", "by": "g", "max": 2.5, "minCount": 10}}}})


def test_pergroup_verdicts(spark):
    df = _df(spark)
    spec = {"properties": {"y": {"x-trend": {
        "orderBy": "x", "by": "grp", "min": 0.0, "max": 1.0,
        "verdicts": "perGroup"}}}}
    res = CheckSuite(spec).run(df, key="id")
    verd = {r.partition_id: (r.passed, r.metric_value)
            for r in res.verdicts.collect()}
    assert set(verd) == {"steady", "runaway", "falling", "flat_x", "tiny"}
    assert verd["runaway"] == (False, pytest.approx(3.0))
    assert verd["falling"][0] is False
    assert verd["steady"] == (True, pytest.approx(0.5))
    assert verd["flat_x"][0] is True   # undefined slope: suppressed
    assert verd["tiny"][0] is True     # under minCount: suppressed
    from jsonschema_valid_spark.engine import run_suite_summarized
    summ = run_suite_summarized(CheckSuite(spec), df, key="id")
    sv = {r.partition_id: r.passed for r in summ.verdicts.collect()
          if r.check_id == "properties/y/x-trend"}
    assert sv == {p: ok for p, (ok, _) in verd.items()}
    with pytest.raises(SuiteError):
        validate_suite_spec({"properties": {"y": {"x-trend": {
            "orderBy": "x", "min": 0.0, "verdicts": "perGroup"}}}})
