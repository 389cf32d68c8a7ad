"""x-compliance: predicate pass-rate bounds (wave 23) — the error-budget
form of x-rowExpr, as x-nullRate is of `required`."""

import pytest
from pyspark.sql import functions as F

from jsonschema_valid_spark import CheckSuite
from jsonschema_valid_spark.engine import run_suite_summarized
from jsonschema_valid_spark.operators.compliance import (
    compliance_group_verdicts,
    compliance_violations,
)
from jsonschema_valid_spark.suite.spec import SuiteError, validate_suite_spec


def _df(spark):
    rows = []
    for i in range(100):
        rows.append((i, "clean", float(i + 1)))                # 100% positive
        rows.append((1000 + i, "dirty", float(i - 19)))        # 80% positive
        rows.append((2000 + i, "nulls",
                     float(i + 1) if i % 2 else None))         # 50% non-NULL
    rows.append((3000, "tiny", -5.0))
    return spark.createDataFrame(rows, "id: long, grp: string, v: double")


def test_rate_bounds_null_as_fail_and_suppression(spark):
    df = _df(spark)
    v = compliance_violations(df, "v", "c", expr="v > 0", by="grp",
                              min_rate=0.9, min_count=5)
    got = {r.doc_id: r.observed for r in v.collect()}
    # dirty 80% < 90%; nulls: NULL predicate counts as FAIL -> 50%;
    # tiny suppressed under min_count; clean passes
    assert set(got) == {"dirty", "nulls"}
    assert got["dirty"] == "rate=0.800000,pass=80,n=100"
    assert got["nulls"] == "rate=0.500000,pass=50,n=100"

    # max bound: "at most 10% may satisfy the spam predicate" — NULLs
    # count as NOT satisfying under max (coalesce false), so the nulls
    # group's rate is 0.0 and passes; dirty's 20% trips
    vmax = compliance_violations(df, "v", "c", expr="v <= 0", by="grp",
                                 max_rate=0.1, min_count=5)
    assert {r.doc_id for r in vmax.collect()} == {"dirty"}


def test_keyword_both_paths_plan_and_global(spark):
    df = _df(spark)
    spec = {"properties": {"v": {"x-compliance": {
        "expr": "v > 0", "min": 0.9, "by": "grp", "minCount": 5}}}}
    res = CheckSuite(spec).run(df, key="id")
    assert {r.doc_id for r in res.violations.collect()} == \
        {"dirty", "nulls"}
    verd = {r.check_id: r.passed for r in res.verdicts.collect()}
    assert verd["properties/v/x-compliance"] is False
    summ = run_suite_summarized(CheckSuite(spec), df, key="id")
    assert {r.doc_id for r in summ.violations.collect()} == \
        {"dirty", "nulls"}

    # one conditional aggregate, no join/window/second scan
    v = compliance_violations(df, "v", "c", expr="v > 0", by="grp",
                              min_rate=0.9)
    plan = v._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "SortMergeJoin" not in plan and "Window" not in plan

    gres = CheckSuite({"properties": {"v": {"x-compliance": {
        "expr": "v > 0", "min": 0.99}}}}).run(
            df.where(F.col("grp") == "clean"), key="id")
    assert gres.ok()


def test_pergroup_verdicts(spark):
    df = _df(spark)
    spec = {"properties": {"v": {"x-compliance": {
        "expr": "v > 0", "min": 0.9, "by": "grp", "minCount": 5,
        "verdicts": "perGroup"}}}}
    res = CheckSuite(spec).run(df, key="id")
    verd = {r.partition_id: (r.passed, r.metric_value)
            for r in res.verdicts.collect()}
    assert set(verd) == {"clean", "dirty", "nulls", "tiny"}
    assert verd["clean"] == (True, pytest.approx(1.0))
    assert verd["dirty"] == (False, pytest.approx(0.8))
    assert verd["tiny"][0] is True  # suppressed
    g = compliance_group_verdicts(df, "v", "c", expr="v > 0", by="grp",
                                  min_rate=0.9, min_count=5)
    assert {r.partition_id: r.passed for r in g.collect()} == \
        {p: ok for p, (ok, _) in verd.items()}


def test_spec_validation(spark):
    for bad in (
        {"min": 0.9},                       # no expr
        {"expr": "v > 0"},                  # no bound
        {"expr": "", "min": 0.9},
        {"expr": "v > 0", "min": 1.5},
        {"expr": "v > 0", "min": 0.9, "verdicts": "perGroup"},  # no by
        "v > 0",
    ):
        with pytest.raises(SuiteError):
            validate_suite_spec({"properties": {"v": {
                "x-compliance": bad}}})
    validate_suite_spec({"properties": {"v": {"x-compliance": {
        "expr": "v > 0 AND v < 100", "min": 0.5, "max": 0.99,
        "by": "g", "minCount": 10, "verdicts": "perGroup"}}}})


def test_where_scoping(spark):
    """Deequ-style subpopulation scoping: `where` narrows the rate
    check to the rows it governs; out-of-scope rows neither help nor
    hurt the budget."""
    df = _df(spark)
    # globally the dirty group drags the rate under 0.9; scoped to the
    # clean group alone, the budget holds
    scoped = {"properties": {"v": {"x-compliance": {
        "expr": "v > 0", "min": 0.9, "where": "grp = 'clean'"}}}}
    assert CheckSuite(scoped).run(df, key="id").ok()
    unscoped = {"properties": {"v": {"x-compliance": {
        "expr": "v > 0", "min": 0.9}}}}
    assert not CheckSuite(unscoped).run(df, key="id").ok()

    # scoping + perGroup: only in-scope groups are enumerated
    per = CheckSuite({"properties": {"v": {"x-compliance": {
        "expr": "v > 0", "min": 0.9, "by": "grp",
        "where": "grp IN ('clean', 'dirty')",
        "verdicts": "perGroup"}}}}).run(df, key="id")
    verd = {r.partition_id: r.passed for r in per.verdicts.collect()}
    assert verd == {"clean": True, "dirty": False}

    # scoping on x-distinctRatio and x-trend rides the same hook
    from jsonschema_valid_spark.suite.spec import validate_suite_spec
    validate_suite_spec({"properties": {"v": {"x-distinctRatio": {
        "min": 0.5, "where": "grp = 'clean'"}}}})
    validate_suite_spec({"properties": {"v": {"x-trend": {
        "orderBy": "id", "max": 1.0, "where": "grp = 'clean'"}}}})
    sc = CheckSuite({"properties": {"v": {"x-distinctRatio": {
        "min": 0.99, "where": "grp = 'clean'"}}}}).run(df, key="id")
    assert sc.ok()  # clean group's values are all distinct

    with pytest.raises(SuiteError):
        validate_suite_spec({"properties": {"v": {"x-compliance": {
            "expr": "v > 0", "min": 0.9, "where": ""}}}})
