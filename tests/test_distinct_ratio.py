"""x-distinctRatio: distinct/count rate bounds (wave 20) — the soft
x-unique, as x-nullRate is the soft `required`."""

import pytest
from pyspark.sql import functions as F

from jsonschema_valid_spark import CheckSuite
from jsonschema_valid_spark.engine import run_suite_summarized
from jsonschema_valid_spark.operators.cardinality import (
    distinct_ratio_violations,
)
from jsonschema_valid_spark.suite.spec import SuiteError, validate_suite_spec


def _df(spark):
    rows = []
    for i in range(100):
        rows.append((i, "healthy", i))            # ratio 1.0
        rows.append((1000 + i, "fanout", i % 5))  # ratio 0.05
        rows.append((2000 + i, "mixed", i % 50))  # ratio 0.5
    rows.append((3000, "tiny", 1))
    return spark.createDataFrame(rows, "id: long, grp: string, v: long")


def test_ratio_bounds_and_exactness(spark):
    df = _df(spark)
    v = distinct_ratio_violations(df, "v", "c", by="grp", min_ratio=0.4)
    got = {r.doc_id: r.observed for r in v.collect()}
    assert set(got) == {"fanout"}
    assert got["fanout"] == "ratio=0.050000,distinct=5,n=100"

    # max bound: the all-distinct group trips ("session labels should
    # repeat — all-distinct means the sessionizer broke")
    vmax = distinct_ratio_violations(df, "v", "c", by="grp",
                                     max_ratio=0.9, min_count=2)
    assert {r.doc_id for r in vmax.collect()} == {"healthy"}

    # min_count suppression: the singleton group (ratio 1.0) is silent
    # under max until relaxed
    vall = distinct_ratio_violations(df, "v", "c", by="grp",
                                     max_ratio=0.9, min_count=1)
    assert {r.doc_id for r in vall.collect()} == {"healthy", "tiny"}


def test_nulls_excluded_and_global_scope(spark):
    df = spark.createDataFrame(
        [(1, 1), (2, 1), (3, None), (4, None)], "id: long, v: long")
    # NULLs out of both numerator and denominator: 1 distinct / 2 rows
    rows = distinct_ratio_violations(df, "v", "c", min_ratio=0.9).collect()
    assert [r.doc_id for r in rows] == ["<global>"]
    assert rows[0].observed == "ratio=0.500000,distinct=1,n=2"


def test_keyword_both_paths_and_approx(spark):
    df = _df(spark)
    spec = {"properties": {"v": {"x-distinctRatio": {
        "min": 0.4, "by": "grp"}}}}
    res = CheckSuite(spec).run(df, key="id")
    assert {r.doc_id for r in res.violations.collect()} == {"fanout"}
    verd = {r.check_id: r.passed for r in res.verdicts.collect()}
    assert verd["properties/v/x-distinctRatio"] is False
    summ = run_suite_summarized(CheckSuite(spec), df, key="id")
    assert {r.doc_id for r in summ.violations.collect()} == {"fanout"}

    # approx mode: HLL is exact at these cardinalities; observed says so
    av = distinct_ratio_violations(df, "v", "c", by="grp",
                                   min_ratio=0.4, approx=True)
    got = {r.doc_id for r in av.collect()}
    assert "fanout" in got
    aspec = {"properties": {"v": {"x-distinctRatio": {
        "min": 0.4, "by": "grp", "approx": True}}}}
    assert CheckSuite(aspec).run(df, key="id").ok() is False


def test_plan_is_one_aggregate(spark):
    df = _df(spark)
    v = distinct_ratio_violations(df, "v", "c", by="grp", min_ratio=0.4)
    plan = v._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan and "Window" not in plan
    # approx mode needs no Expand (the exact-distinct rewrite does)
    av = distinct_ratio_violations(df, "v", "c", by="grp",
                                   min_ratio=0.4, approx=True)
    aplan = av._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in aplan


def test_spec_validation(spark):
    for bad in (
        {},                               # no bound
        {"min": 1.5},                     # out of [0, 1]
        {"min": True},
        {"min": 0.5, "minCount": 0},
        {"min": 0.5, "approx": "yes"},
        "0.5",
    ):
        with pytest.raises(SuiteError):
            validate_suite_spec({"properties": {"v": {
                "x-distinctRatio": bad}}})
    validate_suite_spec({"properties": {"v": {"x-distinctRatio": {
        "min": 0.1, "max": 0.9, "by": "g", "approx": True,
        "minCount": 10}}}})


def test_pergroup_verdicts(spark):
    df = _df(spark)
    spec = {"properties": {"v": {"x-distinctRatio": {
        "min": 0.4, "by": "grp", "verdicts": "perGroup"}}}}
    res = CheckSuite(spec).run(df, key="id")
    verd = {r.partition_id: (r.passed, r.metric_value)
            for r in res.verdicts.collect()}
    # every group enumerated (no <global> roll-up), passing ones included
    assert set(verd) == {"healthy", "fanout", "mixed", "tiny"}
    assert verd["fanout"][0] is False
    assert verd["fanout"][1] == pytest.approx(0.05)
    assert verd["healthy"][0] is True and verd["tiny"][0] is True
    # summarized path agrees
    summ = run_suite_summarized(CheckSuite(spec), df, key="id")
    sv = {r.partition_id: r.passed for r in summ.verdicts.collect()
          if r.check_id == "properties/v/x-distinctRatio"}
    assert sv == {p: ok for p, (ok, _) in verd.items()}
    # perGroup without by is rejected at spec time
    with pytest.raises(SuiteError):
        validate_suite_spec({"properties": {"v": {"x-distinctRatio": {
            "min": 0.4, "verdicts": "perGroup"}}}})


def test_all_null_group_suppressed(spark):
    df = spark.createDataFrame(
        [(1, "a", 1), (2, "a", 2), (3, "b", None)],
        "id: long, grp: string, v: long")
    # group b has zero non-NULL values: undefined ratio, no ANSI
    # divide-by-zero, suppressed in violations, passes in verdicts
    v = distinct_ratio_violations(df, "v", "c", by="grp", min_ratio=0.9)
    assert {r.doc_id for r in v.collect()} == set()
    from jsonschema_valid_spark.operators.cardinality import (
        distinct_ratio_group_verdicts,
    )
    g = {r.partition_id: r.passed
         for r in distinct_ratio_group_verdicts(
             df, "v", "c", by="grp", min_ratio=0.9).collect()}
    assert g == {"a": True, "b": True}
