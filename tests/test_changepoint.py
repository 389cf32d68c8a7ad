"""x-levelShift keyword + level_shifts operator (wave 11)."""

import pytest
from pyspark.sql import functions as F

from jsonschema_valid_spark import CheckSuite
from jsonschema_valid_spark.operators.changepoint import (
    level_shift_violations,
    level_shifts,
)
from jsonschema_valid_spark.suite.spec import SuiteError, validate_suite_spec


def _step_df(spark):
    # g1: flat 10.0 for 8 rows then a step to 50.0 for 8 rows
    rows = [(i, "g1", i, 10.0 if i < 8 else 50.0) for i in range(16)]
    # g2: flat with mild noise -> no shift beyond 1
    rows += [(100 + i, "g2", i, 20.0 + (i % 2) * 0.5) for i in range(16)]
    # g3: too short for two full windows -> silent
    rows += [(200 + i, "g3", i, float(i * 100)) for i in range(6)]
    return spark.createDataFrame(rows, "id: long, grp: string, seq: long, v: double")


def test_level_shift_detects_step_and_position(spark):
    df = _step_df(spark)
    v = level_shift_violations(df, "v", "c", key="id", order_by="seq",
                               by="grp", window=4, max_shift=5.0)
    got = {r.doc_id: r.observed for r in v.collect()}
    # only the stepped group fires; peak shift = full 40.0 jump once the
    # recent window sits entirely on the new level (rows 8..11, seq 11)
    assert set(got) == {"g1"}
    assert got["g1"] == "shift=40.0000,at=11"


def test_level_shift_edges_silent(spark):
    df = _step_df(spark).where(F.col("grp") == "g3")
    s = level_shifts(df, "v", order_by="seq", key="id", by="grp",
                     window=4)
    # 6 rows < 2 windows of 4: every shift is NULL (edges are silent,
    # not false alarms) even though the series itself is wild
    assert s.where(F.col("__shift").isNotNull()).count() == 0


def test_level_shift_keyword_and_plan(spark):
    df = _step_df(spark)
    res = CheckSuite({"properties": {"v": {"x-levelShift": {
        "orderBy": "seq", "by": "grp", "window": 4,
        "maxShift": 5.0}}}}).run(df, key="id")
    assert [r["doc_id"] for r in res.violations.collect()] == ["g1"]
    assert not res.ok()
    v = level_shift_violations(df, "v", "c", key="id", order_by="seq",
                               by="grp", window=4, max_shift=5.0)
    plan = v._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Join" not in plan


def test_level_shift_spec_validation():
    for bad in (
        {"maxShift": 5},                      # orderBy missing
        {"orderBy": "m"},                     # maxShift missing
        {"orderBy": "m", "maxShift": 0},      # non-positive
        {"orderBy": "m", "maxShift": 5, "window": 1},
        "m",
    ):
        with pytest.raises(SuiteError):
            validate_suite_spec(
                {"properties": {"v": {"x-levelShift": bad}}})
