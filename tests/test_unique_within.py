"""x-unique withinSeconds: time-scoped uniqueness (wave 13)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from jsonschema_valid_spark import CheckSuite
from jsonschema_valid_spark.operators.uniqueness import (
    recent_duplicate_violations,
)
from jsonschema_valid_spark.suite.spec import SuiteError, validate_suite_spec


def _ts(seconds):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=seconds)


def test_recent_duplicate_semantics(spark):
    rows = [
        ("a", _ts(0), 1),
        ("a", _ts(60), 2),     # gap == 60s: violation (<= boundary)
        ("a", _ts(121), 3),    # gap 61s: pass (strictly greater)
        ("b", _ts(0), 4),
        (None, _ts(1), 5),     # NULL value: exempt
        ("b", None, 6),        # NULL ts: exempt, does not break b's chain
        ("b", _ts(30), 7),     # 30s after b@0: violation
    ]
    df = spark.createDataFrame(rows, "v string, ts timestamp, id long")
    out = recent_duplicate_violations(df, "v", "c", key="id", ts="ts",
                                      within_seconds=60.0)
    got = {r.doc_id: r.observed for r in out.collect()}
    assert set(got) == {"2", "7"}
    assert got["2"] == "value=a,gap_us=60000000"
    assert got["7"] == "value=b,gap_us=30000000"


def test_keyword_dispatch_not_swallowed_by_exact_unique(spark):
    # regression: {"withinSeconds": ...} must compile to the time-scoped
    # check, NOT fall into the exact-unique dict branch (which would
    # flag every recurring value regardless of gap)
    rows = [("a", _ts(0), 1), ("a", _ts(7200), 2)]
    df = spark.createDataFrame(rows, "v string, ts timestamp, id long")
    res = CheckSuite({"properties": {"v": {"x-unique": {
        "withinSeconds": 60, "ts": "ts"}}}}).run(df, key="id")
    assert res.violations.count() == 0      # 2h apart: legal recurrence
    assert res.ok()
    exact = CheckSuite({"properties": {"v": {"x-unique": True}}}) \
        .run(df, key="id")
    assert not exact.ok()                    # global uniqueness still fails


def test_by_scopes_recurrence(spark):
    rows = [("a", "u1", _ts(0), 1), ("a", "u2", _ts(10), 2),
            ("a", "u1", _ts(20), 3)]
    df = spark.createDataFrame(rows, "v string, u string, ts timestamp, id long")
    out = recent_duplicate_violations(df, "v", "c", key="id", ts="ts",
                                      within_seconds=60.0, by="u")
    # cross-user recurrence at 10s is fine; same-user at 20s violates
    assert [r.doc_id for r in out.collect()] == ["3"]


def test_single_exchange_no_join(spark):
    df = spark.range(100).select(
        (F.col("id") % 7).cast("string").alias("v"),
        F.timestamp_micros(F.col("id") * 1_000_000).alias("ts"),
        F.col("id"))
    out = recent_duplicate_violations(df, "v", "c", key="id", ts="ts",
                                      within_seconds=5.0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Join" not in plan


def test_spec_validation():
    for bad in (
        {"withinSeconds": 60},                      # ts missing
        {"withinSeconds": 0, "ts": "ts"},           # non-positive
        {"withinSeconds": True, "ts": "ts"},
        {"withinSeconds": 60, "ts": "ts", "approx": True},  # exclusive
    ):
        with pytest.raises(SuiteError):
            validate_suite_spec({"properties": {"v": {"x-unique": bad}}})
    # the three legacy forms stay valid
    for good in (True, {"approx": True}, {"withinSeconds": 60, "ts": "t"}):
        validate_suite_spec({"properties": {"v": {"x-unique": good}}})
