"""x-freshness: per-group max-timestamp recency vs a DECLARED as-of instant
(operators/freshness.py + engine wiring in both run paths).

Staleness is the absence of recent rows — invisible to every row-scope
check. The reference instant is declared in the suite (never wall clock) so
runs are reproducible and oracle-replayable.
"""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from jsonschema_valid_spark import CheckSuite
from jsonschema_valid_spark.engine import run_suite_summarized
from jsonschema_valid_spark.suite.metaschema import validate_suite_with_engine
from jsonschema_valid_spark.suite.spec import SuiteError, validate_suite_spec


def _df(spark):
    # 'a' fresh (23:30), 'b' stale (stopped at 10:00), 'c' only NULL ts,
    # 'd' future-dated (next day 02:00 — beyond the 1 h skew allowance)
    rows = [
        (1, "a", datetime(2024, 1, 30, 22, 0)),
        (2, "a", datetime(2024, 1, 30, 23, 30)),
        (3, "b", datetime(2024, 1, 30, 10, 0)),
        (4, "c", None),
        (5, "d", datetime(2024, 1, 31, 2, 0)),
    ]
    return spark.createDataFrame(
        rows, "doc_id: long, source: string, ts: timestamp")


_SPEC = {"properties": {"ts": {"x-freshness": {
    "asOf": "2024-01-31 00:00:00", "maxAgeHours": 2, "by": "source",
    "maxFutureHours": 1}}}}


def test_violations_and_verdict(spark):
    res = CheckSuite(_SPEC).run(_df(spark), key="doc_id")
    viol = {r["doc_id"]: r for r in res.violations.collect()}
    assert set(viol) == {"b", "c", "d"}
    assert viol["b"]["observed"] == "stale:2024-01-30 10:00:00"
    assert viol["c"]["observed"] == "stale"          # all-NULL ts group
    assert viol["d"]["observed"] == "future:2024-01-31 02:00:00"
    cid = "properties/ts/x-freshness"
    verd = [r for r in res.verdicts.collect() if r["check_id"] == cid]
    assert len(verd) == 1
    assert verd[0]["partition_id"] == "<global>"
    assert not verd[0]["passed"] and verd[0]["metric_value"] == 3.0


def test_global_group_and_no_future_check(spark):
    # whole-table freshness: max ts is 'd''s future row, which keeps the
    # table fresh and is NOT flagged without maxFutureHours
    spec = {"properties": {"ts": {"x-freshness": {
        "asOf": "2024-01-31 00:00:00", "maxAgeHours": 2}}}}
    res = CheckSuite(spec).run(_df(spark), key="doc_id")
    assert res.violations.count() == 0
    assert res.ok()

    stale = {"properties": {"ts": {"x-freshness": {
        "asOf": "2024-02-10 00:00:00", "maxAgeHours": 2}}}}
    res = CheckSuite(stale).run(_df(spark), key="doc_id")
    rows = res.violations.collect()
    assert len(rows) == 1 and rows[0]["doc_id"] == "<global>"
    assert rows[0]["observed"] == "stale:2024-01-31 02:00:00"


def test_summarized_parity(spark):
    df = _df(spark)
    lazy = CheckSuite(_SPEC).run(df, key="doc_id")
    summ = run_suite_summarized(CheckSuite(_SPEC), df, key="doc_id")
    cols = ["doc_id", "check_id", "observed", "expected"]
    assert (sorted(map(tuple, lazy.violations.select(*cols).collect()))
            == sorted(map(tuple, summ.violations.select(*cols).collect())))


def test_single_aggregate_no_join(spark):
    """Scale contract: one partial-combined max() aggregate, no join — the
    plan must contain an Aggregate and no Join of any kind."""
    res = CheckSuite(_SPEC).run(_df(spark), key="doc_id")
    plan = res.violations._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


@pytest.mark.parametrize("bad", [
    {"maxAgeHours": 2},                              # asOf absent
    {"asOf": "not a date", "maxAgeHours": 2},        # unparseable asOf
    {"asOf": "2024-01-31 00:00:00"},                 # maxAgeHours absent
    {"asOf": "2024-01-31 00:00:00", "maxAgeHours": True},  # bool
    "2024-01-31",                                    # not an object
])
def test_spec_validation_rejects(bad):
    with pytest.raises(SuiteError):
        validate_suite_spec({"properties": {"ts": {"x-freshness": bad}}})


def test_spec_and_metaschema_accept(spark):
    validate_suite_spec(_SPEC)  # walker
    assert validate_suite_with_engine(spark, _SPEC).ok()  # self-hosted


def test_pergroup_verdicts_both_paths(spark):
    spec = {"properties": {"ts": {"x-freshness": {
        "asOf": "2024-01-31 00:00:00", "maxAgeHours": 2, "by": "source",
        "maxFutureHours": 1, "verdicts": "perGroup"}}}}
    df = _df(spark)
    res = CheckSuite(spec).run(df, key="doc_id")
    verd = {r["partition_id"]: r for r in res.verdicts.collect()}
    # every group enumerated: fresh 'a' passes; stale 'b', all-NULL 'c',
    # future 'd' fail; threshold carries the declared bound
    assert set(verd) == {"a", "b", "c", "d"}
    assert verd["a"]["passed"] and not verd["b"]["passed"]
    assert not verd["c"]["passed"] and not verd["d"]["passed"]
    assert abs(verd["a"]["metric_value"] - 0.5) < 1e-9   # 23:30 -> 00:00
    assert abs(verd["b"]["metric_value"] - 14.0) < 1e-9
    assert verd["c"]["metric_value"] is None
    assert abs(verd["d"]["metric_value"] - (-2.0)) < 1e-9
    assert all(r["threshold"] == 2.0 for r in verd.values())
    summ = run_suite_summarized(CheckSuite(spec), df, key="doc_id")
    sv = {r["partition_id"]: (r["passed"], r["metric_value"])
          for r in summ.verdicts.collect()
          if r["check_id"] == "properties/ts/x-freshness"}
    assert sv == {k: (r["passed"], r["metric_value"])
                  for k, r in verd.items()}


def test_pergroup_requires_by():
    with pytest.raises(SuiteError):
        validate_suite_spec({"properties": {"ts": {"x-freshness": {
            "asOf": "2024-01-31 00:00:00", "maxAgeHours": 2,
            "verdicts": "perGroup"}}}})
