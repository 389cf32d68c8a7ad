"""x-aggConsistency: a derived parent column must equal a per-key child-table
aggregate — as a declarative suite keyword (operators/consistency.py
aggregate_violations + engine wiring in both run paths).

The dataset lift of `const` (validators.rs compares instance == literal;
here the expected value is COMPUTED per key from another table). Scale
contract inherited from aggregate_consistency: the child collapses to one
row per key via partial-aggregated groupBy BEFORE the join — row data never
joins at row grain.
"""

import pytest
from pyspark.sql import functions as F

from jsonschema_valid_spark import CheckSuite
from jsonschema_valid_spark.engine import run_suite_summarized
from jsonschema_valid_spark.suite.metaschema import validate_suite_with_engine
from jsonschema_valid_spark.suite.spec import SuiteError, validate_suite_spec


def _orders(spark):
    # k=1 consistent (10+20), k=2 off by 5, k=3 has no child rows
    rows = [(1, 30.0), (2, 50.0), (3, 7.0)]
    return spark.createDataFrame(rows, "ok: long, total: double")


def _items(spark):
    # k=4 is an orphaned child key
    rows = [(1, 10.0), (1, 20.0), (2, 45.0), (4, 99.0)]
    return spark.createDataFrame(rows, "ik: long, amount: double")


_SPEC = {"properties": {"total": {"x-aggConsistency": {
    "child": "@items", "key": "ok", "childKey": "ik",
    "childAgg": "CAST(sum(CAST(amount AS DECIMAL(18,2))) AS DECIMAL(18,2))",
    "parentExpr": "CAST(total AS DECIMAL(18,2))",
    "tol": 0.001}}}}


def test_violations_and_verdict(spark):
    res = CheckSuite(_SPEC).run(
        _orders(spark), key="ok", context={"items": _items(spark)})
    viol = {r["doc_id"]: r for r in res.violations.collect()}
    assert set(viol) == {"2", "3", "4"}
    assert viol["2"]["observed"] == "mismatch:50.00!=45.00"
    assert viol["3"]["observed"] == "parent_only:7.00"
    assert viol["4"]["observed"] == "child_only:99.00"
    cid = "properties/total/x-aggConsistency"
    assert all(r["check_id"] == cid for r in viol.values())
    verd = [r for r in res.verdicts.collect() if r["check_id"] == cid]
    assert len(verd) == 1
    assert verd[0]["partition_id"] == "<global>"
    assert not verd[0]["passed"] and verd[0]["metric_value"] == 3.0


def test_allow_flags(spark):
    spec = {"properties": {"total": {"x-aggConsistency": {
        "child": "@items", "key": "ok", "childKey": "ik",
        "childAgg": "CAST(sum(CAST(amount AS DECIMAL(18,2))) "
                    "AS DECIMAL(18,2))",
        "parentExpr": "CAST(total AS DECIMAL(18,2))",
        "tol": 0.001, "allowParentOnly": True, "allowChildOnly": True}}}}
    res = CheckSuite(spec).run(
        _orders(spark), key="ok", context={"items": _items(spark)})
    assert {r["doc_id"] for r in res.violations.collect()} == {"2"}


def test_tolerance_absorbs_diff(spark):
    spec = {"properties": {"total": {"x-aggConsistency": {
        "child": "@items", "key": "ok", "childKey": "ik",
        "childAgg": "sum(amount)", "tol": 10.0,
        "allowParentOnly": True, "allowChildOnly": True}}}}
    res = CheckSuite(spec).run(
        _orders(spark), key="ok", context={"items": _items(spark)})
    assert res.violations.count() == 0
    assert res.ok()


def test_summarized_parity(spark):
    orders, items = _orders(spark), _items(spark)
    lazy = CheckSuite(_SPEC).run(orders, key="ok",
                                 context={"items": items})
    summ = run_suite_summarized(CheckSuite(_SPEC), orders, key="ok",
                                context={"items": items})
    cols = ["doc_id", "check_id", "observed", "expected"]
    assert (sorted(map(tuple, lazy.violations.select(*cols).collect()))
            == sorted(map(tuple, summ.violations.select(*cols).collect())))


def test_child_never_joins_at_row_grain(spark):
    """Scale contract: the child side of the join is the AGGREGATED
    per-key frame — a partial-combine Aggregate sits below the join on the
    child branch."""
    res = CheckSuite(_SPEC).run(
        _orders(spark), key="ok", context={"items": _items(spark)})
    plan = res.violations._jdf.queryExecution().executedPlan().toString()
    assert "Aggregate" in plan or "HashAggregate" in plan


@pytest.mark.parametrize("bad", [
    {"child": "@items", "key": "ok", "childKey": "ik"},   # childAgg absent
    {"child": "items", "key": "ok", "childKey": "ik",
     "childAgg": "sum(amount)"},                           # bare child name
    {"child": "@items", "childAgg": "sum(amount)"},        # keys absent
    "sum(amount)",                                         # not an object
])
def test_spec_validation_rejects(bad):
    with pytest.raises(SuiteError):
        validate_suite_spec({"properties": {"total": {
            "x-aggConsistency": bad}}})


def test_spec_and_metaschema_accept(spark):
    validate_suite_spec(_SPEC)  # walker
    assert validate_suite_with_engine(spark, _SPEC).ok()  # self-hosted
