"""x-partitionComplete: declared-partition presence as a declarative suite
keyword (operators/consistency.py completeness_violations + engine wiring in
both run paths).

Dataset scope by necessity: a missing partition has NO rows for any
row-scope check to flag — ≙ the reference's `required` lifted from object
keys to table partitions (validators.rs `required` reports the absent
name; here the violating "document" IS the absent partition value).
"""

import pytest
from pyspark.sql import functions as F

from jsonschema_valid_spark import CheckSuite
from jsonschema_valid_spark.engine import run_suite_summarized
from jsonschema_valid_spark.suite.metaschema import validate_suite_with_engine
from jsonschema_valid_spark.suite.spec import SuiteError, validate_suite_spec


def _df(spark):
    # 'a': 3 rows (ok), 'b': 1 row (under minRows=2), 'z': 2 rows
    # (undeclared), 'c': declared but absent (missing)
    rows = [(1, "a"), (2, "a"), (3, "a"), (4, "b"), (5, "z"), (6, "z")]
    return spark.createDataFrame(rows, "doc_id: long, source: string")


_SPEC = {"properties": {"source": {
    "x-partitionComplete": {"expected": ["a", "b", "c"], "minRows": 2}}}}


def test_violations_and_verdict(spark):
    res = CheckSuite(_SPEC).run(_df(spark), key="doc_id")
    viol = {r["doc_id"]: r for r in res.violations.collect()}
    assert set(viol) == {"b", "c", "z"}
    assert viol["c"]["observed"] == "missing:0"
    assert viol["b"]["observed"] == "under:1"
    assert viol["z"]["observed"] == "unexpected:2"
    cid = "properties/source/x-partitionComplete"
    assert all(r["check_id"] == cid for r in viol.values())
    verd = [r for r in res.verdicts.collect() if r["check_id"] == cid]
    assert len(verd) == 1
    assert verd[0]["partition_id"] == "<global>"
    assert not verd[0]["passed"] and verd[0]["metric_value"] == 3.0


def test_allow_unexpected(spark):
    spec = {"properties": {"source": {"x-partitionComplete": {
        "expected": ["a", "b", "c"], "minRows": 2,
        "allowUnexpected": True}}}}
    res = CheckSuite(spec).run(_df(spark), key="doc_id")
    assert {r["doc_id"] for r in res.violations.collect()} == {"b", "c"}


def test_expected_from_context(spark):
    spec = {"properties": {"source": {
        "x-partitionComplete": {"expected": "@domain"}}}}
    domain = spark.createDataFrame([("a",), ("b",), ("q",)],
                                   "source: string")
    res = CheckSuite(spec).run(_df(spark), key="doc_id",
                               context={"domain": domain})
    viol = {r["doc_id"]: r["observed"] for r in res.violations.collect()}
    assert viol == {"q": "missing:0", "z": "unexpected:2"}


def test_summarized_parity(spark):
    df = _df(spark)
    lazy = CheckSuite(_SPEC).run(df, key="doc_id")
    summ = run_suite_summarized(CheckSuite(_SPEC), df, key="doc_id")
    cols = ["doc_id", "check_id", "observed", "expected"]
    assert (sorted(map(tuple, lazy.violations.select(*cols).collect()))
            == sorted(map(tuple, summ.violations.select(*cols).collect())))


def test_passing_table_is_green(spark):
    spec = {"properties": {"source": {"x-partitionComplete": {
        "expected": ["a", "b", "z"], "allowUnexpected": False}}}}
    res = CheckSuite(spec).run(_df(spark), key="doc_id")
    assert res.violations.count() == 0
    assert res.ok()


@pytest.mark.parametrize("bad", [
    {"expected": []},            # empty domain
    {"expected": "abc"},         # bare string (not @name)
    {"minRows": 2},              # expected absent
    ["a", "b"],                  # not an object
])
def test_spec_validation_rejects(bad):
    with pytest.raises(SuiteError):
        validate_suite_spec({"properties": {"source": {
            "x-partitionComplete": bad}}})


def test_spec_and_metaschema_accept(spark):
    validate_suite_spec(_SPEC)  # walker
    assert validate_suite_with_engine(spark, _SPEC).ok()  # self-hosted
