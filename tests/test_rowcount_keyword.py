"""x-rowCount: table/group cardinality bounds (operators/cardinality.py +
engine wiring in both paths) — the dataset lift of minItems/maxItems."""

import pytest

from jsonschema_valid_spark import CheckSuite
from jsonschema_valid_spark.engine import run_suite_summarized
from jsonschema_valid_spark.operators.cardinality import row_count_violations
from jsonschema_valid_spark.suite.metaschema import validate_suite_with_engine
from jsonschema_valid_spark.suite.spec import SuiteError, validate_suite_spec


def _df(spark):
    # a: 3 rows, b: 1 row, NULL: 2 rows
    rows = [(1, "a"), (2, "a"), (3, "a"), (4, "b"), (5, None), (6, None)]
    return spark.createDataFrame(rows, "doc_id: long, src: string")


_SPEC = {"properties": {"src": {"x-rowCount": {"min": 2, "max": 2}}}}


def test_group_bounds_and_verdict(spark):
    res = CheckSuite(_SPEC).run(_df(spark), key="doc_id")
    got = {r["doc_id"]: r["observed"] for r in res.violations.collect()}
    assert got == {"a": "count=3", "b": "count=1"}  # NULL group: exactly 2
    cid = "properties/src/x-rowCount"
    verd = [r for r in res.verdicts.collect() if r["check_id"] == cid]
    assert len(verd) == 1 and not verd[0]["passed"]
    assert verd[0]["metric_value"] == 2.0


def test_null_group_and_min_only(spark):
    spec = {"properties": {"src": {"x-rowCount": {"min": 3}}}}
    res = CheckSuite(spec).run(_df(spark), key="doc_id")
    got = {r["doc_id"]: r["observed"] for r in res.violations.collect()}
    assert got == {"b": "count=1", "<null>": "count=2"}


def test_table_scope(spark):
    spec = {"properties": {"src": {"x-rowCount": {
        "max": 5, "scope": "table"}}}}
    res = CheckSuite(spec).run(_df(spark), key="doc_id")
    got = [(r["doc_id"], r["observed"]) for r in res.violations.collect()]
    assert got == [("<global>", "count=6")]
    spec = {"properties": {"src": {"x-rowCount": {
        "min": 6, "max": 6, "scope": "table"}}}}
    assert CheckSuite(spec).run(_df(spark), key="doc_id").ok()


def test_summarized_parity(spark):
    df = _df(spark)
    lazy = CheckSuite(_SPEC).run(df, key="doc_id")
    summ = run_suite_summarized(CheckSuite(_SPEC), df, key="doc_id")
    cols = ["doc_id", "check_id", "observed", "expected"]
    assert (sorted(map(tuple, lazy.violations.select(*cols).collect()))
            == sorted(map(tuple, summ.violations.select(*cols).collect())))


def test_single_partial_agg_no_join(spark):
    out = row_count_violations(_df(spark), "src", "c", min_count=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange") <= 1  # partial+final count agg


def test_operator_rejects_bad_args(spark):
    with pytest.raises(ValueError):
        row_count_violations(_df(spark), "src", "c")
    with pytest.raises(ValueError):
        row_count_violations(_df(spark), "src", "c", min_count=1,
                             scope="partition")


@pytest.mark.parametrize("bad", [
    {},                              # no bound
    {"scope": "group"},              # no bound
    {"min": -1},                     # negative
    {"min": True},                   # bool
    {"min": 1, "scope": "rows"},     # bad scope
    {"min": 1, "limit": 2},          # unknown key
    5,                               # not an object
])
def test_spec_validation_rejects(bad):
    with pytest.raises(SuiteError):
        validate_suite_spec({"properties": {"src": {"x-rowCount": bad}}})


def test_spec_and_metaschema_accept(spark):
    validate_suite_spec(_SPEC)
    assert validate_suite_with_engine(spark, _SPEC).ok()


def test_pergroup_verdicts_both_paths(spark):
    spec = {"properties": {"src": {"x-rowCount": {
        "min": 2, "max": 2, "verdicts": "perGroup"}}}}
    df = _df(spark)
    res = CheckSuite(spec).run(df, key="doc_id")
    verd = {r["partition_id"]: (r["passed"], r["metric_value"])
            for r in res.verdicts.collect()}
    # every group enumerated, in-bounds ones passed=true; no <global> row
    assert verd == {"a": (False, 3.0), "b": (False, 1.0),
                    "<null>": (True, 2.0)}
    # violations unchanged (the failing groups)
    assert ({r["doc_id"] for r in res.violations.collect()} == {"a", "b"})
    summ = run_suite_summarized(CheckSuite(spec), df, key="doc_id")
    sv = {r["partition_id"]: (r["passed"], r["metric_value"])
          for r in summ.verdicts.collect()
          if r["check_id"] == "properties/src/x-rowCount"}
    assert sv == verd


def test_pergroup_requires_group_scope():
    with pytest.raises(SuiteError):
        validate_suite_spec({"properties": {"src": {"x-rowCount": {
            "min": 1, "scope": "table", "verdicts": "perGroup"}}}})
