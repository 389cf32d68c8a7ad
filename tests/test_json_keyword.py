"""x-jsonWellFormed: JSON validity of a string metadata column (compiler
row-check branch over Catalyst's variant parser) — rides the fused row pass
shuffle-free."""

import pytest

from jsonschema_valid_spark import CheckSuite
from jsonschema_valid_spark.suite.metaschema import validate_suite_with_engine
from jsonschema_valid_spark.suite.spec import SuiteError, validate_suite_spec

_SPEC = {"properties": {"props": {"x-jsonWellFormed": True}}}


def _df(spark):
    rows = [
        (1, '{"k": 1}'),      # object
        (2, '{"k": 1'),       # truncated -> violation
        (3, ""),              # empty string -> violation
        (4, None),            # NULL passes (required/x-nullRate police it)
        (5, "[1, 2]"),        # array
        (6, "5"),             # scalar
        (7, "tru"),           # garbage -> violation
        (8, '"s"'),           # string scalar
    ]
    return spark.createDataFrame(rows, "doc_id: long, props: string")


def test_witnesses_and_pass_cases(spark):
    res = CheckSuite(_SPEC).run(_df(spark), key="doc_id")
    got = {r["doc_id"]: r["observed"] for r in res.violations.collect()}
    assert got == {"2": '{"k": 1', "3": "", "7": "tru"}
    cid = "properties/props/x-jsonWellFormed"
    assert all(r["check_id"] == cid for r in res.violations.collect())


def test_rides_fused_row_pass_no_shuffle(spark):
    res = CheckSuite(_SPEC).run(_df(spark), key="doc_id")
    plan = res.violations._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan


@pytest.mark.parametrize("bad", [False, 1, "true", {}, {"schema": "k INT"}])
def test_spec_validation_rejects(bad):
    with pytest.raises(SuiteError):
        validate_suite_spec({"properties": {"p": {"x-jsonWellFormed": bad}}})


def test_spec_and_metaschema_accept(spark):
    validate_suite_spec(_SPEC)
    assert validate_suite_with_engine(spark, _SPEC).ok()
