"""Conformance-corpus harness — a lift of the reference's
JSON-Schema-Test-Suite driver (``/root/reference/src/lib.rs:114-160``):
each case file is ``[{description, suite, tests: [{description, rows,
valid, violations?}]}]``; the harness asserts the boolean verdict through
the engine AND that every case's suite passes suite-metaschema validation
(≙ ``lib.rs:148,153``)."""

import glob
import json
import os

import pytest

from jsonschema_valid_spark import CheckSuite
from jsonschema_valid_spark.suite.spec import validate_suite_spec

HERE = os.path.dirname(os.path.abspath(__file__))

CASES = []
for path in sorted(glob.glob(f"{HERE}/conformance/*.json")):
    fname = os.path.basename(path)
    with open(path) as f:
        for case in json.load(f):
            for t in case["tests"]:
                CASES.append(pytest.param(
                    case, t,
                    id=f"{fname}::{case['description'][:40]}::{t['description'][:40]}"))


@pytest.mark.parametrize("case,test", CASES)
def test_conformance(spark, case, test):
    # every suite must itself validate (≙ metaschema check, lib.rs:148)
    validate_suite_spec(case["suite"])

    schema = test.get("rows_schema", case["schema"])
    df = spark.createDataFrame(test["rows"], schema=schema)
    suite = CheckSuite(case["suite"])
    res = suite.run(df, key="id")

    assert res.ok() is test["valid"], (
        f"expected valid={test['valid']}; violations:\n{res.render()}")

    if "violations" in test:
        actual = {(r["doc_id"], r["check_id"])
                  for r in res.violations.collect()}
        for exp in test["violations"]:
            assert (exp["doc_id"], exp["check_id"]) in actual, (
                f"missing expected violation {exp}; actual={actual}")
    if test["valid"]:
        assert res.violations.isEmpty()
