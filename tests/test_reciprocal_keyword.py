"""x-reciprocal: every observed (a, b) pair must also occur reversed
(wave 32) — pair symmetry for edge tables / double-entry mirrors."""

import pytest
from pyspark.sql import functions as F

from jsonschema_valid_spark import CheckSuite
from jsonschema_valid_spark.engine import run_suite_summarized
from jsonschema_valid_spark.operators.reciprocity import (
    reciprocity_group_verdicts,
    reciprocity_violations,
)
from jsonschema_valid_spark.suite.spec import SuiteError, validate_suite_spec


def _edges(spark):
    # g0: symmetric pairs (1,2)/(2,1), (3,4)/(4,3) + self-loop (5,5)
    # g0: one-way (6,7)            -> violation (missing 7->6)
    # g1: (1,2) twice, (2,1) once  -> symmetric, but matchCounts trips
    # g1: one-way reversed (9,8)   -> violation
    # NULL endpoint rows excluded from the pair domain
    rows = [
        ("g0", 1, 2), ("g0", 2, 1), ("g0", 3, 4), ("g0", 4, 3),
        ("g0", 5, 5), ("g0", 6, 7),
        ("g1", 1, 2), ("g1", 1, 2), ("g1", 2, 1), ("g1", 9, 8),
        ("g0", None, 1), ("g0", 1, None),
    ]
    return spark.createDataFrame(rows, "grp: string, a: int, b: int")


def test_violations_presence_form(spark):
    df = _edges(spark)
    v = reciprocity_violations(df, "a", "c", with_col="b", by="grp")
    got = {r.doc_id: r.observed for r in v.collect()}
    assert got == {"g0|6|7": "fwd=1,rev=0", "g1|8|9": "fwd=0,rev=1"}


def test_self_pairs_never_violate(spark):
    df = _edges(spark).where("a = 5")
    assert reciprocity_violations(
        df, "a", "c", with_col="b", by="grp").count() == 0


def test_match_counts_form(spark):
    df = _edges(spark)
    v = reciprocity_violations(df, "a", "c", with_col="b", by="grp",
                               match_counts=True)
    got = {r.doc_id: r.observed for r in v.collect()}
    assert got == {"g0|6|7": "fwd=1,rev=0",
                   "g1|1|2": "fwd=2,rev=1",
                   "g1|8|9": "fwd=0,rev=1"}


def test_global_scope_no_by(spark):
    # without by, cells pool across groups: {1,2} has fwd=3/rev=2 ->
    # present both ways; only the truly one-way pairs remain
    df = _edges(spark)
    v = reciprocity_violations(df, "a", "c", with_col="b")
    got = {r.doc_id: r.observed for r in v.collect()}
    assert got == {"6|7": "fwd=1,rev=0", "8|9": "fwd=0,rev=1"}


def test_group_verdicts_share(spark):
    df = _edges(spark)
    g = reciprocity_group_verdicts(df, "a", "c", with_col="b", by="grp",
                                   min_share=0.9)
    got = {r.partition_id: (r.passed, round(r.metric_value, 6))
           for r in g.collect()}
    # g0 non-self cells: {1,2}, {3,4}, {6,7} -> 2/3 reciprocated
    # g1 non-self cells: {1,2}, {8,9}        -> 1/2
    assert got == {"g0": (False, round(2 / 3, 6)),
                   "g1": (False, 0.5)}
    g2 = reciprocity_group_verdicts(df, "a", "c", with_col="b", by="grp",
                                    min_share=0.5)
    got2 = {r.partition_id: r.passed for r in g2.collect()}
    assert got2 == {"g0": True, "g1": True}


def test_type_mismatch_refused(spark):
    df = _edges(spark).withColumn("s", F.col("b").cast("string"))
    with pytest.raises(ValueError, match="share a type"):
        reciprocity_violations(df, "a", "c", with_col="s")


def test_keyword_both_paths_and_where(spark):
    df = _edges(spark)
    spec = {"properties": {"a": {"x-reciprocal": {
        "with": "b", "by": "grp", "where": "grp = 'g0'"}}}}
    suite = CheckSuite(spec)
    res = suite.run(df, key="a")
    docs = {r.doc_id for r in res.violations.collect()}
    assert docs == {"g0|6|7"}  # g1 scoped out
    summ = run_suite_summarized(CheckSuite(spec), df, key="a")
    assert {r.doc_id for r in summ.violations.collect()} == {"g0|6|7"}
    vids = {r.check_id for r in summ.verdicts.collect()}
    assert any("x-reciprocal" in c for c in vids)


def test_keyword_pergroup_verdicts(spark):
    df = _edges(spark)
    spec = {"properties": {"a": {"x-reciprocal": {
        "with": "b", "by": "grp", "verdicts": "perGroup",
        "minShare": 0.6}}}}
    res = CheckSuite(spec).run(df, key="a")
    got = {r.partition_id: r.passed for r in res.verdicts.collect()
           if "x-reciprocal" in r.check_id}
    assert got == {"g0": True, "g1": False}


def test_spec_validation():
    with pytest.raises(SuiteError):
        validate_suite_spec({"properties": {"a": {
            "x-reciprocal": {"matchCounts": True}}}})     # no with
    with pytest.raises(SuiteError):
        validate_suite_spec({"properties": {"a": {
            "x-reciprocal": {"with": "b", "minShare": 0.5}}}})  # no perGroup
    with pytest.raises(SuiteError):
        validate_suite_spec({"properties": {"a": {
            "x-reciprocal": {"with": "b", "verdicts": "perGroup"}}}})  # no by
    validate_suite_spec({"properties": {"a": {"x-reciprocal": {
        "with": "b", "by": "g", "verdicts": "perGroup",
        "minShare": 0.9, "matchCounts": False, "where": "g = 'x'"}}}})


def test_plan_no_join_single_pass(spark):
    df = _edges(spark)
    v = reciprocity_violations(df, "a", "c", with_col="b", by="grp")
    plan = v._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "Join" not in plan, plan
    assert plan.count("Exchange") <= 1, plan
