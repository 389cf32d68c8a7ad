"""Composite-key x-referential (operators/referential.py
composite_non_members): tuple membership against a broadcast domain —
the FK shape where each component exists individually but the
combination was never registered."""

import pytest
from pyspark.sql import functions as F

from jsonschema_valid_spark import CheckSuite
from jsonschema_valid_spark.engine import run_suite_summarized
from jsonschema_valid_spark.operators.referential import (
    composite_non_members, referential_violations)
from jsonschema_valid_spark.suite.spec import SuiteError, validate_suite_spec


def _fact(spark):
    return spark.createDataFrame(
        [(1, 10, "a"), (2, 10, "b"), (3, 20, "a"),
         (4, 20, "zz"),          # 20 exists, 'zz' exists nowhere
         (5, 10, "c"),           # both exist, PAIR (10,'c') does not
         (6, None, "a"), (7, 30, None)],   # partial keys exempt
        "rid long, uid long, typ string")


def _dom(spark):
    return spark.createDataFrame(
        [(10, "a"), (10, "b"), (20, "a"), (20, "c"), (30, "a")],
        "d_uid long, d_typ string")


def test_tuple_membership_not_componentwise(spark):
    bad = composite_non_members(_fact(spark), ["uid", "typ"],
                                _dom(spark), ["d_uid", "d_typ"])
    assert {r["rid"] for r in bad.collect()} == {4, 5}


def test_null_components_exempt(spark):
    bad = composite_non_members(_fact(spark), ["uid", "typ"],
                                _dom(spark), ["d_uid", "d_typ"])
    assert not {6, 7} & {r["rid"] for r in bad.collect()}


def test_operator_validation(spark):
    f, d = _fact(spark), _dom(spark)
    with pytest.raises(ValueError, match=">= 2 key columns"):
        composite_non_members(f, ["uid"], d)
    with pytest.raises(ValueError, match="arity"):
        composite_non_members(f, ["uid", "typ"], d, ["d_uid"])
    with pytest.raises(ValueError, match="missing"):
        composite_non_members(f, ["uid", "nope"], d)
    with pytest.raises(ValueError, match="DataFrame domain"):
        composite_non_members(f, ["uid", "typ"], [(10, "a")])
    with pytest.raises(ValueError, match="exact"):
        referential_violations(f, ["uid", "typ"], d, "c", key="rid",
                               mode="bloom")


def test_violation_shape(spark):
    v = referential_violations(
        _fact(spark), ["uid", "typ"], _dom(spark), "x-referential",
        key="rid", domain_column=["d_uid", "d_typ"])
    rows = {r["doc_id"]: r for r in v.collect()}
    assert set(rows) == {"4", "5"}
    assert rows["5"]["observed"] == "10/c"
    assert rows["5"]["expected"] == "(uid, typ) in domain"


def test_keyword_both_paths_and_where(spark):
    fact, dom = _fact(spark), _dom(spark)
    spec = {"x-referential": {
        "columns": ["uid", "typ"], "domain": "@d",
        "domainColumns": ["d_uid", "d_typ"]}}
    suite = CheckSuite(spec)
    for res in (suite.run(fact, key="rid", context={"d": dom}),
                run_suite_summarized(suite, fact, key="rid",
                                     context={"d": dom})):
        assert {r["doc_id"] for r in res.violations.collect()} == {"4", "5"}
        verd = {r["check_id"]: r for r in res.verdicts.collect()}
        assert verd["x-referential"]["metric_value"] == 2.0
    scoped = CheckSuite({"x-referential": {
        **spec["x-referential"], "where": "typ <> 'zz'"}}).run(
        fact, key="rid", context={"d": dom})
    assert {r["doc_id"] for r in scoped.violations.collect()} == {"5"}


def test_plan_fact_side_never_shuffles(spark):
    bad = composite_non_members(_fact(spark), ["uid", "typ"],
                                _dom(spark), ["d_uid", "d_typ"])
    plan = bad._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan ==")[0]
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    # the fact subtree prints BEFORE the BroadcastExchange (first join
    # child): it must contain no Exchange — the only shuffle anywhere is
    # the domain's own dimension-sized distinct under the broadcast
    assert plan.split("BroadcastExchange")[0].count("Exchange") == 0, plan


def test_spec_forms(spark):
    validate_suite_spec({"x-referential": {
        "columns": ["a", "b"], "domain": "@d"}}, "draft7")
    for bad in (
        {"columns": ["a"], "domain": "@d"},                 # arity 1
        {"columns": ["a", "b"], "domain": "@d",
         "domainColumns": ["x"]},                           # arity mismatch
        {"columns": ["a", "b"], "domain": "@d",
         "domainColumn": "x"},                              # wrong param
        {"columns": ["a", "b"], "domain": "@d",
         "inline": True},                                   # tuple-blind
        {"columns": ["a", "b"], "domain": "@d",
         "mode": "bloom"},                                  # tuple-blind
    ):
        with pytest.raises(SuiteError):
            validate_suite_spec({"x-referential": bad}, "draft7")
    with pytest.raises(SuiteError, match="root-scope"):
        validate_suite_spec({"properties": {"x": {"x-referential": {
            "columns": ["a", "b"], "domain": "@d"}}}}, "draft7")
    from jsonschema_valid_spark.compiler import SuiteBindError

    with pytest.raises(SuiteBindError, match="key columns missing"):
        CheckSuite({"x-referential": {
            "columns": ["uid", "nope"], "domain": "@d"}}).bind(_fact(spark))


# ---- composite-determinant x-functionalDependency (wave 48) --------------

def test_composite_fd_operator_and_keyword(spark):
    from jsonschema_valid_spark.operators.dependencies import (
        functional_dependency_violations,
    )
    df = spark.createDataFrame(
        [(1, "s1", "p1", 10.0), (2, "s1", "p1", 10.0),
         (3, "s1", "p2", 5.0), (4, "s2", "p1", 12.0),
         (5, "s2", "p1", 13.0),            # (s2,p1) contradicts
         (6, None, "p1", 1.0), (7, None, "p1", 2.0)],  # NULL det group
        "rid long, store string, sku string, price double")
    v = functional_dependency_violations(
        df, ["store", "sku"], "c", determines=["price"])
    rows = {r["doc_id"]: r["observed"] for r in v.collect()}
    assert set(rows) == {"s2|p1", "<null>|p1"}
    assert rows["s2|p1"].startswith("n_distinct=2,")
    # keyword, both paths
    suite = CheckSuite({"x-functionalDependency": {
        "columns": ["store", "sku"], "determines": ["price"]}})
    for res in (suite.run(df, key="rid"),
                run_suite_summarized(suite, df, key="rid")):
        assert res.violations.count() == 2
    # refusals: overlap (both scopes), arity, host-column self-determine
    with pytest.raises(ValueError, match="overlap"):
        functional_dependency_violations(
            df, ["store", "sku"], "c", determines=["sku"])
    with pytest.raises(SuiteError):
        validate_suite_spec({"x-functionalDependency": {
            "columns": ["a"], "determines": ["b"]}}, "draft7")
    with pytest.raises(SuiteError):
        validate_suite_spec({"x-functionalDependency": {
            "columns": ["a", "b"], "determines": ["b"]}}, "draft7")
    with pytest.raises(SuiteError):
        validate_suite_spec({"properties": {"x": {
            "x-functionalDependency": {"determines": ["x"]}}}}, "draft7")
    with pytest.raises(SuiteError, match="root-scope"):
        validate_suite_spec({"properties": {"x": {
            "x-functionalDependency": {"columns": ["a", "b"],
                                       "determines": ["y"]}}}}, "draft7")
