"""x-referential {"coverageMin"} — domain-side coverage (the reverse of
membership: data ⊆ domain polices junk; coverage catches a feed that
silently dropped a whole domain slice). Operator semantics, keyword through
both engine paths, where-scoping, spec refusals, and the broadcast plan."""

import pytest
from pyspark.sql import functions as F

from jsonschema_valid_spark import CheckSuite, validate
from jsonschema_valid_spark.engine import run_suite_summarized
from jsonschema_valid_spark.operators.referential import (
    domain_coverage,
    unused_domain_values,
)
from jsonschema_valid_spark.suite.spec import SuiteError


@pytest.fixture(scope="module")
def fact(spark):
    return spark.createDataFrame(
        [("a", "s1", 10), ("b", "s1", 99), ("c", "s2", 10),
         ("d", "junk", 10), ("e", None, 10)],
        "doc_id string, source string, v int")


@pytest.fixture(scope="module")
def dom(spark):
    return spark.createDataFrame(
        [("s1",), ("s2",), ("s3",), ("s4",)], "src string")


def test_domain_coverage_dataframe_domain(spark, fact, dom):
    row = domain_coverage(fact, "source", dom, domain_column="src").first()
    # s1, s2 seen of 4 domain values; 'junk' and NULL contribute nothing
    assert (row["n_domain"], row["n_seen"]) == (4, 2)
    assert row["coverage"] == pytest.approx(0.5)


def test_domain_coverage_literal_domain(spark, fact):
    row = domain_coverage(fact, "source", ["s1", "s2", "s3"]).first()
    assert (row["n_domain"], row["n_seen"]) == (3, 2)
    assert row["coverage"] == pytest.approx(2 / 3)
    with pytest.raises(ValueError):
        domain_coverage(fact, "source", [])


def test_unused_domain_values(spark, fact, dom):
    got = sorted(r["source"] for r in
                 unused_domain_values(fact, "source", dom,
                                      domain_column="src").collect())
    assert got == ["s3", "s4"]
    lit = sorted(r["source"] for r in
                 unused_domain_values(fact, "source",
                                      ["s1", "s3"]).collect())
    assert lit == ["s3"]


def test_coverage_keyword_both_paths(spark, fact, dom):
    spec = {"properties": {"source": {"x-referential": {
        "domain": "@dom", "domainColumn": "src", "coverageMin": 0.75}}}}
    for runner in (
        lambda: validate(fact, spec, key="doc_id", context={"dom": dom}),
        lambda: run_suite_summarized(CheckSuite(spec), fact, key="doc_id",
                                     context={"dom": dom}),
    ):
        res = runner()
        cov = [r for r in res.verdicts.collect()
               if r["check_id"].endswith("/coverage")]
        assert len(cov) == 1
        assert cov[0]["passed"] is False
        assert cov[0]["metric_value"] == pytest.approx(0.5)
        assert cov[0]["threshold"] == pytest.approx(0.75)
        # the membership side still reports its violation ('junk')
        assert res.violations.count() == 1


def test_coverage_where_scoped(spark, fact, dom):
    # only v < 50 rows count: s2's sole row is in scope, s1 keeps one row
    res = validate(fact, {"properties": {"source": {"x-referential": {
        "domain": "@dom", "domainColumn": "src",
        "coverageMin": 0.4, "where": "v < 50"}}}},
        key="doc_id", context={"dom": dom})
    cov = [r for r in res.verdicts.collect()
           if r["check_id"].endswith("/coverage")][0]
    assert cov["metric_value"] == pytest.approx(0.5)
    assert cov["passed"] is True


def test_empty_dataframe_domain_fails_closed(spark, fact):
    """An EMPTY domain table (0/0 coverage) must yield passed=False, not
    a NULL verdict ok() could not see."""
    empty = spark.createDataFrame([], "src string")
    res = validate(fact, {"properties": {"source": {"x-referential": {
        "domain": "@dom", "domainColumn": "src", "coverageMin": 0.5}}}},
        key="doc_id", context={"dom": empty})
    cov = [r for r in res.verdicts.collect()
           if r["check_id"].endswith("/coverage")][0]
    assert cov["passed"] is False and cov["metric_value"] == 0.0


def test_coverage_spec_refusals(spark):
    for bad in ({"domain": "@d", "coverageMin": 0},
                {"domain": "@d", "coverageMin": 1.5},
                {"domain": "@d", "coverageMin": True},
                {"domain": "@d", "coverageMin": 0.5, "inline": True},
                {"domain": "@d", "coverageMin": 0.5, "mode": "bloom"}):
        with pytest.raises(SuiteError):
            CheckSuite({"properties": {"source": {"x-referential": bad}}})
    with pytest.raises(SuiteError):  # composite carries no single coverage
        CheckSuite({"x-referential": {
            "columns": ["a", "b"], "domain": "@d", "coverageMin": 0.5}})


def test_coverage_plan_is_broadcast(spark, fact, dom):
    """The fact side must reach the semi join WITHOUT a shuffle: coverage
    at 10^12 rows only works if the domain is the broadcast side and the
    count-distinct's exchange carries #domain-bounded values."""
    cov = domain_coverage(fact, "source", dom, domain_column="src")
    plan = cov._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan, plan
    assert "SortMergeJoin" not in plan, plan
