"""`where` scoping for the membership family (wave 37): conditional
referential integrity ("purchases must reference a registered user")
and conditional uniqueness ("active rows must be unique") — the scoped
check reads LESS, never more (the filter is a pure pre-filter Catalyst
pushes into the scan)."""

import pytest
from pyspark.sql import functions as F

from jsonschema_valid_spark import CheckSuite
from jsonschema_valid_spark.engine import run_suite_summarized
from jsonschema_valid_spark.suite.spec import SuiteError, validate_suite_spec


def _facts(spark):
    # fk 999 is unregistered; it appears on one 'purchase' row (a true
    # conditional-FK violation) and one 'view' row (exempt by scope)
    rows = [
        (1, "purchase", 10), (2, "purchase", 11), (3, "purchase", 999),
        (4, "view", 999), (5, "view", 12), (6, "click", None),
    ]
    return spark.createDataFrame(rows, "id: long, etype: string, fk: int")


def _dim(spark):
    return spark.createDataFrame([(k,) for k in range(100)], "pk: int")


def test_conditional_referential_both_paths(spark):
    df, dim = _facts(spark), _dim(spark)
    spec = {"properties": {"fk": {"x-referential": {
        "domain": "@dim", "domainColumn": "pk",
        "where": "etype = 'purchase'"}}}}
    ctx = {"dim": dim}
    res = CheckSuite(spec).run(df, key="id", context=ctx)
    assert {r.observed for r in res.violations.collect()} == {"999"}
    assert res.violations.count() == 1  # the view-row 999 is exempt
    summ = run_suite_summarized(CheckSuite(spec), df, key="id",
                                context=ctx)
    assert summ.violations.count() == 1


def test_conditional_referential_inline(spark):
    df = _facts(spark)
    spec = {"properties": {"fk": {"x-referential": {
        "domain": list(range(100)), "inline": True,
        "where": "etype = 'purchase'"}}}}
    res = CheckSuite(spec).run(df, key="id")
    v = res.violations.collect()
    assert len(v) == 1 and v[0].observed == "999"
    assert "where etype = 'purchase'" in v[0].expected


def test_conditional_unique_exact_and_approx(spark):
    rows = [(1, "active", "a"), (2, "active", "a"),   # dup IN scope
            (3, "stale", "b"), (4, "stale", "b"),     # dup out of scope
            (5, "active", "c")]
    df = spark.createDataFrame(rows, "id: long, state: string, k: string")
    spec = {"properties": {"k": {"x-unique": {
        "where": "state = 'active'"}}}}
    res = CheckSuite(spec).run(df, key="id")
    docs = {r.doc_id for r in res.violations.collect()}
    assert docs == {"a"}  # the stale dup is exempt
    # unscoped control: both dups surface
    res0 = CheckSuite({"properties": {"k": {"x-unique": True}}}) \
        .run(df, key="id")
    assert {r.doc_id for r in res0.violations.collect()} == {"a", "b"}
    # approx (HLL) form accepts the same scope: the scoped verdict only
    # counts active rows (3), so the stale dup cannot fail it
    resa = CheckSuite({"properties": {"k": {"x-unique": {
        "approx": True, "where": "state = 'stale'"}}}}).run(df, key="id")
    vr = [r for r in resa.verdicts.collect() if "x-unique" in r.check_id]
    assert len(vr) == 1 and vr[0].passed is False  # stale IS duplicated


def test_conditional_unique_within(spark):
    rows = [(1, "a", "x", "2024-01-01 00:00:00"),
            (2, "a", "x", "2024-01-01 00:00:30"),   # replay IN scope
            (3, "b", "y", "2024-01-01 00:00:00"),
            (4, "b", "y", "2024-01-01 00:00:30")]   # replay out of scope
    df = (spark.createDataFrame(rows, "id: long, src: string, k: string, "
                                      "ts_s: string")
          .select("id", "src", "k", F.to_timestamp("ts_s").alias("ts")))
    spec = {"properties": {"k": {"x-unique": {
        "withinSeconds": 60, "ts": "ts", "where": "src = 'a'"}}}}
    res = CheckSuite(spec).run(df, key="id")
    # doc_id is the replaying ROW's key: only the in-scope replay (row 2)
    v = res.violations.collect()
    assert len(v) == 1 and v[0].doc_id == "2"
    assert "value=x" in v[0].observed


def test_spec_validation():
    validate_suite_spec({"properties": {"k": {"x-unique": {
        "where": "state = 'active'"}}}})
    validate_suite_spec({"properties": {"k": {"x-referential": {
        "domain": [1], "where": "x > 0"}}}})
    with pytest.raises(SuiteError):
        validate_suite_spec({"properties": {"k": {"x-unique": {
            "where": ""}}}})
    with pytest.raises(SuiteError):
        validate_suite_spec({"properties": {"k": {"x-unique": {
            "approx": True, "where": 7}}}})
    with pytest.raises(SuiteError):
        validate_suite_spec({"properties": {"k": {"x-referential": {
            "domain": [1], "where": ""}}}})


def test_metaschema_accepts_scoped_unique(spark):
    from jsonschema_valid_spark.suite.metaschema import (
        validate_suite_with_engine,
    )

    res = validate_suite_with_engine(spark, {"properties": {"k": {
        "x-unique": {"where": "state = 'active'"}}}})
    assert res.ok(), [tuple(r) for r in res.violations.collect()]
