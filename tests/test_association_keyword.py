"""x-association: Cramér's V bounds between two categorical columns
(wave 28) — the categorical sibling of x-correlation."""

import pytest
from pyspark.sql import functions as F

from jsonschema_valid_spark import CheckSuite
from jsonschema_valid_spark.engine import run_suite_summarized
from jsonschema_valid_spark.operators.association import (
    association_group_verdicts,
    association_matrix,
    association_violations,
)
from jsonschema_valid_spark.suite.spec import SuiteError, validate_suite_spec


def _df(spark):
    rows = []
    i = 0
    # "dep": b is a function of a -> V = 1.0 exactly
    for a, n in (("x", 30), ("y", 20)):
        for _ in range(n):
            rows.append((i, "dep", a, a + "!")); i += 1
    # "ind": balanced 2x2 -> V = 0.0 exactly
    for a in ("x", "y"):
        for b in ("u", "v"):
            for _ in range(25):
                rows.append((i, "ind", a, b)); i += 1
    # "const": one a-category -> dof 0, V undefined (suppressed)
    for b in ("u", "v"):
        for _ in range(10):
            rows.append((i, "const", "x", b)); i += 1
    # "tiny": below min_count
    rows.append((i, "tiny", "x", "u")); i += 1
    rows.append((i, "tiny", "y", "v")); i += 1
    # NULLs on either side are excluded (pairwise-complete)
    rows.append((i, "dep", None, "u")); i += 1
    rows.append((i, "dep", "x", None)); i += 1
    return spark.createDataFrame(
        rows, "id: long, grp: string, a: string, b: string")


def test_exact_v_dependent_and_independent(spark):
    df = _df(spark)
    # max bound: "a must NOT predict b" -> the dependent group trips at
    # exactly V=1; the NULL rows, if wrongly counted, would break this
    v = association_violations(df, "a", "c", with_col="b", by="grp",
                               max_v=0.5, min_count=5)
    got = {r.doc_id: r.observed for r in v.collect()}
    assert set(got) == {"dep"}
    assert got["dep"] == "v=1.0000,n=50,r=2,c=2"

    # min bound: "a MUST track b" -> the independent group sits at 0
    vmin = association_violations(df, "a", "c", with_col="b", by="grp",
                                  min_v=0.3, min_count=5)
    got = {r.doc_id: r.observed for r in vmin.collect()}
    # const (undefined V) and tiny (min_count) are suppressed
    assert set(got) == {"ind"}
    assert got["ind"] == "v=0.0000,n=100,r=2,c=2"


def test_keyword_both_paths_and_where(spark):
    df = _df(spark)
    spec = {"properties": {"a": {"x-association": {
        "with": "b", "max": 0.5, "by": "grp", "minCount": 5}}}}
    res = CheckSuite(spec).run(df, key="id")
    assert {r.doc_id for r in res.violations.collect()} == {"dep"}
    verd = {r.check_id: r.passed for r in res.verdicts.collect()}
    assert verd["properties/a/x-association"] is False
    summ = run_suite_summarized(CheckSuite(spec), df, key="id")
    assert {r.doc_id for r in summ.violations.collect()} == {"dep"}

    # where-scoping narrows the check to the rows it governs
    scoped = {"properties": {"a": {"x-association": {
        "with": "b", "max": 0.5, "by": "grp", "minCount": 5,
        "where": "grp <> 'dep'"}}}}
    res2 = CheckSuite(scoped).run(df, key="id")
    assert res2.violations.count() == 0


def test_global_scope_and_plan_has_no_join(spark):
    df = _df(spark)
    # global: one association over the whole table
    v = association_violations(df.where("grp = 'dep'"), "a", "c",
                               with_col="b", max_v=0.5)
    rows = v.collect()
    assert len(rows) == 1 and rows[0].doc_id == "<global>"

    plan = v._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # contingency + window algebra, never a join


def test_per_group_verdicts_enumerate_all(spark):
    df = _df(spark)
    g = association_group_verdicts(df, "a", "c", with_col="b", by="grp",
                                   max_v=0.5, min_count=5)
    got = {r.partition_id: (r.passed, r.metric_value) for r in g.collect()}
    assert set(got) == {"dep", "ind", "const", "tiny"}
    assert got["dep"][0] is False and got["dep"][1] == 1.0
    assert got["ind"][0] is True and got["ind"][1] == 0.0
    assert got["const"][0] is True      # undefined V -> suppressed pass
    assert got["tiny"][0] is True       # below min_count -> suppressed

    # via the keyword
    spec = {"properties": {"a": {"x-association": {
        "with": "b", "max": 0.5, "by": "grp", "minCount": 5,
        "verdicts": "perGroup"}}}}
    res = CheckSuite(spec).run(df, key="id")
    per = [r for r in res.verdicts.collect()
           if r.check_id == "properties/a/x-association"]
    assert {r.partition_id for r in per} == {"dep", "ind", "const", "tiny"}


def test_matrix_tidy_shape(spark):
    df = _df(spark).withColumn("c3", F.concat(F.col("a"), F.lit("_")))
    m = association_matrix(df, ["a", "b", "c3"])
    rows = {(r.col_a, r.col_b): r.cramers_v for r in m.collect()}
    assert set(rows) == {("a", "b"), ("a", "c3"), ("b", "c3")}
    assert rows[("a", "c3")] == 1.0  # c3 is a function of a


def test_spec_validation(spark):
    for bad in (
        {"with": "b"},                          # no bound
        {"with": "b", "min": 1.5},              # out of [0,1]
        {"with": "", "min": 0.5},               # empty with
        {"with": "b", "min": 0.5, "minCount": 2},   # minCount < 3
        {"with": "b", "min": 0.5, "verdicts": "perGroup"},  # no by
        {"min": 0.5},                           # missing with
    ):
        with pytest.raises(SuiteError):
            validate_suite_spec(
                {"properties": {"a": {"x-association": bad}}})
    validate_suite_spec({"properties": {"a": {"x-association": {
        "with": "b", "min": 0.1, "max": 0.9, "by": "g", "minCount": 5,
        "where": "g <> 'x'", "verdicts": "perGroup"}}}})
