"""x-kAnonymity (operators/anonymity.py): k-anonymity group-size floors
and l-diversity sensitive-distinct floors per quasi-identifier cell —
operator semantics, keyword wiring through both run paths, where
scoping, spec/metaschema acceptance, plan shape."""

import pytest
from pyspark.sql import functions as F

from jsonschema_valid_spark import CheckSuite
from jsonschema_valid_spark.engine import run_suite_summarized
from jsonschema_valid_spark.operators.anonymity import anonymity_violations
from jsonschema_valid_spark.suite.spec import SuiteError, validate_suite_spec


def _df(spark):
    # cells: (z1,a): 3 rows / 2 sensitive values; (z1,b): 1 row;
    # (z2,a): 4 rows all SAME sensitive; (NULL,a): 2 rows distinct sens
    rows = [
        (1, "z1", "a", "s1"), (2, "z1", "a", "s1"), (3, "z1", "a", "s2"),
        (4, "z1", "b", "s1"),
        (5, "z2", "a", "s9"), (6, "z2", "a", "s9"),
        (7, "z2", "a", "s9"), (8, "z2", "a", "s9"),
        (9, None, "a", "s1"), (10, None, "a", "s2"),
    ]
    return spark.createDataFrame(
        rows, "id long, zip string, grp string, diag string")


def test_k_floor_and_null_cell(spark):
    v = anonymity_violations(_df(spark), ["zip", "grp"], "c", k=3)
    rows = {r["doc_id"]: r["observed"] for r in v.collect()}
    assert rows == {"z1/b": "count=1", "NULL/a": "count=2"}
    r = v.collect()[0]
    assert r["expected"] == "group size >= 3"


def test_l_floor_homogeneous_group(spark):
    v = anonymity_violations(_df(spark), ["zip", "grp"], "c",
                             l=2, sensitive="diag")
    rows = {r["doc_id"]: r["observed"] for r in v.collect()}
    # (z2,a) is 4-anonymous yet homogeneous; (z1,b) is a singleton
    assert rows == {"z2/a": "distinct=1 (count=4)",
                    "z1/b": "distinct=1 (count=1)"}


def test_both_floors_two_rows_per_cell(spark):
    v = anonymity_violations(_df(spark), ["zip", "grp"], "c",
                             k=3, l=2, sensitive="diag")
    got = {(r["doc_id"], r["expected"]) for r in v.collect()}
    assert got == {
        ("z1/b", "group size >= 3"), ("NULL/a", "group size >= 3"),
        ("z1/b", "sensitive diversity >= 2"),
        ("z2/a", "sensitive diversity >= 2"),
    }


def test_null_sensitive_is_not_diversity(spark):
    df = spark.createDataFrame(
        [(1, "z", None), (2, "z", None), (3, "z", "s1")],
        "id long, zip string, diag string")
    v = anonymity_violations(df, ["zip"], "c", l=2, sensitive="diag")
    assert [r["observed"] for r in v.collect()] == ["distinct=1 (count=3)"]


def test_operator_validation(spark):
    df = _df(spark)
    with pytest.raises(ValueError, match="k and/or l"):
        anonymity_violations(df, ["zip"], "c")
    with pytest.raises(ValueError, match="sensitive column"):
        anonymity_violations(df, ["zip"], "c", l=2)
    with pytest.raises(ValueError, match="missing"):
        anonymity_violations(df, ["nope"], "c", k=2)


def test_keyword_both_paths(spark):
    df = _df(spark)
    suite = CheckSuite({"x-kAnonymity": {
        "quasi": ["zip", "grp"], "k": 3, "l": 2, "sensitive": "diag"}})
    for res in (suite.run(df, key="id"),
                run_suite_summarized(suite, df, key="id")):
        assert res.violations.count() == 4
        verd = {r["check_id"]: r for r in res.verdicts.collect()}
        v = verd["x-kAnonymity"]
        assert not v["passed"] and v["metric_value"] == 4.0


def test_where_scopes_release(spark):
    """The where scope names the RELEASED subpopulation — scoping to the
    anonymous slice silences the check in both paths (inert-where
    guard for the root-scope keyword the matrix test cannot host)."""
    df = _df(spark)
    spec = {"x-kAnonymity": {"quasi": ["zip", "grp"], "k": 3,
                             "where": "grp = 'nope'"}}
    base = CheckSuite({"x-kAnonymity": {"quasi": ["zip", "grp"],
                                        "k": 3}}).run(df, key="id")
    assert base.violations.count() > 0
    assert CheckSuite(spec).run(df, key="id").violations.count() == 0
    assert run_suite_summarized(
        CheckSuite(spec), df, key="id").violations.count() == 0


def test_bind_refuses_missing_columns(spark):
    df = _df(spark)
    from jsonschema_valid_spark.compiler import SuiteBindError

    with pytest.raises(SuiteBindError, match="quasi columns missing"):
        CheckSuite({"x-kAnonymity": {"quasi": ["nope"], "k": 2}}).bind(df)
    with pytest.raises(SuiteBindError, match="sensitive column missing"):
        CheckSuite({"x-kAnonymity": {
            "quasi": ["zip"], "l": 2, "sensitive": "nope"}}).bind(df)


def test_spec_forms():
    validate_suite_spec({"x-kAnonymity": {"quasi": ["a", "b"], "k": 5}},
                        "draft7")
    validate_suite_spec({"x-kAnonymity": {
        "quasi": ["a"], "l": 2, "sensitive": "s", "where": "x > 0"}},
        "draft7")
    for bad in (
        {"quasi": ["a"]},                       # no floor at all
        {"quasi": ["a"], "k": 1},               # vacuous floor
        {"quasi": ["a"], "k": True},            # bool is not an int floor
        {"quasi": [], "k": 2},                  # empty quasi
        {"quasi": ["a"], "l": 2},               # l without sensitive
        {"quasi": ["a"], "k": 2, "sensitive": "s"},  # inert sensitive
        {"quasi": ["a"], "k": 2, "extra": 1},   # unknown key
    ):
        with pytest.raises(SuiteError):
            validate_suite_spec({"x-kAnonymity": bad}, "draft7")
    with pytest.raises(SuiteError, match="root-scope"):
        validate_suite_spec({"properties": {"d": {
            "x-kAnonymity": {"quasi": ["a"], "k": 2}}}}, "draft7")


def test_metaschema_accepts_and_rejects(spark):
    from jsonschema_valid_spark.suite.metaschema import (
        validate_suite_with_engine,
    )
    ok = validate_suite_with_engine(
        spark, {"x-kAnonymity": {"quasi": ["a"], "k": 2}})
    assert ok.ok()
    bad = validate_suite_with_engine(
        spark, {"x-kAnonymity": {"k": 2}})  # quasi missing
    assert not bad.ok()


def _plan(v) -> str:
    return v._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan ==")[0]


def test_plan_k_only_single_shuffle_no_join(spark):
    plan = _plan(anonymity_violations(_df(spark), ["zip", "grp"], "c",
                                      k=3))
    assert "Join" not in plan, plan
    assert plan.count("Exchange") == 1, plan


def test_plan_with_l_no_join(spark):
    """k + l: the k arm prunes the distinct aggregate (1 Exchange); the
    l arm's count_distinct is the standard two-phase Expand shape
    (quasi+sensitive then quasi) — 3 Exchanges total, never a join."""
    plan = _plan(anonymity_violations(_df(spark), ["zip", "grp"], "c",
                                      k=3, l=2, sensitive="diag"))
    assert "Join" not in plan, plan
    assert plan.count("Exchange") <= 3, plan


# ---- profile bootstrap --------------------------------------------------

def test_suggest_floors_round_trip(spark):
    from jsonschema_valid_spark.operators.profile import (
        suggest_anonymity_floors,
    )
    rows = [(i, f"z{i % 2}", f"s{i % 8}") for i in range(40)]
    df = spark.createDataFrame(rows, "id long, zip string, diag string")
    node = suggest_anonymity_floors(df, ["zip"], sensitive="diag")
    # 20 rows and 4 distinct sensitive per cell (i%8 within one parity
    # class hits 4 residues), padded by 0.5
    assert node == {"quasi": ["zip"], "k": 10, "l": 2, "sensitive": "diag"}
    # passes its own snapshot by construction
    res = CheckSuite({"x-kAnonymity": node}).run(df, key="id")
    assert res.violations.count() == 0
    # a release with a thin cell trips the suggested floor
    bad = df.unionByName(spark.createDataFrame(
        [(99, "z9", "s0")], "id long, zip string, diag string"))
    res2 = CheckSuite({"x-kAnonymity": node}).run(bad, key="id")
    assert {r["doc_id"] for r in res2.violations.collect()} == {"z9"}


def test_suggest_floors_refuses_thin_snapshot(spark):
    from jsonschema_valid_spark.operators.profile import (
        suggest_anonymity_floors,
    )
    df = spark.createDataFrame(
        [(1, "a", "x"), (2, "b", "y"), (3, "b", "y")],
        "id long, zip string, diag string")
    # worst cell is a singleton — floor(1 * 0.5) = 0 < 2 => no gate
    assert suggest_anonymity_floors(df, ["zip"]) is None
    with pytest.raises(ValueError, match="pad"):
        suggest_anonymity_floors(df, ["zip"], pad=0.0)
