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


# ---- t-closeness --------------------------------------------------------

def _tdf(spark):
    """Global diag distribution: a 6/12, b 3/12, c 3/12.
    Cell z1 (6 rows): a 6/6 — hand TVD = (|1-.5|+|0-.25|+|0-.25|)/2 = 0.5;
    cell z2 (6 rows): a 0, b 3/6, c 3/6 — TVD = (.5+.25+.25)/2 = 0.5...
    use z2 = (a2, b2, c2): TVD = (|1/3-1/2|+|1/3-1/4|x2)/2 = 1/6."""
    rows = ([(i, "z1", "a") for i in range(6)]
            + [(10, "z2", "a"), (11, "z2", "a"),
               (12, "z2", "b"), (13, "z2", "b"),
               (14, "z2", "c"), (15, "z2", "c")])
    return spark.createDataFrame(rows, "id long, zip string, diag string")


def test_tvd_hand_computed(spark):
    from jsonschema_valid_spark.operators.anonymity import (
        t_closeness_violations,
    )
    df = _tdf(spark)
    # global: a 8/12, b 2/12, c 2/12. z1: a=1 -> TVD = (1-8/12) = 1/3.
    # z2: (2/6,2/6,2/6) vs (8/12,2/12,2/12) -> (1/3 + 1/6 + 1/6)/2 = 1/3
    v = t_closeness_violations(df, ["zip"], "diag", 0.2, "c")
    rows = {r["doc_id"]: r["observed"] for r in v.collect()}
    assert rows == {"z1": "tvd=0.333333", "z2": "tvd=0.333333"}
    assert t_closeness_violations(df, ["zip"], "diag", 0.34, "c").count() == 0


def test_emd_orders_the_distance(spark):
    from jsonschema_valid_spark.operators.anonymity import (
        t_closeness_violations,
    )
    # values 1<2<3, global (1/3, 1/3, 1/3). Cell A all-1s, cell B all-2s:
    # same TVD (2/3·... identical), but EMD(A) = (|2/3|+|1/3|)/2 = 0.5 vs
    # EMD(B) = (|−1/3|+|1/3|)/2 wait — signs: B cum = (-1/3, 2/3-... ;
    # the point under test: far mass (A: 1 vs 3-heavy tail) > near mass.
    rows = ([(i, "A", 1) for i in range(3)]
            + [(10, "B", 2), (11, "B", 2), (12, "B", 2)]
            + [(20, "C", 1), (21, "C", 2), (22, "C", 3)])
    df = spark.createDataFrame(rows, "id long, cell string, s int")
    v = t_closeness_violations(df, ["cell"], "s", 0.0001, "c",
                               ordered=True)
    d = {r["doc_id"]: float(r["observed"].split("=")[1])
         for r in v.collect()}
    # uniform cell C == one-third-each global? global = (4/9, 4/9, 1/9):
    # just assert the structural property: all-1s cell (mass far from
    # the global center) is strictly farther than the all-2s cell
    assert d["A"] > d["B"] > 0
    # and a threshold above the max silences it
    assert t_closeness_violations(
        df, ["cell"], "s", 0.999, "c", ordered=True).count() == 0


def test_t_keyword_and_spec(spark):
    df = _tdf(spark)
    suite = CheckSuite({"x-kAnonymity": {
        "quasi": ["zip"], "t": 0.2, "sensitive": "diag"}})
    for res in (suite.run(df, key="id"),
                run_suite_summarized(suite, df, key="id")):
        assert res.violations.count() == 2
        verd = {r["check_id"]: r for r in res.verdicts.collect()}
        assert verd["x-kAnonymity"]["metric_value"] == 2.0
    # k + t compose: both rule families in one node
    both = CheckSuite({"x-kAnonymity": {
        "quasi": ["zip"], "k": 7, "t": 0.2,
        "sensitive": "diag"}}).run(df, key="id")
    exp = {r["expected"] for r in both.violations.collect()}
    assert exp == {"group size >= 7",
                   "sensitive distribution within tvd 0.2 of global"}
    for bad in (
        {"quasi": ["a"], "t": 0.2},              # t without sensitive
        {"quasi": ["a"], "t": 0.0, "sensitive": "s"},   # t out of range
        {"quasi": ["a"], "t": True, "sensitive": "s"},  # bool t
        {"quasi": ["a"], "k": 2, "ordered": True},      # ordered sans t
    ):
        with pytest.raises(SuiteError):
            validate_suite_spec({"x-kAnonymity": bad}, "draft7")
    validate_suite_spec({"x-kAnonymity": {
        "quasi": ["a"], "t": 0.15, "ordered": True,
        "sensitive": "s"}}, "draft7")


def test_t_operator_validation(spark):
    from jsonschema_valid_spark.operators.anonymity import (
        t_closeness_violations,
    )
    df = _tdf(spark)
    with pytest.raises(ValueError, match="t must be"):
        t_closeness_violations(df, ["zip"], "diag", 1.5, "c")
    with pytest.raises(ValueError, match="sensitive"):
        t_closeness_violations(df, ["zip"], "", 0.2, "c")


def test_t_plan_no_cell_level_join_shuffle(spark):
    """TVD: one (quasi, sensitive) aggregate + cell window + a BROADCAST
    marginal join — no sort-merge join, and the broadcast carries only
    #values rows."""
    from jsonschema_valid_spark.operators.anonymity import (
        t_closeness_violations,
    )
    v = t_closeness_violations(_tdf(spark), ["zip"], "diag", 0.2, "c")
    plan = v._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan ==")[0]
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_sensitive_in_quasi_refused(spark):
    from jsonschema_valid_spark.operators.anonymity import (
        t_closeness_violations,
    )
    df = _tdf(spark)
    with pytest.raises(ValueError, match="cannot be a quasi"):
        t_closeness_violations(df, ["zip"], "zip", 0.1, "c")
    with pytest.raises(SuiteError):
        validate_suite_spec({"x-kAnonymity": {
            "quasi": ["a"], "t": 0.1, "sensitive": "a"}}, "draft7")
    with pytest.raises(SuiteError):
        validate_suite_spec({"x-kAnonymity": {
            "quasi": ["a"], "l": 2, "sensitive": "a"}}, "draft7")


# ---- suppression split --------------------------------------------------

def test_suppress_thin_cells_split(spark):
    from jsonschema_valid_spark.operators.anonymity import (
        suppress_thin_cells,
    )
    df = _df(spark)
    rel, sup = suppress_thin_cells(df, ["zip", "grp"], k=3)
    # violating cells: (z1,b) singleton and (NULL,a) pair — the NULL
    # cell MUST be suppressed too (null-safe join, not a plain equi-join)
    assert {r["id"] for r in sup.collect()} == {4, 9, 10}
    assert {r["id"] for r in rel.collect()} == {1, 2, 3, 5, 6, 7, 8}
    # released is k-anonymous by construction
    assert anonymity_violations(rel, ["zip", "grp"], "c", k=3).count() == 0


def test_suppress_l_and_validation(spark):
    from jsonschema_valid_spark.operators.anonymity import (
        suppress_thin_cells,
    )
    df = _df(spark)
    rel, sup = suppress_thin_cells(df, ["zip", "grp"], l=2,
                                   sensitive="diag")
    # homogeneous (z2,a) and singleton (z1,b) rows suppressed
    assert {r["id"] for r in sup.collect()} == {4, 5, 6, 7, 8}
    assert anonymity_violations(rel, ["zip", "grp"], "c",
                                l=2, sensitive="diag").count() == 0
    with pytest.raises(ValueError, match="k and/or l"):
        suppress_thin_cells(df, ["zip"])


# ---- wave-45 review-fix regressions --------------------------------------

def test_emd_null_quasi_cell_uses_its_real_counts(spark):
    """ordered=True with a NULL quasi cell: the domain-completion join
    must be null-SAFE — a plain equi-join zeroes the NULL cell's counts
    and its distance collapses to a constant independent of its mix."""
    from jsonschema_valid_spark.operators.anonymity import (
        t_closeness_violations,
    )
    # both cells mirror the global mix exactly => every distance is 0;
    # under the null-unsafe join the NULL cell read as EMPTY (distance
    # 0.5 to the global) and was falsely flagged
    rows = [(1, None, 1), (2, None, 2), (3, None, 3),
            (4, "z", 1), (5, "z", 2), (6, "z", 3)]
    df = spark.createDataFrame(rows, "id long, zip string, s int")
    v = t_closeness_violations(df, ["zip"], "s", 0.1, "c", ordered=True)
    assert v.count() == 0


def test_suppress_validation_matches_siblings(spark):
    from jsonschema_valid_spark.operators.anonymity import (
        suppress_thin_cells,
    )
    df = _df(spark)
    with pytest.raises(ValueError, match="at least one quasi"):
        suppress_thin_cells(df, [], k=10)
    with pytest.raises(ValueError, match="missing"):
        suppress_thin_cells(df, ["nope"], k=10)
    with pytest.raises(ValueError, match="not in input"):
        suppress_thin_cells(df, ["zip"], l=2, sensitive="nope")
