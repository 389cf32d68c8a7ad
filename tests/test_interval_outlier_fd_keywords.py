"""Wave-5 dataset keywords: x-noOverlap (operators/intervals.py),
x-outlier (operators/outliers.py), x-functionalDependency
(operators/dependencies.py) — semantics, NULL handling, both run paths,
and the scale-contract plan shapes."""

import pytest
from pyspark.sql import functions as F

from jsonschema_valid_spark import CheckSuite
from jsonschema_valid_spark.engine import run_suite_summarized
from jsonschema_valid_spark.operators.dependencies import (
    functional_dependency_violations,
)
from jsonschema_valid_spark.operators.intervals import (
    overlap_group_verdicts,
    overlap_violations,
)
from jsonschema_valid_spark.operators.outliers import outlier_violations
from jsonschema_valid_spark.suite.spec import SuiteError, validate_suite_spec


# ---------------------------------------------------------------- x-noOverlap

def _intervals(spark):
    # group 'a': [0,100) swallows [10,20) AND [30,40) — the containment
    # chain lag(end) would miss; [100,110) touches, allowed by default.
    # group 'b': back-to-back touch + NULL end / NULL start drop out.
    rows = [(1, "a", 0, 100), (2, "a", 10, 20), (3, "a", 30, 40),
            (4, "a", 100, 110),
            (5, "b", 0, 10), (6, "b", 10, 20), (7, "b", 5, None),
            (8, "b", None, 30)]
    return spark.createDataFrame(rows, "id: long, grp: string, "
                                       "s: long, e: long")


def test_overlap_containment_chain(spark):
    """Running max of prior ends catches intervals swallowed by an
    earlier, longer one — not just predecessor overlap."""
    res = CheckSuite({"properties": {"s": {"x-noOverlap": {
        "endColumn": "e", "by": "grp"}}}}).run(_intervals(spark), key="id")
    got = {r["doc_id"]: r["observed"] for r in res.violations.collect()}
    assert got == {"2": "start=10,prev_end=100",
                   "3": "start=30,prev_end=100"}
    verd = res.verdicts.collect()
    assert len(verd) == 1 and not verd[0]["passed"] \
        and verd[0]["metric_value"] == 2.0


def test_overlap_allow_touch_false(spark):
    """Closed intervals: touching becomes a violation (doc 4 at 100==100,
    doc 6 at 10==10); NULL sides still never violate."""
    res = CheckSuite({"properties": {"s": {"x-noOverlap": {
        "endColumn": "e", "by": "grp", "allowTouch": False}}}}).run(
        _intervals(spark), key="id")
    assert ({r["doc_id"] for r in res.violations.collect()}
            == {"2", "3", "4", "6"})


def test_overlap_pergroup_verdicts_both_paths(spark):
    spec = {"properties": {"s": {"x-noOverlap": {
        "endColumn": "e", "by": "grp", "verdicts": "perGroup"}}}}
    df = _intervals(spark)
    expect = {"a": (False, 2.0), "b": (True, 0.0)}
    lazy = CheckSuite(spec).run(df, key="id")
    got = {r["partition_id"]: (r["passed"], r["metric_value"])
           for r in lazy.verdicts.collect()}
    assert got == expect
    summ = run_suite_summarized(CheckSuite(spec), df, key="id")
    got2 = {r["partition_id"]: (r["passed"], r["metric_value"])
            for r in summ.verdicts.collect()
            if r["check_id"] == "properties/s/x-noOverlap"}
    assert got2 == expect


def test_overlap_single_shuffle_no_join(spark):
    """Scale contract: one Exchange on the group key, no self-join."""
    out = overlap_violations(_intervals(spark), "s", "c", key="id",
                             end_column="e", by="grp")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange") <= 1


def test_overlap_pergroup_zero_extra_exchange(spark):
    out = overlap_group_verdicts(_intervals(spark), "s", "c", key="id",
                                 end_column="e", by="grp")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 1 and "Join" not in plan


@pytest.mark.parametrize("bad", [
    {"by": "g"},                                  # endColumn absent
    {"endColumn": ""},                            # empty endColumn
    {"endColumn": "e", "allowTouch": "yes"},      # non-bool allowTouch
    {"endColumn": "e", "verdicts": "perGroup"},   # perGroup without by
    "e",                                          # not an object
])
def test_overlap_spec_validation(bad):
    with pytest.raises(SuiteError):
        validate_suite_spec({"properties": {"s": {"x-noOverlap": bad}}})


# ------------------------------------------------------------------ x-outlier

def _readings(spark):
    # g1: 50 tight readings + one wild one; g2: 5-row constant column
    # (zero variance); g3: 1-row group (no sample stddev at all)
    rows = ([(i, "g1", 10.0 + (i % 7) * 0.1) for i in range(50)]
            + [(100, "g1", 500.0)]
            + [(200 + i, "g2", 5.0) for i in range(5)]
            + [(300, "g3", 99.0)])
    return spark.createDataFrame(rows, "id: long, grp: string, v: double")


def test_outlier_group_envelope(spark):
    res = CheckSuite({"properties": {"v": {"x-outlier": {
        "by": "grp", "maxZ": 3.0}}}}).run(_readings(spark), key="id")
    viol = res.violations.collect()
    assert [r["doc_id"] for r in viol] == ["100"]
    assert viol[0]["observed"] == "v=500.0000,z=7.00"
    assert "min_count=2" in viol[0]["expected"]
    verd = res.verdicts.collect()
    assert len(verd) == 1 and not verd[0]["passed"]


def test_outlier_zero_variance_and_singleton_groups_pass(spark):
    """g2 (constant) and g3 (1 row) must never violate — enum/const
    police constants, and a singleton has no sample stddev."""
    df = _readings(spark).where("grp != 'g1'")
    res = CheckSuite({"properties": {"v": {"x-outlier": {
        "by": "grp", "maxZ": 1.0}}}}).run(df, key="id")
    assert res.violations.count() == 0
    assert res.verdicts.collect()[0]["passed"]


def test_outlier_min_count_suppresses_small_groups(spark):
    rows = [(1, "h", 0.0), (2, "h", 1.0), (3, "h", 0.5), (4, "h", 100.0)]
    df = spark.createDataFrame(rows, "id: long, grp: string, v: double")
    spec_lo = {"properties": {"v": {"x-outlier": {
        "by": "grp", "maxZ": 1.2, "minCount": 5}}}}
    assert CheckSuite(spec_lo).run(df, key="id").violations.count() == 0


def test_outlier_global_envelope(spark):
    res = CheckSuite({"properties": {"v": {"x-outlier": {
        "maxZ": 3.0}}}}).run(_readings(spark), key="id")
    # global mean/stddev dominated by the g1 mass: 500.0 is still the
    # only value beyond 3 global sigmas
    assert [r["doc_id"] for r in res.violations.collect()] == ["100"]


def test_outlier_fact_side_never_shuffled(spark):
    """Scale contract: stats aggregate is the ONLY hash Exchange; the
    fact scan reaches the filter through a broadcast join, never a
    SortMergeJoin / fact-side repartition."""
    out = outlier_violations(_readings(spark), "v", "c", key="id",
                             by="grp", max_z=3.0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan
    assert plan.count("Exchange hashpartitioning") <= 1


def test_outlier_summarized_parity(spark):
    spec = {"properties": {"v": {"x-outlier": {"by": "grp", "maxZ": 3.0}}}}
    df = _readings(spark)
    lazy = CheckSuite(spec).run(df, key="id")
    summ = run_suite_summarized(CheckSuite(spec), df, key="id")
    cols = ["doc_id", "check_id", "observed", "expected"]
    assert (sorted(map(tuple, lazy.violations.select(*cols).collect()))
            == sorted(map(tuple, summ.violations.select(*cols).collect())))


@pytest.mark.parametrize("bad", [
    {"by": "g"},                       # maxZ absent
    {"maxZ": 0},                       # non-positive
    {"maxZ": True},                    # bool is not a number
    {"maxZ": 3.0, "minCount": 1},      # minCount must be >= 2
    3.0,                               # not an object
])
def test_outlier_spec_validation(bad):
    with pytest.raises(SuiteError):
        validate_suite_spec({"properties": {"v": {"x-outlier": bad}}})


# ---------------------------------------------------- x-functionalDependency

def _fd_df(spark):
    rows = [(1, 10, "AIR", "x"), (2, 10, "SHIP", "x"),
            (3, 11, "AIR", "y"), (4, 11, "AIR", "y"),
            (5, None, "AIR", "z"), (6, None, "RAIL", "z"),
            (7, 12, None, "w"), (8, 12, "AIR", "w")]
    return spark.createDataFrame(
        rows, "id: long, okey: long, mode: string, tag: string")


def test_fd_violations_multi_dependent(spark):
    """Determinant NULL is its own group; a NULL dependent IS a distinct
    contradicting value."""
    res = CheckSuite({"properties": {"okey": {"x-functionalDependency": {
        "determines": ["mode", "tag"]}}}}).run(_fd_df(spark), key="id")
    got = {r["doc_id"]: r["observed"] for r in res.violations.collect()}
    assert got == {
        "10": "n_distinct=2,min=AIR|x,max=SHIP|x",
        "<null>": "n_distinct=2,min=AIR|z,max=RAIL|z",
        "12": "n_distinct=2,min=<null>|w,max=AIR|w",
    }
    assert res.violations.first()["expected"] \
        == "okey determines (mode, tag)"


def test_fd_single_string_determines(spark):
    res = CheckSuite({"properties": {"okey": {"x-functionalDependency": {
        "determines": "tag"}}}}).run(_fd_df(spark), key="id")
    # tag is constant within every okey group — FD holds
    assert res.violations.count() == 0
    assert res.verdicts.collect()[0]["passed"]


def test_fd_summarized_parity(spark):
    spec = {"properties": {"okey": {"x-functionalDependency": {
        "determines": ["mode"]}}}}
    df = _fd_df(spark)
    lazy = CheckSuite(spec).run(df, key="id")
    summ = run_suite_summarized(CheckSuite(spec), df, key="id")
    cols = ["doc_id", "check_id", "observed", "expected"]
    assert (sorted(map(tuple, lazy.violations.select(*cols).collect()))
            == sorted(map(tuple, summ.violations.select(*cols).collect())))


def test_fd_single_aggregate_no_join(spark):
    out = functional_dependency_violations(
        _fd_df(spark), "okey", "c", determines=["mode", "tag"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    # count-distinct compiles to a two-stage aggregate: at most the
    # grouping Exchange + the distinct-expand Exchange, never row joins
    assert plan.count("Exchange hashpartitioning") <= 2


@pytest.mark.parametrize("bad", [
    {},                                # determines absent
    {"determines": []},                # empty list
    {"determines": [1]},               # non-string member
    {"determines": ""},                # empty string
    "mode",                            # not an object
])
def test_fd_spec_validation(bad):
    with pytest.raises(SuiteError):
        validate_suite_spec(
            {"properties": {"okey": {"x-functionalDependency": bad}}})


# ------------------------------------------------------------ x-outlier: mad

def test_outlier_mad_resists_masking(spark):
    """The masking case MAD exists for: a group where ONE wild value
    inflates its own sigma enough that zscore misses it, while the
    modified z-score (median/MAD, 50% breakdown) flags it."""
    # 6 readings in [10.0, 10.5] + one at 30: the outlier drags mean to
    # ~13.1 and inflates sample sigma to ~7.5, so z(30) ~ 2.3 (< 3 —
    # masked); MAD stays 0.2, so the modified z ~ 66 flags it
    rows = [(i, "m", 10.0 + i * 0.1) for i in range(6)] + [(99, "m", 30.0)]
    df = spark.createDataFrame(rows, "id: long, grp: string, v: double")
    zs = CheckSuite({"properties": {"v": {"x-outlier": {
        "by": "grp", "maxZ": 3.0}}}}).run(df, key="id")
    assert zs.violations.count() == 0  # masked
    mad = CheckSuite({"properties": {"v": {"x-outlier": {
        "by": "grp", "maxZ": 3.5, "method": "mad"}}}}).run(df, key="id")
    viol = mad.violations.collect()
    assert [r["doc_id"] for r in viol] == ["99"]
    assert viol[0]["observed"].startswith("v=30.0000,z=")
    assert "median" in viol[0]["expected"]


def test_outlier_mad_zero_mad_and_singletons_pass(spark):
    """>=50% identical values -> MAD 0 -> never violates (enum/const
    territory); singleton groups have no envelope."""
    rows = ([(i, "c", 5.0) for i in range(6)] + [(10, "c", 9.0)]
            + [(20, "s", 1.0)])
    df = spark.createDataFrame(rows, "id: long, grp: string, v: double")
    res = CheckSuite({"properties": {"v": {"x-outlier": {
        "by": "grp", "maxZ": 1.0, "method": "mad"}}}}).run(df, key="id")
    assert res.violations.count() == 0


def test_outlier_mad_global_and_summarized_parity(spark):
    rows = [(i, "g", float(i % 5)) for i in range(40)] + [(99, "g", 60.0)]
    df = spark.createDataFrame(rows, "id: long, grp: string, v: double")
    spec = {"properties": {"v": {"x-outlier": {
        "maxZ": 3.5, "method": "mad"}}}}
    lazy = CheckSuite(spec).run(df, key="id")
    assert [r["doc_id"] for r in lazy.violations.collect()] == ["99"]
    summ = run_suite_summarized(CheckSuite(spec), df, key="id")
    cols = ["doc_id", "check_id", "observed", "expected"]
    assert (sorted(map(tuple, lazy.violations.select(*cols).collect()))
            == sorted(map(tuple, summ.violations.select(*cols).collect())))


def test_outlier_mad_fact_side_never_shuffled(spark):
    """MAD mode: medians + MADs ride broadcasts; the FINAL fact branch
    is scan -> BroadcastHashJoin -> filter, never a SortMergeJoin. The
    two stats aggregates are the only hash Exchanges."""
    rows = [(i, "g%d" % (i % 3), float(i)) for i in range(30)]
    df = spark.createDataFrame(rows, "id: long, grp: string, v: double")
    out = outlier_violations(df, "v", "c", key="id", by="grp",
                             max_z=3.5, method="mad")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan
    assert plan.count("Exchange hashpartitioning") <= 2


def test_outlier_mad_spec_validation():
    with pytest.raises(SuiteError):
        validate_suite_spec({"properties": {"v": {"x-outlier": {
            "maxZ": 3.5, "method": "iqr"}}}})


# ------------------------------------------------------------ x-outlier: iqr

def test_outlier_iqr_asymmetric_fence(spark):
    # Right-skewed group: the high tail value breaches the upper fence
    # while an equally-distant-from-median LOW value stays inside the
    # (asymmetric) envelope a centered z-band would treat identically.
    vals = [10.0, 11.0, 12.0, 13.0, 14.0, 15.0, 16.0, 40.0]
    rows = [(i, "g", v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id: long, grp: string, v: double")
    res = CheckSuite({"properties": {"v": {"x-outlier": {
        "by": "grp", "method": "iqr", "iqrK": 1.5}}}}).run(df, key="id")
    viol = res.violations.collect()
    assert [r["doc_id"] for r in viol] == ["7"]
    assert viol[0]["observed"].startswith("v=40.0000,lo=")


def test_outlier_iqr_zero_iqr_passes(spark):
    # constant middle (IQR == 0) never violates, matching the
    # zero-variance rule of zscore/mad
    rows = [(i, "g", 5.0) for i in range(7)] + [(9, "g", 99.0)]
    df = spark.createDataFrame(rows, "id: long, grp: string, v: double")
    res = CheckSuite({"properties": {"v": {"x-outlier": {
        "by": "grp", "method": "iqr", "iqrK": 1.5}}}}).run(df, key="id")
    assert res.violations.count() == 0


def test_outlier_iqr_fact_side_never_shuffled(spark):
    from jsonschema_valid_spark.operators.outliers import (
        outlier_violations,
    )

    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 5).cast("string").alias("grp"),
        (F.col("id") * 1.0).alias("v"))
    v = outlier_violations(df, "v", "c", key="id", by="grp",
                           method="iqr", iqr_k=1.5)
    plan = v._jdf.queryExecution().executedPlan().toString()
    fact = plan.split("BroadcastExchange", 1)[0]
    assert "Exchange hashpartitioning" not in fact, plan


@pytest.mark.parametrize("bad", [
    {"by": "g", "method": "iqr"},               # iqrK required for iqr
    {"by": "g", "method": "iqr", "iqrK": 0},    # non-positive
    {"by": "g", "method": "iqr", "maxZ": 3.0},  # wrong knob for iqr
    {"by": "g", "method": "nope", "maxZ": 3.0},
])
def test_outlier_iqr_spec_validation(bad):
    with pytest.raises(SuiteError):
        validate_suite_spec({"properties": {"v": {"x-outlier": bad}}})
