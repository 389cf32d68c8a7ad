"""x-acyclic: parent-pointer ancestry must reach a root within maxDepth
(wave 30) — pointer-doubling hierarchy validation (cycles, into-cycle
chains, over-deep chains, multi-parent precondition breaks)."""

import pytest
from pyspark.sql import functions as F

from jsonschema_valid_spark import CheckSuite
from jsonschema_valid_spark.engine import run_suite_summarized
from jsonschema_valid_spark.operators.hierarchy import (
    acyclic_violations,
    multi_parent_nodes,
    unresolved_ancestry,
)
from jsonschema_valid_spark.suite.spec import SuiteError, validate_suite_spec


def _forest(spark):
    # a clean binary forest: parent(i) = i // 2, root 1 (NULL parent)
    rows = [(i, i // 2 if i > 1 else None) for i in range(1, 64)]
    return spark.createDataFrame(rows, "nid: long, pid: long")


def test_clean_forest_passes(spark):
    df = _forest(spark)
    v = acyclic_violations(df, "nid", "c", parent_col="pid", max_depth=8)
    assert v.count() == 0


def test_cycle_and_feeder_flagged(spark):
    rows = [(1, None), (2, 1),
            (10, 11), (11, 10),      # 2-cycle
            (12, 10)]                # feeds into the cycle
    df = spark.createDataFrame(rows, "nid: long, pid: long")
    v = acyclic_violations(df, "nid", "c", parent_col="pid", max_depth=8)
    got = {r.doc_id: r.observed for r in v.collect()}
    assert set(got) == {"10", "11", "12"}
    # anc after exactly 8 steps: even cycle length -> back to self;
    # the feeder lands one past its entry point
    assert got["10"] == "anc@8=10"
    assert got["11"] == "anc@8=11"
    assert got["12"] == "anc@8=11"


def test_exact_depth_boundary_and_odd_depth(spark):
    # path 6 -> 5 -> 4 -> 3 -> 2 -> 1(root): node 6 needs 5 steps
    rows = [(i, i - 1 if i > 1 else None) for i in range(1, 7)]
    df = spark.createDataFrame(rows, "nid: long, pid: long")
    # maxDepth 5 (non-power-of-two: exercises the 101 bit decomposition)
    ok = acyclic_violations(df, "nid", "c", parent_col="pid", max_depth=5)
    assert ok.count() == 0
    # maxDepth 4: only node 6 is one step short
    v = acyclic_violations(df, "nid", "c", parent_col="pid", max_depth=4)
    got = {r.doc_id: r.observed for r in v.collect()}
    assert got == {"6": "anc@4=2"}
    # maxDepth 1: nodes 3..6 cannot reach the root; 2 can
    v1 = acyclic_violations(df, "nid", "c", parent_col="pid", max_depth=1)
    assert {r.doc_id for r in v1.collect()} == {"3", "4", "5", "6"}


def test_self_parent_root_convention(spark):
    rows = [(1, 1), (2, 1)]          # CEO reports to self
    df = spark.createDataFrame(rows, "nid: long, pid: long")
    assert acyclic_violations(df, "nid", "c", parent_col="pid",
                              max_depth=4).count() == 0
    v = acyclic_violations(df, "nid", "c", parent_col="pid",
                           max_depth=4, self_parent_root=False)
    got = {r.doc_id for r in v.collect()}
    assert got == {"1", "2"}         # 1-cycle + its feeder


def test_multi_parent_and_dangling(spark):
    rows = [(1, None), (2, 1), (2, 99), (3, 2),
            (4, 777)]                # dangling parent id = chain ends
    df = spark.createDataFrame(rows, "nid: long, pid: long")
    mp = multi_parent_nodes(df, "nid", "pid")
    assert [(r["__node"], r["__k"]) for r in mp.collect()] == [(2, 2)]
    v = acyclic_violations(df, "nid", "c", parent_col="pid", max_depth=8)
    got = {r.doc_id: r.observed for r in v.collect()}
    # node 2 flagged as multiparent; 3's chain dead-ends at the excluded
    # node (documented), 4's at the dangling id -> both resolve
    assert got == {"2": "multiparent k=2"}


def test_engine_both_paths(spark):
    rows = [(1, None), (2, 1), (10, 11), (11, 10)]
    df = spark.createDataFrame(rows, "nid: long, pid: long")
    suite = CheckSuite({"properties": {"nid": {"x-acyclic": {
        "parent": "pid", "maxDepth": 8}}}})
    res = suite.run(df, key="nid")
    assert {r.doc_id for r in res.violations.collect()} == {"10", "11"}
    vd = {r.partition_id: r for r in res.verdicts.collect()}
    assert vd["<global>"].passed is False
    assert vd["<global>"].metric_value == 2.0

    res2 = run_suite_summarized(suite, df, key="nid")
    assert {r.doc_id for r in res2.violations.collect()} == {"10", "11"}


def test_join_count_scales_log_not_linear(spark):
    """The scale contract: maxDepth 64 must cost ~log2(64) joins, not 64
    — count SortMergeJoin/BroadcastHashJoin operators in the plan."""
    df = _forest(spark)
    v = unresolved_ancestry(df, "nid", "pid", max_depth=64)
    plan = v._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    joins = plan.count("Join")
    # 1 apply + 6 compositions + precondition/boundary joins — far
    # below the 64 a per-step walk would need
    assert joins <= 16, f"{joins} joins for maxDepth=64"


def test_spec_validation():
    validate_suite_spec({"properties": {"n": {"x-acyclic": {
        "parent": "p", "maxDepth": 32, "selfParentIsRoot": False}}}})
    for bad in (
        {"x-acyclic": {}},                          # no parent
        {"x-acyclic": {"parent": ""}},              # empty parent
        {"x-acyclic": {"parent": "p", "maxDepth": 0}},
        {"x-acyclic": {"parent": "p", "maxDepth": 2 ** 21}},
        {"x-acyclic": {"parent": "p", "selfParentIsRoot": "yes"}},
        {"x-acyclic": "p"},                         # not an object
    ):
        with pytest.raises(SuiteError):
            validate_suite_spec({"properties": {"n": bad}})
