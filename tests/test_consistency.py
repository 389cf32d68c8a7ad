"""operators/consistency.py — aggregate consistency + partition completeness."""

import pytest
from pyspark.sql import functions as F

from jsonschema_valid_spark.operators.consistency import (
    aggregate_consistency,
    partition_completeness,
)


def _tables(spark):
    parent = spark.createDataFrame(
        [(1, 10.0), (2, 5.0), (3, 7.0), (4, 1.0)], "key_p long, total double"
    )
    child = spark.createDataFrame(
        [(1, 4.0), (1, 6.0), (2, 5.0), (3, 1.0), (5, 9.0)],
        "key_c long, amount double",
    )
    return parent, child


def test_aggregate_consistency_rows_statuses(spark):
    parent, child = _tables(spark)
    out = aggregate_consistency(
        parent, child, "key_p", "key_c",
        parent_expr="total", child_agg_expr="sum(amount)", tol=0.0,
    )
    got = {r["key"]: (r["status"], r["abs_diff"]) for r in out.collect()}
    assert got[1] == ("match", 0.0)       # 4+6 == 10
    assert got[2] == ("match", 0.0)
    assert got[3][0] == "mismatch" and got[3][1] == pytest.approx(6.0)
    assert got[4] == ("parent_only", None)
    assert got[5] == ("child_only", None)


def test_aggregate_consistency_tolerance_and_summary(spark):
    parent, child = _tables(spark)
    out = aggregate_consistency(
        parent, child, "key_p", "key_c",
        parent_expr="total", child_agg_expr="sum(amount)", tol=6.0,
        mode="summary",
    )
    got = {r["status"]: r["n_keys"] for r in out.collect()}
    # tol=6 absorbs key 3's diff of 6.0 into 'match'
    assert got == {"match": 3, "parent_only": 1, "child_only": 1}
    with pytest.raises(ValueError):
        aggregate_consistency(parent, child, "key_p", "key_c",
                              "total", "sum(amount)", mode="nope")


def test_aggregate_consistency_child_never_row_joined(spark):
    # scale contract: the child aggregates (partial+final) BELOW the join —
    # the physical plan must show the Aggregate on the child side of the
    # SortMergeJoin/ShuffledHashJoin, never a row-grain child scan joining.
    parent, child = _tables(spark)
    out = aggregate_consistency(parent, child, "key_p", "key_c",
                                "total", "sum(amount)")
    plan = out._jdf.queryExecution().executedPlan().toString()
    join_pos = min(p for p in (plan.find("SortMergeJoin"),
                               plan.find("ShuffledHashJoin"),
                               plan.find("BroadcastHashJoin")) if p >= 0)
    agg_positions = [i for i in range(len(plan))
                     if plan.startswith("HashAggregate", i)]
    assert any(p > join_pos for p in agg_positions), plan


def test_partition_completeness_statuses(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 1), ("x", 1)], "src string, v int"
    )
    out = partition_completeness(df, ["src"], expected=["a", "b", "c"],
                                 min_rows=2)
    got = {r["src"]: (r["n_rows"], r["status"]) for r in out.collect()}
    assert got == {
        "a": (2, "ok"),
        "b": (1, "under"),
        "c": (0, "missing"),
        "x": (1, "unexpected"),
    }


def test_partition_completeness_multicol_and_df_domain(spark):
    df = spark.createDataFrame(
        [("a", "x", 1), ("a", "y", 1), ("b", "x", 1)],
        "src string, day string, v int",
    )
    exp = spark.createDataFrame(
        [("a", "x"), ("a", "y"), ("b", "x"), ("b", "y")],
        "src string, day string",
    )
    out = partition_completeness(df, ["src", "day"], expected=exp)
    got = {(r["src"], r["day"]): r["status"] for r in out.collect()}
    assert got[("b", "y")] == "missing"
    assert all(v == "ok" for k, v in got.items() if k != ("b", "y"))
    # tuple-list domain spelling is equivalent
    out2 = partition_completeness(
        df, ["src", "day"],
        expected=[("a", "x"), ("a", "y"), ("b", "x"), ("b", "y")],
    )
    got2 = {(r["src"], r["day"]): r["status"] for r in out2.collect()}
    assert got2 == got
