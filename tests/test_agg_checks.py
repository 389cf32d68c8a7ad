"""Aggregate-check unit tests: x-stats, x-distinctCount (exact + approx),
x-quantile — all fused into the single groupBy().agg() pass."""

import pytest
from pyspark.sql import functions as F

from jsonschema_valid_spark import CheckSuite, validate


@pytest.fixture(scope="module")
def df(spark):
    rows = [(f"d{i}", "g1" if i < 60 else "g2", float(i % 100), i % 7)
            for i in range(200)]
    return spark.createDataFrame(rows, "id string, grp string, x double, c long")


def _vmap(res):
    return {(r["partition_id"], r["check_id"]):
            (r["passed"], r["metric_value"]) for r in res.verdicts.collect()}


def test_xstats_all_stats(spark, df):
    res = validate(df, {"properties": {"x": {"x-stats": {
        "min": {"min": 0}, "max": {"max": 99}, "avg": {"min": 10, "max": 90},
        "stddev": {"max": 50}, "sum": {"min": 1},
    }}}}, key="id", partition_by="grp")
    vm = _vmap(res)
    assert all(passed for passed, _ in vm.values())
    assert vm[("g1", "properties/x/x-stats/min")][1] == 0.0
    assert vm[("g1", "properties/x/x-stats/max")][1] == 59.0


def test_xstats_bound_failure(spark, df):
    res = validate(df, {"properties": {"x": {"x-stats": {
        "max": {"max": 50}}}}}, key="id", partition_by="grp")
    vm = _vmap(res)
    assert vm[("g1", "properties/x/x-stats/max")] == (False, 59.0)
    assert res.ok() is False


def test_distinct_count_exact_and_approx(spark, df):
    res = validate(df, {"properties": {"c": {
        "x-distinctCount": {"min": 7, "max": 7}}}}, key="id")
    # 7 distinct values of c overall; per spark partition may be fewer →
    # run globally via a constant partition column
    df2 = df.withColumn("one", F.lit("all"))
    res = validate(df2, {"properties": {"c": {
        "x-distinctCount": {"min": 7, "max": 7}}}}, key="id", partition_by="one")
    vm = _vmap(res)
    assert vm[("all", "properties/c/x-distinctCount")] == (True, 7.0)

    approx = validate(df2, {"properties": {"c": {
        "x-distinctCount": {"min": 5, "max": 9, "approx": True}}}},
        key="id", partition_by="one")
    vm = _vmap(approx)
    passed, metric = vm[("all", "properties/c/x-distinctCount")]
    assert passed and 5 <= metric <= 9  # HLL++ estimate within tolerance


def test_quantile(spark, df):
    df2 = df.withColumn("one", F.lit("all"))
    res = validate(df2, {"properties": {"x": {
        "x-quantile": {"q": 0.5, "min": 30, "max": 70}}}},
        key="id", partition_by="one")
    vm = _vmap(res)
    passed, metric = vm[("all", "properties/x/x-quantile")]
    assert passed and 30 <= metric <= 70


def test_empty_partition_passes(spark):
    """Aggregate checks over an empty frame must not fail (coalesce-to-pass
    — an empty Iceberg partition is vacuously valid)."""
    df = spark.createDataFrame([], "id string, x double, grp string")
    res = validate(df, {"properties": {"x": {"x-stats": {"min": {"min": 0}}}}},
                   key="id", partition_by="grp")
    assert res.verdicts.where("passed = false").isEmpty()
    assert res.ok() is True


def test_everything_fused_one_agg(spark, df):
    """All agg checks + row-check counters ride ONE groupBy().agg()."""
    suite = CheckSuite({"properties": {
        "x": {"minimum": 0, "x-stats": {"avg": {"max": 100}},
              "x-quantile": {"q": 0.9, "max": 100}},
        "c": {"x-distinctCount": {"max": 10}},
    }})
    res = suite.run(df, key="id", partition_by="grp")
    plan = res.verdicts._jdf.queryExecution().executedPlan().toString()
    # exactly one aggregation subtree (partial+final pair), not one per check
    assert plan.count("Scan ") == 1
