"""x-vector: declarative embedding-column validation (width / finiteness /
unit-norm) as a row-scope suite keyword riding the fused row pass."""

import math

import pytest
from pyspark.sql import functions as F

from jsonschema_valid_spark import CheckSuite
from jsonschema_valid_spark.suite.spec import SuiteError, validate_suite_spec


def _df(spark):
    inv = 1.0 / math.sqrt(2.0)
    rows = [
        (1, [inv, inv]),               # clean unit vector
        (2, [1.0, 1.0]),               # norm sqrt(2): unit violation
        (3, [1.0]),                    # wrong width
        (4, [float("nan"), 0.0]),      # NaN
        (5, [float("inf"), 0.0]),      # +Inf
        (6, None),                     # null vector: passes (required's job)
    ]
    return spark.createDataFrame(rows, "id: long, v: array<double>")


def _violations(spark, schema):
    res = CheckSuite({"properties": {"v": schema}}).run(_df(spark), key="id")
    return {int(r["doc_id"]): r for r in res.violations.collect()}


def test_all_subchecks(spark):
    out = _violations(spark, {"x-vector": {"dim": 2, "unit": True,
                                           "tol": 0.001}})
    assert set(out) == {2, 3, 4, 5}
    assert out[2]["observed"] == "norm=1.4142"
    assert out[3]["observed"] == "dim=1"
    assert out[4]["observed"] == "nonfinite"
    assert out[5]["observed"] == "nonfinite"
    assert out[2]["expected"] == "vector: dim=2, finite, |l2norm-1|<=0.001"


def test_dim_only(spark):
    out = _violations(spark, {"x-vector": {"dim": 2, "finite": False}})
    assert set(out) == {3}


def test_finite_default_on(spark):
    out = _violations(spark, {"x-vector": {"dim": 2}})
    assert set(out) == {3, 4, 5}


def test_unit_tolerance(spark):
    # tol 0.5 admits norm sqrt(2)-1 ≈ 0.414
    out = _violations(spark, {"x-vector": {"unit": True, "tol": 0.5,
                                           "finite": False}})
    assert 2 not in out
    # NaN norm with finite off: unit check must still flag rows 4/5
    assert {4, 5} <= set(out)


def test_verdict_metric_counts_vector_failures(spark):
    suite = CheckSuite({"properties": {"v": {"x-vector": {"dim": 2}}}})
    res = suite.run(_df(spark), key="id")
    rows = [r for r in res.verdicts.collect()
            if r["check_id"] == "properties/v/x-vector"]
    # verdicts are per partition: failing rows show up as failed partitions
    assert any(not r["passed"] for r in rows)
    assert sum(r["metric_value"] for r in rows) == 3.0


@pytest.mark.parametrize("bad", [
    [],                       # wrong type
    {},                       # empty
    {"dim": 0},               # non-positive
    {"dim": True},            # bool masquerading as int
    {"tol": 0},               # non-positive tol
    {"wat": 1},               # unknown key
])
def test_spec_rejects_malformed(bad):
    with pytest.raises(SuiteError):
        validate_suite_spec({"properties": {"v": {"x-vector": bad}}})


def test_spec_accepts_valid():
    validate_suite_spec({"properties": {"v": {
        "x-vector": {"dim": 64, "unit": True, "tol": 1e-3,
                     "finite": True}}}})


def test_metaschema_agrees_with_walker(spark):
    from jsonschema_valid_spark.suite.metaschema import (
        validate_suite_with_engine,
    )

    good = {"properties": {"v": {"x-vector": {"dim": 64, "unit": True}}}}
    assert validate_suite_with_engine(spark, good).ok()
    for bad in ({"properties": {"v": {"x-vector": {}}}},
                {"properties": {"v": {"x-vector": {"wat": 1}}}},
                {"properties": {"v": {"x-vector": 3}}}):
        assert not validate_suite_with_engine(spark, bad).ok()


def test_rides_fused_row_pass_no_exchange(spark):
    suite = CheckSuite({"properties": {"v": {
        "x-vector": {"dim": 2, "unit": True}}}})
    res = suite.run(_df(spark), key="id")
    plan = res.violations._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_x_vector_rides_streaming_row_pass(spark, tmp_path):
    """Row-scope keywords flow into stream_row_violations unchanged —
    x-vector included."""
    import math

    from jsonschema_valid_spark.streaming.checks import stream_row_violations

    inv = 1.0 / math.sqrt(2.0)
    df = spark.createDataFrame(
        [(1, [inv, inv]), (2, [1.0, 1.0]), (3, [1.0])],
        "id: long, v: array<double>")
    path = str(tmp_path / "vecs")
    df.write.parquet(path)
    sdf = spark.readStream.schema(df.schema).parquet(path)
    suite = CheckSuite({"properties": {"v": {
        "x-vector": {"dim": 2, "unit": True, "tol": 0.001}}}})
    viol = stream_row_violations(suite, sdf, key="id")
    q = (viol.writeStream.format("memory").queryName("xvec_sink")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = {r["doc_id"]: r["observed"]
            for r in spark.sql("SELECT * FROM xvec_sink").collect()}
    assert rows == {"2": "norm=1.4142", "3": "dim=1"}
