"""x-monotonic: per-group monotonicity over a declared ordering
(operators/ordering.py monotonic_violations + engine wiring in both paths).

The sequential integrity check per-row keywords can't express — each row is
bounded by its PREDECESSOR (window lag), not a literal.
"""

import pytest
from pyspark.sql import functions as F

from jsonschema_valid_spark import CheckSuite
from jsonschema_valid_spark.engine import run_suite_summarized
from jsonschema_valid_spark.operators.ordering import monotonic_violations
from jsonschema_valid_spark.suite.metaschema import validate_suite_with_engine
from jsonschema_valid_spark.suite.spec import SuiteError, validate_suite_spec


def _df(spark):
    # group 'a': 10, 20, 15 (row 3 breaks nonDecreasing), then 15 again
    # (ties OK for nonDecreasing, break increasing)
    # group 'b': NULL in the middle — pairs with NULL never violate
    rows = [
        (1, "a", 1, 10), (2, "a", 2, 20), (3, "a", 3, 15), (4, "a", 4, 15),
        (5, "b", 1, 5), (6, "b", 2, None), (7, "b", 3, 1),
    ]
    return spark.createDataFrame(
        rows, "doc_id: long, grp: string, seq: long, v: int")


_SPEC = {"properties": {"v": {"x-monotonic": {
    "orderBy": "seq", "by": "grp"}}}}


def test_non_decreasing_violations_and_verdict(spark):
    res = CheckSuite(_SPEC).run(_df(spark), key="doc_id")
    viol = {r["doc_id"]: r for r in res.violations.collect()}
    assert set(viol) == {"3"}
    assert viol["3"]["observed"] == "prev=20,cur=15"
    cid = "properties/v/x-monotonic"
    verd = [r for r in res.verdicts.collect() if r["check_id"] == cid]
    assert len(verd) == 1 and verd[0]["partition_id"] == "<global>"
    assert not verd[0]["passed"] and verd[0]["metric_value"] == 1.0


def test_strict_increasing_flags_ties(spark):
    spec = {"properties": {"v": {"x-monotonic": {
        "orderBy": "seq", "by": "grp", "direction": "increasing"}}}}
    res = CheckSuite(spec).run(_df(spark), key="doc_id")
    assert ({r["doc_id"] for r in res.violations.collect()}
            == {"3", "4"})  # 15 after 20, then the 15==15 tie


def test_decreasing_directions(spark):
    rows = [(1, 1, 30), (2, 2, 20), (3, 3, 25), (4, 4, 25)]
    df = spark.createDataFrame(rows, "doc_id: long, seq: long, v: int")
    spec = {"properties": {"v": {"x-monotonic": {
        "orderBy": "seq", "direction": "nonIncreasing",
        "allowGlobal": True}}}}
    res = CheckSuite(spec).run(df, key="doc_id")
    assert {r["doc_id"] for r in res.violations.collect()} == {"3"}
    spec = {"properties": {"v": {"x-monotonic": {
        "orderBy": "seq", "direction": "decreasing",
        "allowGlobal": True}}}}
    res = CheckSuite(spec).run(df, key="doc_id")
    assert {r["doc_id"] for r in res.violations.collect()} == {"3", "4"}


def test_order_ties_broken_by_key(spark):
    """Two rows with the same orderBy value: the run key breaks the tie, so
    lag() is deterministic regardless of physical partitioning."""
    rows = [(1, 1, 10), (2, 1, 5), (3, 2, 7)]
    df = spark.createDataFrame(rows, "doc_id: long, seq: long, v: int")
    out = monotonic_violations(df.repartition(8), "v", "c", key="doc_id",
                               order_by="seq", allow_global=True)
    got = {(r["doc_id"], r["observed"]) for r in out.collect()}
    # order is (seq, doc_id): 10, 5, 7 → doc 2 breaks (5 < 10)
    assert got == {("2", "prev=10,cur=5")}


def test_summarized_parity(spark):
    df = _df(spark)
    lazy = CheckSuite(_SPEC).run(df, key="doc_id")
    summ = run_suite_summarized(CheckSuite(_SPEC), df, key="doc_id")
    cols = ["doc_id", "check_id", "observed", "expected"]
    assert (sorted(map(tuple, lazy.violations.select(*cols).collect()))
            == sorted(map(tuple, summ.violations.select(*cols).collect())))


def test_single_shuffle_no_join(spark):
    """Scale contract: one Exchange on the group key + sort — no join, no
    self-join (the naive pairs formulation is a row-grain self-join)."""
    out = monotonic_violations(_df(spark), "v", "c", key="doc_id",
                               order_by="seq", by="grp")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange") <= 1


@pytest.mark.parametrize("bad", [
    {"by": "grp"},                                   # orderBy absent
    {"orderBy": "seq", "direction": "upwards"},      # bad direction
    {"orderBy": ""},                                 # empty orderBy
    "seq",                                           # not an object
])
def test_spec_validation_rejects(bad):
    with pytest.raises(SuiteError):
        validate_suite_spec({"properties": {"v": {"x-monotonic": bad}}})


def test_spec_and_metaschema_accept(spark):
    validate_suite_spec(_SPEC)  # walker
    assert validate_suite_with_engine(spark, _SPEC).ok()  # self-hosted


def test_pergroup_verdicts_enumerate_all_groups(spark):
    spec = {"properties": {"v": {"x-monotonic": {
        "orderBy": "seq", "by": "grp", "verdicts": "perGroup"}}}}
    df = _df(spark)
    res = CheckSuite(spec).run(df, key="doc_id")
    verd = {r["partition_id"]: (r["passed"], r["metric_value"])
            for r in res.verdicts.collect()}
    # group a has the 20->15 break; group b's NULL pairs never violate
    assert verd == {"a": (False, 1.0), "b": (True, 0.0)}
    summ = run_suite_summarized(CheckSuite(spec), df, key="doc_id")
    sv = {r["partition_id"]: (r["passed"], r["metric_value"])
          for r in summ.verdicts.collect()
          if r["check_id"] == "properties/v/x-monotonic"}
    assert sv == verd


def test_pergroup_verdicts_zero_extra_exchange(spark):
    """Verdicts consume the window's existing hash-partitioning on the
    group key — exactly one Exchange in the whole plan."""
    from jsonschema_valid_spark.operators.ordering import (
        monotonic_group_verdicts,
    )

    out = monotonic_group_verdicts(_df(spark), "v", "c", key="doc_id",
                                   order_by="seq", by="grp")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 1 and "Join" not in plan


def test_pergroup_requires_by():
    with pytest.raises(SuiteError):
        validate_suite_spec({"properties": {"v": {"x-monotonic": {
            "orderBy": "seq", "verdicts": "perGroup"}}}})


def test_max_step_gap_detection(spark):
    """maxStep: the heartbeat-gap check — a feed that skipped readings is
    a silent outage the end-of-feed freshness check can't see."""
    rows = [(1, 1, 0), (2, 2, 100), (3, 3, 150), (4, 4, 1000),
            (5, 5, 1001)]
    df = spark.createDataFrame(rows, "doc_id: long, seq: long, v: int")
    spec = {"properties": {"v": {"x-monotonic": {
        "orderBy": "seq", "maxStep": 500, "allowGlobal": True}}}}
    res = CheckSuite(spec).run(df, key="doc_id")
    got = {r["doc_id"]: r["observed"] for r in res.violations.collect()}
    assert got == {"4": "prev=150,cur=1000"}  # gap of 850
    # expected message carries the bound
    exp = res.violations.select("expected").first()[0]
    assert "step <= 500" in exp


def test_min_step_and_direction_compose(spark):
    rows = [(1, 1, 0), (2, 2, 5), (3, 3, 6), (4, 4, 2)]
    df = spark.createDataFrame(rows, "doc_id: long, seq: long, v: int")
    spec = {"properties": {"v": {"x-monotonic": {
        "orderBy": "seq", "minStep": 2, "allowGlobal": True}}}}
    res = CheckSuite(spec).run(df, key="doc_id")
    # doc 3: step 1 < 2; doc 4: direction break (2 < 6) AND step -4 < 2
    assert ({r["doc_id"] for r in res.violations.collect()} == {"3", "4"})


def test_step_pergroup_verdicts(spark):
    rows = [(1, "a", 1, 0), (2, "a", 2, 900), (3, "b", 1, 0),
            (4, "b", 2, 100)]
    df = spark.createDataFrame(rows, "doc_id: long, grp: string, "
                                     "seq: long, v: int")
    spec = {"properties": {"v": {"x-monotonic": {
        "orderBy": "seq", "by": "grp", "maxStep": 500,
        "verdicts": "perGroup"}}}}
    res = CheckSuite(spec).run(df, key="doc_id")
    verd = {r["partition_id"]: r["passed"] for r in res.verdicts.collect()}
    assert verd == {"a": False, "b": True}


def test_step_spec_validation():
    with pytest.raises(SuiteError):
        validate_suite_spec({"properties": {"v": {"x-monotonic": {
            "orderBy": "seq", "maxStep": "500"}}}})
    with pytest.raises(SuiteError):
        validate_suite_spec({"properties": {"v": {"x-monotonic": {
            "orderBy": "seq", "minStep": True}}}})
