"""x-entropy: Shannon-entropy bounds on a categorical column
(operators/entropy.py + engine wiring in both paths) — baseline-free
distribution-collapse / uniformity detection."""

import math

import pytest
from pyspark.sql import functions as F

from jsonschema_valid_spark import CheckSuite
from jsonschema_valid_spark.engine import run_suite_summarized
from jsonschema_valid_spark.operators.entropy import (
    entropy_stats,
    entropy_violations,
)
from jsonschema_valid_spark.suite.metaschema import validate_suite_with_engine
from jsonschema_valid_spark.suite.spec import SuiteError, validate_suite_spec


def _py_entropy(counts):
    t = sum(counts)
    return sum(-(c / t) * math.log(c / t) for c in counts)


def _df(spark):
    # src "mixed": 3 values (2,3,5) — H ≈ 1.03; src "stuck": 1 value — H = 0;
    # src NULL-col rows: value NULL everywhere ⇒ no entropy row at all
    rows = ([("mixed", "a")] * 2 + [("mixed", "b")] * 3 + [("mixed", "c")] * 5
            + [("stuck", "only")] * 6
            + [("empty", None)] * 4)
    return spark.createDataFrame(
        [(i, s, v) for i, (s, v) in enumerate(rows)],
        "doc_id: long, src: string, et: string")


def test_entropy_stats_matches_python(spark):
    stats = {r["src"]: r for r in entropy_stats(_df(spark), "et",
                                                by="src").collect()}
    assert set(stats) == {"mixed", "stuck"}  # all-NULL group has no row
    assert stats["mixed"]["entropy"] == pytest.approx(
        _py_entropy([2, 3, 5]), rel=1e-12)
    assert stats["mixed"]["n_values"] == 3
    assert stats["mixed"]["total"] == 10
    assert stats["stuck"]["entropy"] == pytest.approx(0.0, abs=1e-12)
    # global (by=None): one row over the pooled non-NULL values
    g = entropy_stats(_df(spark), "et").collect()
    assert len(g) == 1
    assert g[0]["entropy"] == pytest.approx(
        _py_entropy([2, 3, 5, 6]), rel=1e-12)


def test_collapse_detection_per_group(spark):
    spec = {"properties": {"et": {"x-entropy": {"min": 0.5, "by": "src"}}}}
    res = CheckSuite(spec).run(_df(spark), key="doc_id")
    viol = {r["doc_id"]: r for r in res.violations.collect()}
    assert set(viol) == {"stuck"}  # only the collapsed source
    assert viol["stuck"]["observed"] == "entropy=0.000000,values=1"
    assert "in [0.5, inf] nats" in viol["stuck"]["expected"]
    cid = "properties/et/x-entropy"
    verd = [r for r in res.verdicts.collect() if r["check_id"] == cid]
    assert len(verd) == 1 and not verd[0]["passed"]
    assert verd[0]["metric_value"] == 1.0


def test_max_bound_uniformity_guard(spark):
    # doc_id is (near-)unique ⇒ pooled entropy ≈ ln(n): the uniformity alarm
    df = _df(spark).withColumn("did_s", F.col("doc_id").cast("string"))
    res = CheckSuite({"properties": {"did_s": {"x-entropy": {
        "max": 2.0}}}}).run(df, key="doc_id")
    viol = res.violations.collect()
    assert len(viol) == 1 and viol[0]["doc_id"] == "<global>"
    # a skewed column passes the same bound
    ok = CheckSuite({"properties": {"et": {"x-entropy": {
        "max": 2.0}}}}).run(_df(spark), key="doc_id")
    assert ok.ok() is True


def test_normalized_mode(spark):
    # mixed: H/ln(3) ≈ 0.94; stuck: defined 0 — a [0,1] threshold
    # separates them regardless of alphabet size
    out = entropy_violations(_df(spark), "et", "c", by="src",
                             min_entropy=0.5, normalized=True)
    got = {r["doc_id"]: r["observed"] for r in out.collect()}
    assert set(got) == {"stuck"}
    assert got["stuck"] == "entropy=0.000000,values=1"
    exp = out.first()["expected"]
    assert exp.startswith("normalized entropy") and "nats" not in exp

    hn = _py_entropy([2, 3, 5]) / math.log(3)
    tight = entropy_violations(_df(spark), "et", "c", by="src",
                               min_entropy=hn + 0.01, normalized=True)
    assert {r["doc_id"] for r in tight.collect()} == {"mixed", "stuck"}


def test_summarized_parity(spark):
    spec = {"properties": {"et": {"x-entropy": {"min": 0.5, "by": "src"}}}}
    df = _df(spark)
    lazy = CheckSuite(spec).run(df, key="doc_id")
    summ = run_suite_summarized(CheckSuite(spec), df, key="doc_id")
    cols = ["doc_id", "check_id", "observed", "expected"]
    assert (sorted(map(tuple, lazy.violations.select(*cols).collect()))
            == sorted(map(tuple, summ.violations.select(*cols).collect())))
    cid = "properties/et/x-entropy"
    for res in (lazy, summ):
        v = [r for r in res.verdicts.collect() if r["check_id"] == cid]
        assert len(v) == 1 and not v[0]["passed"]


def test_spec_validation(spark):
    with pytest.raises(SuiteError):  # no bound
        validate_suite_spec({"properties": {"x": {"x-entropy": {
            "by": "src"}}}})
    with pytest.raises(SuiteError):  # negative bound
        validate_suite_spec({"properties": {"x": {"x-entropy": {
            "min": -0.1}}}})
    with pytest.raises(SuiteError):  # normalized bounds must be ≤ 1
        validate_suite_spec({"properties": {"x": {"x-entropy": {
            "min": 1.5, "normalized": True}}}})
    with pytest.raises(SuiteError):  # non-bool normalized
        validate_suite_spec({"properties": {"x": {"x-entropy": {
            "min": 0.5, "normalized": "yes"}}}})
    # valid forms pass the walker AND the self-hosted metaschema engine
    for v in ({"min": 0.5, "by": "src"}, {"max": 3.0},
              {"min": 0.2, "max": 0.9, "normalized": True}):
        spec = {"properties": {"x": {"x-entropy": v}}}
        validate_suite_spec(spec)
        validate_suite_with_engine(spark, spec)


def test_two_shuffle_no_join_plan(spark):
    out = entropy_violations(_df(spark), "et", "c", by="src",
                             min_entropy=0.5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    # two stacked aggregates: (src, et) counts then src fold — each one
    # Exchange with map-side partial aggregation, never row data
    assert plan.count("Exchange") <= 2
