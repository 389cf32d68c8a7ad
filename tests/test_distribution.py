"""x-distribution: goodness-of-fit vs a closed-form law
(operators/distribution.py) — the baseline-free sibling of x-drift."""

import math

import pytest

from pyspark.sql import functions as F

from jsonschema_valid_spark import CheckSuite
from jsonschema_valid_spark.engine import run_suite_summarized
from jsonschema_valid_spark.operators.distribution import (
    parametric_baseline,
)
from jsonschema_valid_spark.suite.metaschema import validate_suite_with_engine
from jsonschema_valid_spark.suite.spec import SuiteError, validate_suite_spec

SCALE = 1_000_000_000


def test_uniform_baseline_masses():
    b = parametric_baseline("uniform", {"min": 0, "max": 100}, 10.0)
    assert set(b) == set(range(10))
    assert all(c == SCALE // 10 for c in b.values())
    # off-grid support: partial edge buckets
    b2 = parametric_baseline("uniform", {"min": 5, "max": 15}, 10.0)
    assert set(b2) == {0, 1} and b2[0] == b2[1] == SCALE // 2


def test_exponential_and_normal_baselines():
    b = parametric_baseline("exponential", {"rate": 0.1}, 5.0)
    assert abs(sum(b.values()) - SCALE) <= len(b)  # masses sum to ~1
    # bucket 0 mass = 1 - exp(-0.5)
    assert b[0] == pytest.approx(SCALE * (1 - math.exp(-0.5)), abs=2)
    assert min(b) == 0  # support starts at shift=0

    n = parametric_baseline("normal", {"mean": 0, "std": 10}, 5.0)
    assert abs(sum(n.values()) - SCALE) <= len(n)
    # symmetric around the mean: bucket b and -(b+1) carry equal mass
    assert n[0] == n[-1] and n[3] == n[-4]


def test_baseline_rejects_bad_params():
    with pytest.raises(ValueError):
        parametric_baseline("uniform", {"min": 5, "max": 5}, 1.0)
    with pytest.raises(ValueError):
        parametric_baseline("exponential", {"rate": 0}, 1.0)
    with pytest.raises(ValueError):
        parametric_baseline("normal", {"mean": 0, "std": 0}, 1.0)
    with pytest.raises(ValueError):
        parametric_baseline("poisson", {"rate": 2}, 1.0)
    with pytest.raises(ValueError):
        parametric_baseline("uniform", {"min": 0, "max": 1}, 0.0)
    with pytest.raises(ValueError):
        # 100k+ bucket refusal
        parametric_baseline("uniform", {"min": 0, "max": 1e9}, 1.0)


def _hash_gate_df(spark, biased=False):
    """The canonical use case: a hash-gate output that MUST be uniform on
    [0, 100). The biased variant squares the percentile (broken hash)."""
    v = (F.col("id") * 2654435761) % 100
    if biased:
        v = (v * v) / 100.0
    return spark.range(20000).select(
        F.col("id").alias("doc_id"), v.cast("double").alias("gate"))


_SPEC = {"properties": {"gate": {"x-distribution": {
    "family": "uniform", "min": 0, "max": 100, "bucketWidth": 10.0,
    "psiMax": 0.05, "ksMax": 0.05, "chi2Max": 0.05, "emdMax": 2.0}}}}


def test_uniform_fit_passes_and_bias_trips_all_stats(spark):
    assert CheckSuite(_SPEC).run(_hash_gate_df(spark),
                                 key="doc_id").ok() is True
    res = CheckSuite(_SPEC).run(_hash_gate_df(spark, biased=True),
                                key="doc_id")
    got = {r["check_id"].rsplit("/", 1)[1]: r["passed"]
           for r in res.verdicts.collect()}
    assert got == {"psi": False, "ks": False, "chi2": False, "emd": False}


def test_both_paths_agree(spark):
    df = _hash_gate_df(spark, biased=True)
    lazy = CheckSuite(_SPEC).run(df, key="doc_id")
    summ = run_suite_summarized(CheckSuite(_SPEC), df, key="doc_id")
    cols = ["partition_id", "check_id", "passed", "metric_value",
            "threshold"]
    a = sorted(map(tuple, lazy.verdicts.select(*cols).collect()))
    b = sorted(map(tuple, summ.verdicts.select(*cols).collect()))
    assert a == b and len(a) == 4


def test_normal_law_rejects_uniform_data(spark):
    spec = {"properties": {"gate": {"x-distribution": {
        "family": "normal", "mean": 50, "std": 10, "bucketWidth": 10.0,
        "ksMax": 0.05}}}}
    assert CheckSuite(spec).run(_hash_gate_df(spark),
                                key="doc_id").ok() is False


@pytest.mark.parametrize("bad", [
    {},                                                  # nothing
    {"family": "uniform", "min": 0, "max": 1},           # no statistic
    {"family": "uniform", "min": 0, "ksMax": 0.1},       # missing max
    {"family": "exponential", "ksMax": 0.1},             # missing rate
    {"family": "normal", "mean": 0, "ksMax": 0.1},       # missing std
    {"family": "poisson", "rate": 1, "ksMax": 0.1},      # unknown family
    {"family": "uniform", "min": 0, "max": 1, "ksMax": 0.1,
     "bucketWidth": 0},                                  # bad width
    "uniform",                                           # not an object
])
def test_spec_validation_rejects(bad):
    with pytest.raises(SuiteError):
        validate_suite_spec({"properties": {"gate": {
            "x-distribution": bad}}})


def test_spec_and_metaschema_accept(spark):
    validate_suite_spec(_SPEC)
    assert validate_suite_with_engine(spark, _SPEC).ok()


def test_benford_baseline_masses():
    b = parametric_baseline("benford", {}, 1.0)
    assert set(b) == set(range(1, 10))
    assert abs(sum(b.values()) - SCALE) <= len(b)
    assert b[1] == pytest.approx(SCALE * math.log10(2), abs=2)
    assert b[9] == pytest.approx(SCALE * math.log10(10 / 9), abs=2)
    assert b[1] > b[2] > b[3] > b[9]  # strictly decreasing


def test_first_digit_extraction_edges(spark):
    from jsonschema_valid_spark.operators.distribution import (
        first_digit_histogram,
    )

    rows = [(1, 123.45), (2, -0.00456), (3, 9000.0), (4, 0.0),
            (5, None), (6, 1e-12),      # below decimal(38,10) scale
            (7, 7.0), (8, 0.1)]
    df = spark.createDataFrame(rows, "id: long, v: double")
    got = {r.bucket: r["count"]
           for r in first_digit_histogram(df, "v").collect()}
    # 123.45->1, -0.00456->4, 9000->9, 7->7, 0.1->1; zero/NULL/1e-12 excluded
    assert got == {1: 2, 4: 1, 9: 1, 7: 1}


def _benford_df(spark, fabricated=False):
    """Multiplicative growth (exp of uniform log) is Benford by
    construction; the fabricated variant is uniform on [10, 100) —
    every first digit equally likely, the classic made-up-numbers
    tell."""
    u = ((F.col("id") * 2654435761) % 100000) / 100000.0
    if fabricated:
        v = 10.0 + u * 90.0
    else:
        v = F.pow(F.lit(10.0), u * 6.0)  # log-uniform over 6 decades
    return spark.range(20000).select(
        F.col("id").alias("doc_id"), v.cast("double").alias("amount"))


_BENFORD_SPEC = {"properties": {"amount": {"x-distribution": {
    "family": "benford", "psiMax": 0.05, "chi2Max": 0.05}}}}


def test_benford_fit_passes_and_fabrication_trips(spark):
    assert CheckSuite(_BENFORD_SPEC).run(
        _benford_df(spark), key="doc_id").ok() is True
    res = CheckSuite(_BENFORD_SPEC).run(
        _benford_df(spark, fabricated=True), key="doc_id")
    got = {r["check_id"].rsplit("/", 1)[1]: r["passed"]
           for r in res.verdicts.collect()}
    assert got == {"psi": False, "chi2": False}


def test_benford_both_paths_agree(spark):
    df = _benford_df(spark, fabricated=True)
    lazy = CheckSuite(_BENFORD_SPEC).run(df, key="doc_id")
    summ = run_suite_summarized(CheckSuite(_BENFORD_SPEC), df,
                                key="doc_id")
    cols = ["partition_id", "check_id", "passed", "metric_value",
            "threshold"]
    a = sorted(map(tuple, lazy.verdicts.select(*cols).collect()))
    b = sorted(map(tuple, summ.verdicts.select(*cols).collect()))
    assert a == b and len(a) == 2


def test_benford_spec_rules(spark):
    validate_suite_spec(_BENFORD_SPEC)
    assert validate_suite_with_engine(spark, _BENFORD_SPEC).ok()
    with pytest.raises(SuiteError):
        # bucketWidth is meaningless for a digit histogram
        validate_suite_spec({"properties": {"amount": {"x-distribution": {
            "family": "benford", "psiMax": 0.05, "bucketWidth": 1.0}}}})
