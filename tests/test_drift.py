"""Distribution-drift checks (FIXTURES.md F3 contract): an unshifted
regeneration must PASS vs its own baseline histogram; a shifted one must
FAIL KS/PSI."""

import pytest
from pyspark.sql import functions as F

from jsonschema_valid_spark import CheckSuite, validate
from jsonschema_valid_spark.operators.drift import histogram, ks, psi

BUCKET = 8.0


def _gen(spark, n, shift=0):
    """Deterministic n_tok distribution; `shift` displaces the mean."""
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        ((F.col("id") * 37) % 120 + 8 + shift).cast("int").alias("n_tok"),
    )


@pytest.fixture(scope="module")
def baseline(spark):
    hist = histogram(_gen(spark, 20000), "n_tok", BUCKET).collect()
    return {int(r["bucket"]): int(r["count"]) for r in hist}


def test_unshifted_passes(spark, baseline):
    df = _gen(spark, 20000)
    h = histogram(df, "n_tok", BUCKET)
    assert psi(h, baseline, spark) < 1e-9
    assert ks(h, baseline, spark) < 1e-9


def test_shifted_fails(spark, baseline):
    df = _gen(spark, 20000, shift=30)
    h = histogram(df, "n_tok", BUCKET)
    assert psi(h, baseline, spark) > 0.1
    assert ks(h, baseline, spark) > 0.05


def test_drift_through_suite(spark, baseline):
    suite_spec = {
        "properties": {
            "n_tok": {"x-drift": {"baseline": baseline, "bucketWidth": BUCKET,
                                  "psiMax": 0.1, "ksMax": 0.05}},
        },
    }
    ok_res = validate(_gen(spark, 20000), suite_spec, key="doc_id")
    verd = {r["check_id"]: r for r in ok_res.verdicts.collect()}
    assert verd["properties/n_tok/x-drift/psi"]["passed"]
    assert verd["properties/n_tok/x-drift/ks"]["passed"]

    bad_res = validate(_gen(spark, 20000, shift=30), suite_spec, key="doc_id")
    verd = {r["check_id"]: r for r in bad_res.verdicts.collect()}
    assert not verd["properties/n_tok/x-drift/psi"]["passed"]
    assert not verd["properties/n_tok/x-drift/ks"]["passed"]
    assert bad_res.ok() is False


def test_subsampled_same_distribution_passes(spark, baseline):
    """Histograms are normalized: half the rows, same shape ⇒ no drift."""
    df = _gen(spark, 10000)
    h = histogram(df, "n_tok", BUCKET)
    assert psi(h, baseline, spark) < 1e-6


def test_chi2_matches_python(spark):
    from jsonschema_valid_spark.operators.drift import chi2_value_df, histogram

    df = spark.createDataFrame([(float(i % 4),) for i in range(100)], "v: double")
    baseline = {0: 40, 1: 20, 2: 20, 3: 20}
    got = chi2_value_df(histogram(df, "v", 1.0), baseline, spark).first()["value"]
    eps = 1e-9
    expect = sum((0.25 - b / 100) ** 2 / (b / 100 + eps)
                 for b in (40, 20, 20, 20))
    assert abs(got - expect) < 1e-12


def test_x_drift_chi2_keyword(spark):
    from jsonschema_valid_spark import CheckSuite

    docs = spark.createDataFrame(
        [(i, float(i % 10)) for i in range(100)], "id: long, v: double")
    flat = {str(b): 10 for b in range(10)}
    ok = CheckSuite({"properties": {"v": {"x-drift": {
        "baseline": flat, "bucketWidth": 1.0, "chi2Max": 0.01}}}}).run(
        docs, key="id")
    assert ok.ok() is True
    skewed = {str(b): (100 if b == 0 else 1) for b in range(10)}
    bad = CheckSuite({"properties": {"v": {"x-drift": {
        "baseline": skewed, "bucketWidth": 1.0, "chi2Max": 0.01}}}}).run(
        docs, key="id")
    assert bad.ok() is False
