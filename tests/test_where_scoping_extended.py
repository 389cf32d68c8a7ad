"""`where` scoping for the verdict-only and membership-family dataset
keywords the matrix guard can't exercise uniformly (wave 38): x-drift,
x-distribution, x-quantile (tdigest backend), x-nearDup, x-linkage,
x-lmScore. Each case: the UNSCOPED run trips on the mixed fixture, the
run scoped to the clean subpopulation passes — an accepted-but-inert
where keeps failing and is caught."""

import pytest
from pyspark.sql import functions as F

from jsonschema_valid_spark import CheckSuite
from jsonschema_valid_spark.suite.spec import SuiteError, validate_suite_spec


def _verd(res, frag):
    return [r for r in res.verdicts.collect() if frag in r["check_id"]]


def test_drift_where(spark):
    # g0 matches the declared baseline exactly (PSI 0); g1 piles onto
    # one bucket and drags the FULL-table histogram off it
    rows = ([("g0", float(b * 10 + 5)) for b in range(5) for _ in range(4)]
            + [("g1", 95.0)] * 20)
    df = spark.createDataFrame(rows, "grp: string, v: double")
    baseline = {b: 4 for b in range(5)}
    node = {"baseline": baseline, "bucketWidth": 10.0, "psiMax": 0.1}
    full = CheckSuite({"properties": {"v": {"x-drift": node}}}) \
        .run(df, key="v")
    assert not all(r["passed"] for r in _verd(full, "x-drift"))
    scoped = CheckSuite({"properties": {"v": {"x-drift": {
        **node, "where": "grp = 'g0'"}}}}).run(df, key="v")
    assert all(r["passed"] for r in _verd(scoped, "x-drift"))


def test_distribution_where(spark):
    # g0 is exactly uniform over the declared support; g1 is a spike
    rows = ([("g0", float(v)) for v in range(0, 60, 4)]
            + [("g1", 5.0)] * 15)
    df = spark.createDataFrame(rows, "grp: string, v: double")
    node = {"family": "uniform", "min": -0.5, "max": 59.5,
            "bucketWidth": 10.0, "psiMax": 0.2}
    full = CheckSuite({"properties": {"v": {"x-distribution": node}}}) \
        .run(df, key="v")
    assert not all(r["passed"] for r in _verd(full, "x-distribution"))
    scoped = CheckSuite({"properties": {"v": {"x-distribution": {
        **node, "where": "grp = 'g0'"}}}}).run(df, key="v")
    assert all(r["passed"] for r in _verd(scoped, "x-distribution"))


def test_tdigest_quantile_where(spark):
    rows = ([(i, "g0", float(i % 20)) for i in range(40)]
            + [(100 + i, "g1", 1000.0) for i in range(40)])
    df = spark.createDataFrame(rows, "id: long, grp: string, n: double")
    node = {"q": 0.5, "max": 100.0, "backend": "tdigest"}
    full = CheckSuite({"properties": {"n": {"x-quantile": node}}}) \
        .run(df, key="id")
    assert not all(r["passed"] for r in _verd(full, "x-quantile"))
    scoped = CheckSuite({"properties": {"n": {"x-quantile": {
        **node, "where": "grp = 'g0'"}}}}).run(df, key="id")
    assert all(r["passed"] for r in _verd(scoped, "x-quantile"))
    # the fused percentile_approx default cannot scope: refused, never
    # silently ignored
    with pytest.raises(SuiteError, match="tdigest"):
        validate_suite_spec({"properties": {"n": {"x-quantile": {
            "q": 0.5, "max": 100.0, "where": "grp = 'g0'"}}}})


def test_neardup_where(spark):
    rows = [
        (1, "g0", "alpha beta gamma delta epsilon"),
        (2, "g0", "zeta eta theta iota kappa"),
        (3, "g1", "the quick brown fox jumps over the lazy dog"),
        (4, "g1", "the quick brown fox jumps over the lazy cat"),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, grp: string, "
                                     "text: string")
    node = {"method": "jaccard", "n": 2, "threshold": 0.5}
    full = CheckSuite({"properties": {"text": {"x-nearDup": node}}}) \
        .run(df, key="doc_id")
    assert full.violations.count() > 0
    scoped = CheckSuite({"properties": {"text": {"x-nearDup": {
        **node, "where": "grp = 'g0'"}}}}).run(df, key="doc_id")
    assert scoped.violations.count() == 0


def test_linkage_where(spark):
    rows = [
        (1, "TX", "john smith", 10.0), (2, "TX", "john smith", 10.0),
        (3, "CA", "alice jones", 5.0), (4, "CA", "bob brown", 7.0),
    ]
    df = spark.createDataFrame(rows, "rid: long, state: string, "
                                     "name: string, bal: double")
    node = {"blockOn": "state",
            "fields": [
                {"column": "name", "method": "levenshtein", "weight": 0.5},
                {"column": "bal", "method": "exact", "weight": 0.5}],
            "threshold": 0.9}
    full = CheckSuite({"properties": {"name": {"x-linkage": node}}}) \
        .run(df, key="rid")
    assert full.violations.count() > 0  # the TX twins link
    scoped = CheckSuite({"properties": {"name": {"x-linkage": {
        **node, "where": "state = 'CA'"}}}}).run(df, key="rid")
    assert scoped.violations.count() == 0


def test_lmscore_where(spark):
    # junk documents only in g1; a model trained on the corpus scores
    # them low. Scoped to g0 the gate goes silent.
    good = "the cat sat on the mat and the dog sat on the rug"
    rows = ([(i, "g0", good) for i in range(20)]
            + [(100 + i, "g1", "zzqx vvkj pprw qqmz llxy") for i in range(3)])
    df = spark.createDataFrame(rows, "doc_id: long, grp: string, "
                                     "text: string")
    from jsonschema_valid_spark.functions.text import unigram_model

    model = unigram_model(df.where("grp = 'g0'"), "text", vocab_size=50)
    node = {"minScore": -4.0, "model": "@m", "vocabSize": 50}
    full = CheckSuite({"properties": {"text": {"x-lmScore": node}}}) \
        .run(df, key="doc_id", context={"m": model})
    assert full.violations.count() > 0
    scoped = CheckSuite({"properties": {"text": {"x-lmScore": {
        **node, "where": "grp = 'g0'"}}}}).run(
        df, key="doc_id", context={"m": model})
    assert scoped.violations.count() == 0


def test_unsupported_where_refused():
    with pytest.raises(SuiteError, match="does not support 'where'"):
        validate_suite_spec({"properties": {"v": {"x-stats": {
            "avg": {"min": 0}, "where": "v > 0"}}}})
