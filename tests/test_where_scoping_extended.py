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


def test_trend_and_distinct_ratio_where(spark):
    rows = ([(i, "g0", i, float(i)) for i in range(20)]          # slope 1
            + [(100 + i, "g1", i, 5.0) for i in range(20)])      # slope 0
    df = spark.createDataFrame(rows, "id: long, grp: string, o: int, "
                                     "v: double")
    tnode = {"orderBy": "o", "by": "grp", "max": 0.5}
    full = CheckSuite({"properties": {"v": {"x-trend": tnode}}}) \
        .run(df, key="id")
    assert {r.doc_id for r in full.violations.collect()} == {"g0"}
    scoped = CheckSuite({"properties": {"v": {"x-trend": {
        **tnode, "where": "grp = 'g1'"}}}}).run(df, key="id")
    assert scoped.violations.count() == 0

    # distinctRatio: g1's constant v collapses the ratio; scope it out
    dnode = {"by": "grp", "min": 0.5}
    full = CheckSuite({"properties": {"v": {"x-distinctRatio": dnode}}}) \
        .run(df, key="id")
    assert {r.doc_id for r in full.violations.collect()} == {"g1"}
    scoped = CheckSuite({"properties": {"v": {"x-distinctRatio": {
        **dnode, "where": "grp = 'g0'"}}}}).run(df, key="id")
    assert scoped.violations.count() == 0


def test_acyclic_where(spark):
    # a 2-cycle between quarantined nodes; active nodes form a clean
    # chain to the root — "only active nodes participate"
    rows = [(1, "active", None), (2, "active", 1), (3, "active", 2),
            (10, "quarantined", 11), (11, "quarantined", 10)]
    df = spark.createDataFrame(rows, "nid: long, state: string, pid: long")
    node = {"parent": "pid", "maxDepth": 8}
    full = CheckSuite({"properties": {"nid": {"x-acyclic": node}}}) \
        .run(df, key="nid")
    assert full.violations.count() == 2  # both cycle members
    scoped = CheckSuite({"properties": {"nid": {"x-acyclic": {
        **node, "where": "state = 'active'"}}}}).run(df, key="nid")
    assert scoped.violations.count() == 0


def test_decontamination_where(spark):
    bench = spark.createDataFrame(
        [("the secret benchmark answer is forty two exactly",)],
        "text: string")
    docs = spark.createDataFrame(
        [(1, "train", "a clean document about spark joins here today"),
         (2, "eval", "leaked: the secret benchmark answer is forty two "
                     "exactly wow")],
        "doc_id: long, split: string, text: string")
    node = {"benchmark": "@bench", "n": 5}
    full = CheckSuite({"properties": {"text": {
        "x-decontamination": node}}}).run(
        docs, key="doc_id", context={"bench": bench})
    assert full.violations.count() == 1
    # only the TRAINING split needs decontamination — the eval doc is
    # ALLOWED to contain benchmark text
    scoped = CheckSuite({"properties": {"text": {"x-decontamination": {
        **node, "where": "split = 'train'"}}}}).run(
        docs, key="doc_id", context={"bench": bench})
    assert scoped.violations.count() == 0


def test_rowcount_where_is_conditional_count(spark):
    # x-rowCount's where scopes WHICH ROWS COUNT, not which groups
    # exist: a group whose rows are ALL out of scope counts 0 and a
    # min bound FLAGS it (filter-then-group would silently lose it)
    rows = ([("EU", "stale")] * 4 + [("US", "active")] * 4
            + [("AP", "active")] * 2)
    df = spark.createDataFrame(rows, "region: string, status: string")
    node = {"min": 1, "where": "status = 'active'"}
    res = CheckSuite({"properties": {"region": {"x-rowCount": node}}}) \
        .run(df, key="region")
    v = {r.doc_id: r.observed for r in res.violations.collect()}
    assert v == {"EU": "count=0"}  # the all-stale region is FLAGGED
    # perGroup verdicts enumerate every region with its in-scope count
    resg = CheckSuite({"properties": {"region": {"x-rowCount": {
        **node, "verdicts": "perGroup"}}}}).run(df, key="region")
    got = {r.partition_id: (r.passed, int(r.metric_value))
           for r in resg.verdicts.collect()}
    assert got == {"EU": (False, 0), "US": (True, 4), "AP": (True, 2)}


def test_aggconsistency_where_refused():
    # a one-sided scope on a two-table reconciliation would relabel
    # scoped-out parents as child_only false alarms — refused outright
    with pytest.raises(SuiteError, match="does not support 'where'"):
        validate_suite_spec({"properties": {"total": {
            "x-aggConsistency": {"child": "@items", "key": "ok",
                                 "childKey": "ik", "childAgg": "sum(a)",
                                 "where": "ok > 0"}}}})


def test_engine_metaschema_accepts_scoped_strict_keywords(spark):
    # the engine-hosted metaschema's key whitelists must admit `where`
    # wherever the walker does (rowCount/maxFrequency enumerate keys)
    from jsonschema_valid_spark.suite.metaschema import (
        validate_suite_with_engine,
    )

    for spec in [
        {"properties": {"g": {"x-rowCount": {"max": 5,
                                             "where": "g = 'a'"}}}},
        {"properties": {"g": {"x-maxFrequency": {"maxCount": 5,
                                                 "where": "g = 'a'"}}}},
    ]:
        res = validate_suite_with_engine(spark, spec)
        assert res.ok(), [tuple(r) for r in res.violations.collect()]
