"""Dispatch-matrix guard: EVERY dataset-scope x-keyword must emit a
verdict row in BOTH run paths — the regression class where a keyword
compiles to a DatasetCheck whose `kind` silently falls through an
engine elif chain (the r3 nested-if/then/else bug shape, and the exact
risk every new keyword wave reintroduces)."""

import pytest
from pyspark.sql import functions as F

from jsonschema_valid_spark import CheckSuite
from jsonschema_valid_spark.engine import run_suite_summarized


def _df(spark):
    rows = []
    for i in range(30):
        rows.append((i, f"g{i % 3}", float(i), float(i) * 2.0 + 1.0,
                     float(i * 60)))
    return spark.createDataFrame(
        rows, "id: long, grp: string, v: double, w: double, ts_s: double") \
        .withColumn("ts", F.timestamp_seconds(F.col("ts_s")))


# one minimal instance of every dataset-scope statistical/relational
# keyword added since wave 5 (the older families are pinned by their own
# driver queries); check_id fragment -> spec node
KEYWORD_SPECS = {
    "x-trend": {"v": {"x-trend": {"orderBy": "ts_s", "by": "grp",
                                  "min": -100.0, "max": 100.0}}},
    "x-distinctRatio": {"v": {"x-distinctRatio": {"min": 0.0001}}},
    "x-compliance": {"v": {"x-compliance": {"expr": "v >= 0",
                                            "min": 0.0001}}},
    "x-correlation": {"v": {"x-correlation": {"with": "w",
                                              "min": -1.0}}},
    "x-association": {"grp": {"x-association": {"with": "grp",
                                                "max": 1.0}}},
    "x-contiguous": {"id": {"x-contiguous": {"by": "grp",
                                             "maxMissing": 10_000}}},
    "x-acyclic": {"id": {"x-acyclic": {"parent": "id",
                                       "maxDepth": 4}}},
    "x-cohortParity": {"v": {"x-cohortParity": {
        "cohort": "grp", "baseline": "g0", "maxGap": 1e9}}},
    "x-reciprocal": {"id": {"x-reciprocal": {"with": "id"}}},
    "x-seasonality": {"v": {"x-seasonality": {
        "orderBy": "ts_s", "lag": 1, "by": "grp", "max": 0.999}}},
    "x-monotonic": {"v": {"x-monotonic": {"orderBy": "ts_s",
                                          "by": "grp"}}},
    "x-noOverlap": {"ts_s": {"x-noOverlap": {"endColumn": "w",
                                             "by": "grp"}}},
    "x-levelShift": {"v": {"x-levelShift": {"orderBy": "ts_s",
                                            "maxShift": 1e9,
                                            "window": 2,
                                            "allowGlobal": True}}},
    "x-entropy": {"grp": {"x-entropy": {"max": 100.0}}},
    "x-outlier": {"v": {"x-outlier": {"by": "grp", "maxZ": 100.0}}},
    "x-functionalDependency": {"id": {
        "x-functionalDependency": {"determines": "grp"}}},
    "x-rowCount": {"grp": {"x-rowCount": {"min": 1}}},
    "x-maxFrequency": {"grp": {"x-maxFrequency": {"maxFraction": 0.99}}},
    "x-eventOrder": {"ts": {"x-eventOrder": {
        "by": "grp", "first": "v < 10", "then": "v >= 10"}}},
    "x-session": {"ts": {"x-session": {"by": "grp", "gapSeconds": 1e9,
                                       "maxEvents": 10_000}}},
    "x-funnel": {"grp": {"x-funnel": {
        "key": "grp", "ts": "ts",
        "steps": [{"name": "lo", "when": "v < 10"},
                  {"name": "hi", "when": "v >= 10"}],
        "minRates": [0.0]}}},
    "x-distribution": {"v": {"x-distribution": {
        "family": "uniform", "min": -1, "max": 60,
        "bucketWidth": 10.0, "psiMax": 1e9}}},
}


@pytest.mark.parametrize("kw", sorted(KEYWORD_SPECS))
def test_keyword_emits_verdict_in_both_paths(spark, kw):
    df = _df(spark)
    suite = CheckSuite({"properties": KEYWORD_SPECS[kw]})
    lazy = CheckSuite({"properties": KEYWORD_SPECS[kw]}).run(df, key="id")
    lazy_ids = {r["check_id"] for r in lazy.verdicts.collect()}
    assert any(kw in cid for cid in lazy_ids), \
        f"{kw}: no verdict in the lazy path — kind fell through dispatch"
    summ = run_suite_summarized(suite, df, key="id")
    summ_ids = {r["check_id"] for r in summ.verdicts.collect()}
    assert any(kw in cid for cid in summ_ids), \
        f"{kw}: no verdict in the summarized path"


# ---- wave 38: universal `where` scoping --------------------------------
# A VIOLATING variant of each newly-scoped keyword: unscoped it must
# trip on the fixture; scoped to an empty subpopulation it must go
# silent. A keyword that accepted `where` but ignored it would keep its
# violations — the exact accepted-but-inert regression the central spec
# rule + _scoped hook exist to prevent. (x-unique / x-referential /
# the rate trio / x-seasonality / x-reciprocal scoping is pinned in
# their own test files; drift / distribution / tdigest-quantile /
# nearDup / linkage / lmScore / trend / distinctRatio / acyclic /
# decontamination / conditional-rowCount in
# test_where_scoping_extended.py; x-aggConsistency REFUSES where — a
# one-sided scope on a two-table reconciliation mislabels scoped-out
# parents as child_only.)
VIOLATING_SPECS = {
    "x-monotonic": {"v": {"x-monotonic": {
        "orderBy": "ts_s", "by": "grp", "direction": "decreasing"}}},
    "x-noOverlap": {"v": {"x-noOverlap": {"endColumn": "w",
                                          "by": "grp"}}},
    "x-levelShift": {"v": {"x-levelShift": {
        "orderBy": "ts_s", "maxShift": 0.5, "window": 2,
        "allowGlobal": True}}},
    "x-correlation": {"v": {"x-correlation": {"with": "w",
                                              "max": 0.5}}},
    "x-funnel": {"grp": {"x-funnel": {
        "key": "grp", "ts": "ts",
        "steps": [{"name": "hi", "when": "v >= 10"},
                  {"name": "lo", "when": "v < 10"}],
        "minRates": [0.5]}}},
    "x-eventOrder": {"ts": {"x-eventOrder": {
        "by": "grp", "first": "v >= 10", "then": "v < 10"}}},
    "x-session": {"ts": {"x-session": {"by": "grp", "gapSeconds": 1e9,
                                       "maxEvents": 2}}},
    "x-outlier": {"v": {"x-outlier": {"by": "grp", "maxZ": 0.1}}},
    "x-functionalDependency": {"grp": {
        "x-functionalDependency": {"determines": "v"}}},
    "x-maxFrequency": {"grp": {"x-maxFrequency": {"maxCount": 5}}},
    "x-rowCount": {"grp": {"x-rowCount": {"max": 5}}},
    "x-freshness": {"ts": {"x-freshness": {
        "asOf": "2024-01-01T00:00:00", "maxAgeHours": 1.0,
        "by": "grp"}}},
    "x-contiguous": {"id": {"x-contiguous": {"by": "grp",
                                             "maxMissing": 0}}},
    "x-association": {"grp": {"x-association": {"with": "grp",
                                                "max": 0.5}}},
    "x-entropy": {"grp": {"x-entropy": {"max": 0.1}}},
    "x-cohortParity": {"v": {"x-cohortParity": {
        "cohort": "grp", "baseline": "g0", "maxGap": 0.5}}},
}


def _with_where(spec: dict, where: str) -> dict:
    (col, kws), = spec.items()
    (kw, params), = kws.items()
    return {col: {kw: {**params, "where": where}}}


@pytest.mark.parametrize("kw", sorted(VIOLATING_SPECS))
def test_where_scope_is_applied_not_just_accepted(spark, kw):
    df = _df(spark)
    spec = VIOLATING_SPECS[kw]
    base = CheckSuite({"properties": spec}).run(df, key="id")
    assert base.violations.count() > 0, \
        f"{kw}: fixture must violate unscoped, or this test proves nothing"
    scoped = CheckSuite(
        {"properties": _with_where(spec, "grp = 'nope'")}).run(df, key="id")
    assert scoped.violations.count() == 0, \
        f"{kw}: violations survived an empty `where` scope — inert where"
    summ = run_suite_summarized(
        CheckSuite({"properties": _with_where(spec, "grp = 'nope'")}),
        df, key="id")
    assert summ.violations.count() == 0, \
        f"{kw}: inert where in the summarized path"
