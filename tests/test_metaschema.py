"""Self-hosted metaschema (VERDICT r2 item 2): the suite-metaschema is
itself a CheckSuite run through the standard engine, and must agree with
the hand-rolled walker (validate_suite_spec) on every conformance-corpus
suite and on crafted invalid suites."""

import glob
import json
import os

import pytest

from jsonschema_valid_spark.suite.metaschema import validate_suite_with_engine
from jsonschema_valid_spark.suite.spec import SuiteError, validate_suite_spec

HERE = os.path.dirname(os.path.abspath(__file__))

CORPUS_SUITES = []
for path in sorted(glob.glob(f"{HERE}/conformance/*.json")):
    with open(path) as f:
        for case in json.load(f):
            CORPUS_SUITES.append(pytest.param(
                case["suite"],
                id=f"{os.path.basename(path)}::{case['description'][:48]}"))


@pytest.mark.parametrize("suite", CORPUS_SUITES)
def test_engine_metaschema_agrees_with_walker_on_corpus(spark, suite):
    """Every corpus suite is walker-valid (test_conformance asserts that);
    the engine-hosted metaschema must agree."""
    validate_suite_spec(suite)  # precondition: walker accepts
    res = validate_suite_with_engine(spark, suite)
    bad = res.violations.collect()
    assert res.ok(), [tuple(r) for r in bad]


INVALID_SUITES = [
    ("bad-type-name", {"properties": {"x": {"type": "decimal"}}}),
    ("bad-type-in-list", {"properties": {"x": {"type": ["string", "float"]}}}),
    ("empty-type-list", {"properties": {"x": {"type": []}}}),
    ("empty-enum", {"properties": {"x": {"enum": []}}}),
    ("string-minimum", {"properties": {"x": {"minimum": "5"}}}),
    ("bool-maximum", {"properties": {"x": {"maximum": True}}}),
    ("zero-multipleOf", {"properties": {"x": {"multipleOf": 0}}}),
    ("negative-minLength", {"properties": {"x": {"minLength": -1}}}),
    ("float-maxItems", {"properties": {"x": {"maxItems": 2.5}}}),
    ("bad-regex-pattern", {"properties": {"x": {"pattern": "a{2,1}"}}}),
    ("nonstring-format", {"properties": {"x": {"format": 7}}}),
    ("nonbool-uniqueItems", {"properties": {"x": {"uniqueItems": "yes"}}}),
    ("array-properties", {"properties": ["x"]}),
    ("required-nonstrings", {"required": [1, 2]}),
    ("empty-allOf", {"allOf": []}),
    ("scalar-anyOf-member", {"anyOf": [{"type": "string"}, 42]}),
    ("nonstring-ref", {"$ref": 7}),
    # NOTE r4: draft4 exclusiveMinimum WITHOUT the minimum sibling is no
    # longer invalid — the reference treats the lone flag as inert
    # (validators.rs:416-445; draft-gating matrix in test_official_suite) —
    # but a NON-BOOLEAN draft4 exclusive stays invalid:
    ("draft4-numeric-exclusive",
     {"version": 4, "properties": {"x": {"exclusiveMinimum": 5}}}),
    ("draft7-boolean-exclusive",
     {"properties": {"x": {"exclusiveMinimum": True}}}),
    ("empty-nullRate", {"properties": {"x": {"x-nullRate": {}}}}),
    ("x-unique-no-approx", {"properties": {"x": {"x-unique": {"rsd": 0.1}}}}),
    ("x-unique-empty-list", {"x-unique": []}),
    ("x-unique-int-list", {"x-unique": [1]}),
    ("x-referential-no-domain",
     {"properties": {"x": {"x-referential": {"table": "t"}}}}),
    ("x-stats-unknown-stat",
     {"properties": {"x": {"x-stats": {"median": {"min": 0}}}}}),
    ("x-quantile-no-q", {"properties": {"x": {"x-quantile": {"min": 0}}}}),
    ("x-drift-no-baseline",
     {"properties": {"x": {"x-drift": {"psiMax": 0.2}}}}),
    ("x-parity-no-reference", {"properties": {"x": {"x-parity": {}}}}),
    ("x-lmScore-no-min", {"properties": {"x": {"x-lmScore": {"alpha": 1.0}}}}),
    ("x-monotonic-no-orderby", {"properties": {"x": {"x-monotonic": {
        "by": "g"}}}}),
    ("x-monotonic-scalar", {"properties": {"x": {"x-monotonic": "seq"}}}),
    ("x-rowCount-empty", {"properties": {"x": {"x-rowCount": {}}}}),
    ("x-rowCount-unknown-key", {"properties": {"x": {"x-rowCount": {
        "limit": 2}}}}),
    ("x-linkage-no-block", {"properties": {"x": {"x-linkage": {
        "fields": [{"column": "x", "method": "exact"}],
        "threshold": 0.9}}}}),
    ("x-distribution-no-family",
     {"properties": {"x": {"x-distribution": {"ksMax": 0.1}}}}),
    ("x-maxFrequency-empty", {"properties": {"x": {"x-maxFrequency": {}}}}),
    ("x-maxFrequency-unknown-key", {"properties": {"x": {"x-maxFrequency": {
        "maxShare": 0.2}}}}),
    ("x-tokenShape-empty", {"properties": {"x": {"x-tokenShape": {}}}}),
    ("x-tokenShape-unknown-key", {"properties": {"x": {"x-tokenShape": {
        "prefix": [1]}}}}),
    ("x-freshness-no-asof", {"properties": {"x": {"x-freshness": {
        "maxAgeHours": 2}}}}),
    ("x-noOverlap-no-end", {"properties": {"x": {"x-noOverlap": {
        "by": "g"}}}}),
    ("x-outlier-no-maxz", {"properties": {"x": {"x-outlier": {
        "by": "g"}}}}),
    ("x-session-no-gap", {"properties": {"x": {"x-session": {
        "by": "g", "maxEvents": 5}}}}),
    ("x-session-no-bound", {"properties": {"x": {"x-session": {
        "by": "g", "gapSeconds": 600}}}}),
    ("x-eventOrder-no-then", {"properties": {"x": {"x-eventOrder": {
        "by": "g", "first": "a = 1"}}}}),
    ("x-correlation-no-with", {"properties": {"x": {"x-correlation": {
        "min": 0.5}}}}),
    ("x-levelShift-no-orderby", {"properties": {"x": {"x-levelShift": {
        "maxShift": 5}}}}),
    ("x-unique-within-no-ts", {"properties": {"x": {"x-unique": {
        "withinSeconds": 60}}}}),
    ("x-levelShift-no-maxshift", {"properties": {"x": {"x-levelShift": {
        "orderBy": "m"}}}}),
    ("x-entropy-no-bound", {"properties": {"x": {"x-entropy": {
        "by": "src"}}}}),
    ("x-correlation-no-bound", {"properties": {"x": {"x-correlation": {
        "with": "y"}}}}),
    ("x-association-no-with", {"properties": {"x": {"x-association": {
        "min": 0.5}}}}),
    ("x-contiguous-nonobject", {"properties": {"x": {
        "x-contiguous": 5}}}),
    ("x-association-no-bound", {"properties": {"x": {"x-association": {
        "with": "y"}}}}),
    ("x-acyclic-no-parent", {"properties": {"x": {"x-acyclic": {
        "maxDepth": 4}}}}),
    ("x-cohortParity-no-baseline", {"properties": {"x": {
        "x-cohortParity": {"cohort": "arm", "maxGap": 0.1}}}}),
    ("x-reciprocal-no-with", {"properties": {"x": {"x-reciprocal": {
        "matchCounts": True}}}}),
    ("x-seasonality-no-lag", {"properties": {"x": {"x-seasonality": {
        "orderBy": "ts", "max": 0.5}}}}),
    ("x-trend-no-orderby", {"properties": {"x": {"x-trend": {
        "max": 1.0}}}}),
    ("x-distinctRatio-no-bound", {"properties": {"x": {"x-distinctRatio": {
        "by": "g"}}}}),
    ("x-compliance-no-expr", {"properties": {"x": {"x-compliance": {
        "min": 0.9}}}}),
    ("x-funnel-no-steps", {"properties": {"x": {"x-funnel": {
        "key": "u", "ts": "t", "minRates": [0.5]}}}}),
    ("x-compliance-no-bound", {"properties": {"x": {"x-compliance": {
        "expr": "v > 0"}}}}),
    ("x-trend-no-bound", {"properties": {"x": {"x-trend": {
        "orderBy": "m"}}}}),
    ("x-eventOrder-no-by", {"properties": {"x": {"x-eventOrder": {
        "first": "a = 1", "then": "b = 1"}}}}),
    ("x-functionalDependency-empty",
     {"properties": {"x": {"x-functionalDependency": {}}}}),
    ("x-kAnonymity-no-quasi", {"x-kAnonymity": {"k": 2}}),
    ("x-kAnonymity-no-floor", {"x-kAnonymity": {"quasi": ["a"]}}),
    ("nonstring-rowexpr", {"x-rowExpr": 42}),
    ("scalar-schema-node", {"properties": {"x": 42}}),
    ("dependency-nonstring-list", {"dependencies": {"a": [1]}}),
    ("nested-bad", {"properties": {"x": {"items": {"anyOf": [
        {"type": "nope"}]}}}}),
]


@pytest.mark.parametrize(
    "spec", [p for _, p in INVALID_SUITES],
    ids=[n for n, _ in INVALID_SUITES])
def test_invalid_suite_caught_by_both(spark, spec):
    with pytest.raises(SuiteError):
        validate_suite_spec(spec)
    res = validate_suite_with_engine(spark, spec)
    assert not res.ok(), "engine-hosted metaschema accepted an invalid suite"


def test_metaschema_validates_itself(spark):
    """Self-hosting closure: the metaschema is a valid suite under BOTH the
    walker and the engine-hosted metaschema (≙ draft7.json validating
    itself against itself)."""
    from jsonschema_valid_spark.suite.metaschema import METASCHEMA_SUITE

    validate_suite_spec(METASCHEMA_SUITE)
    assert validate_suite_with_engine(spark, METASCHEMA_SUITE).ok()


def test_bool_suites_trivially_valid(spark):
    assert validate_suite_with_engine(spark, True).ok()
    assert validate_suite_with_engine(spark, False).ok()


def test_violation_rows_name_the_offending_path(spark):
    res = validate_suite_with_engine(
        spark, {"properties": {"n_tok": {"minimum": "zero"}}})
    rows = res.violations.collect()
    assert rows
    assert any("properties/n_tok/minimum" in r["doc_id"] for r in rows)
