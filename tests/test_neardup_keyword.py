"""x-nearDup: near-duplicate membership as a declarative suite keyword
(functions/dedup.py neardup_violations + engine wiring in both run paths)."""

import pytest
from pyspark.sql import functions as F

from jsonschema_valid_spark import CheckSuite
from jsonschema_valid_spark.engine import run_suite_summarized
from jsonschema_valid_spark.suite.spec import SuiteError, validate_suite_spec


def _docs(spark):
    # 1 and 2 are bigram near-dups; 3 shares nothing; 4 duplicates 1 exactly
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),
        (3, "completely different content with no overlap at all"),
        (4, "the quick brown fox jumps over the lazy dog"),
    ]
    return spark.createDataFrame(rows, "doc_id: long, text: string")


def test_jaccard_method_violations(spark):
    suite = CheckSuite({"properties": {"text": {
        "x-nearDup": {"method": "jaccard", "n": 2, "threshold": 0.5}}}})
    res = suite.run(_docs(spark), key="doc_id")
    viol = {r["doc_id"]: r for r in res.violations.collect()}
    assert set(viol) == {"2", "4"}
    assert viol["2"]["observed"] == "duplicate of 1"
    assert viol["2"]["check_id"] == "properties/text/x-nearDup"
    verd = [r for r in res.verdicts.collect()
            if r["check_id"] == "properties/text/x-nearDup"]
    assert len(verd) == 1
    assert not verd[0]["passed"] and verd[0]["metric_value"] == 2.0


def test_minhash_and_simhash_methods(spark):
    df = _docs(spark)
    for method, knobs in (("minhash", {"threshold": 0.5, "n": 2}),
                          ("simhash", {"maxHamming": 3})):
        suite = CheckSuite({"properties": {"text": {
            "x-nearDup": {"method": method, **knobs}}}})
        viol = {r["doc_id"]
                for r in suite.run(df, key="doc_id").violations.collect()}
        # the exact duplicate pair (1,4) must always be caught
        assert "4" in viol, method
        assert "1" not in viol, method  # survivor stays


def test_simhash_maxhamming_bound_rejected(spark):
    # review find: the 4x16-bit pigeonhole only guarantees candidate
    # recall up to distance 3 — larger bounds silently under-reported
    # and are now refused at spec AND operator level
    from jsonschema_valid_spark.functions.dedup import simhash_pairs
    from jsonschema_valid_spark.suite.spec import (
        SuiteError,
        validate_suite_spec,
    )

    with pytest.raises(SuiteError, match="pigeonhole"):
        validate_suite_spec({"properties": {"text": {"x-nearDup": {
            "method": "simhash", "maxHamming": 10}}}})
    with pytest.raises(ValueError, match="pigeonhole"):
        simhash_pairs(_docs(spark), "doc_id", "text", max_hamming=4)


def test_semantic_method(spark):
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.999, 0.04]), (3, [-1.0, 0.0])],
        "vec_id: long, v: array<double>")
    suite = CheckSuite({"properties": {"v": {
        "x-nearDup": {"method": "semantic", "dim": 2, "threshold": 0.9,
                      "nCells": 2, "nAssign": 2}}}})
    res = suite.run(emb, key="vec_id")
    viol = {r["doc_id"] for r in res.violations.collect()}
    assert viol == {"2"}


def test_summarized_path_matches_lazy(spark):
    df = _docs(spark)
    spec = {"properties": {"text": {
        "x-nearDup": {"method": "jaccard", "n": 2, "threshold": 0.5}}}}
    lazy = CheckSuite(spec).run(df, key="doc_id")
    summ = run_suite_summarized(CheckSuite(spec), df, key="doc_id")
    lv = {(r["doc_id"], r["observed"]) for r in lazy.violations.collect()}
    sv = {(r["doc_id"], r["observed"]) for r in summ.violations.collect()
          if r["check_id"] == "properties/text/x-nearDup"}
    assert lv == sv
    summ.unpersist()


def test_clean_corpus_passes(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta epsilon zeta")],
        "doc_id: long, text: string")
    suite = CheckSuite({"properties": {"text": {
        "x-nearDup": {"method": "jaccard", "n": 2, "threshold": 0.5}}}})
    res = suite.run(df, key="doc_id")
    assert res.violations.count() == 0
    verd = [r for r in res.verdicts.collect()
            if r["check_id"] == "properties/text/x-nearDup"]
    assert verd and verd[0]["passed"]


def test_spec_validation():
    validate_suite_spec({"properties": {"text": {
        "x-nearDup": {"method": "minhash", "threshold": 0.8}}}})
    for bad in ({}, {"method": "lsh"}, {"threshold": 0.8}, 3, True):
        with pytest.raises(SuiteError):
            validate_suite_spec({"properties": {"text": {"x-nearDup": bad}}})


def test_unknown_method_raises_at_run(spark):
    from jsonschema_valid_spark.functions.dedup import neardup_violations

    with pytest.raises(ValueError, match="x-nearDup method"):
        neardup_violations(_docs(spark), "text", "cid", key="doc_id",
                           params={"method": "wat"})


def test_metaschema_accepts_and_rejects(spark):
    from jsonschema_valid_spark.suite.metaschema import (
        validate_suite_with_engine,
    )

    good = {"properties": {"text": {"x-nearDup": {"method": "jaccard"}}}}
    assert validate_suite_with_engine(spark, good).ok()
    bad = {"properties": {"text": {"x-nearDup": {"threshold": 0.5}}}}
    assert not validate_suite_with_engine(spark, bad).ok()


def test_spans_method(spark):
    boiler = "zqxwvutsrqponmlkj"  # 17 chars >= winnow guarantee (w+k-1=15)
    df = spark.createDataFrame(
        [(1, "first document body " + boiler + " trailing words"),
         (2, "other opening then " + boiler + " and more"),
         (3, "nothing in common with anybody here at all")],
        "doc_id: long, text: string")
    suite = CheckSuite({"properties": {"text": {
        "x-nearDup": {"method": "spans", "k": 8, "w": 8,
                      "minShared": 1}}}})
    res = suite.run(df, key="doc_id")
    viol = {r["doc_id"]: r for r in res.violations.collect()}
    assert set(viol) == {"2"}
    assert viol["2"]["observed"] == "duplicate of 1"


def test_semantic_centroids_from_context(spark):
    """Trained centroids reach x-nearDup via '@name' context indirection
    (same pattern as x-lmScore's @model)."""
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.999, 0.04]), (3, [-1.0, 0.0])],
        "vec_id: long, v: array<double>")
    cents = [[1.0, 0.0], [-1.0, 0.0]]
    suite = CheckSuite({"properties": {"v": {
        "x-nearDup": {"method": "semantic", "dim": 2, "threshold": 0.9,
                      "centroids": "@cents"}}}})
    res = suite.run(emb, key="vec_id", context={"cents": cents})
    assert {r["doc_id"] for r in res.violations.collect()} == {"2"}
