"""Minimum end-to-end slice (SURVEY.md §7 step 2): derive the sequences
table, run the flagship suite, check verdicts + violations."""

import pytest
from pyspark.sql import functions as F

from jsonschema_valid_spark import CheckSuite
from jsonschema_valid_spark.sources.sequences import load_sequences, source_domain
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def sequences(spark):
    return load_sequences(spark, SF_DIR).cache()


FLAGSHIP_SUITE = {
    "$id": "flagship-sequence-validation",
    "version": 7,
    "type": "object",
    "required": ["doc_id", "tokens", "n_tok"],
    "properties": {
        "doc_id": {
            "type": "string",
            "pattern": "^doc-[0-9]{12}$",
            "x-unique": True,
        },
        "tokens": {
            "type": "array",
            "minItems": 1,
            "maxItems": 8192,
            "items": {"type": "integer", "minimum": 0, "exclusiveMaximum": 50257},
        },
        "n_tok": {
            "type": "integer",
            "minimum": 1,
            "maximum": 8192,
            "x-stats": {"min": {"min": 1}, "avg": {"min": 8, "max": 256}},
        },
        "source": {
            "type": "string",
            "x-nullRate": {"max": 0.05},
            "x-referential": {"domain": "@source_domain"},
        },
    },
    "x-rowExpr": "n_tok = size(tokens)",
}


@pytest.fixture(scope="module")
def result(spark, sequences):
    suite = CheckSuite(FLAGSHIP_SUITE)
    return suite.run(
        sequences, key="doc_id", partition_by="source",
        context={"source_domain": source_domain(spark, SF_DIR)},
    )


def test_violations_schema(result):
    assert [f.name for f in result.violations.schema.fields] == [
        "doc_id", "check_id", "observed", "expected", "instance_path"]


def test_invariant_violations_found(result, sequences):
    # did % 97 == 0 rows have n_tok = len+1
    n_bad = result.violations.where(F.col("check_id") == "x-rowExpr").count()
    expected = sequences.where(F.col("n_tok") != F.size("tokens")).count()
    assert n_bad == expected > 0


def test_token_range_violations(result):
    bad = result.violations.where(
        F.col("check_id") == "properties/tokens/items").count()
    assert bad > 0  # did % 101 == 0 rows carry a -5 token


def test_referential_violations_are_bogus(result):
    rows = result.violations.where(
        F.col("check_id") == "properties/source/x-referential").collect()
    assert rows and all(r["observed"] == "BOGUS" for r in rows)


def test_uniqueness_detects_duplicates(result):
    dups = result.violations.where(
        F.col("check_id") == "properties/doc_id/x-unique").count()
    assert dups > 0  # did % 103 == 0 rows are emitted twice


def test_verdicts_shape_and_nullrate_passes(result):
    v = result.verdicts
    assert [f.name for f in v.schema.fields] == [
        "partition_id", "check_id", "passed", "metric_value", "threshold"]
    nr = v.where(F.col("check_id") == "properties/source/x-nullRate").collect()
    # non-null source partitions have zero nulls → pass; the NULL-source
    # partition is 100% null → correctly fails the 5% threshold
    assert nr
    for r in nr:
        if r["partition_id"] is None:
            assert r["passed"] is False and r["metric_value"] == 1.0
        else:
            assert r["passed"] is True


def test_ok_is_false_on_corrupted_data(result):
    assert result.ok() is False


def test_clean_subset_passes(spark, sequences):
    # strip every injected corruption → suite must pass
    clean = (
        sequences.where("source != 'BOGUS' and source is not null")
        .where("n_tok = size(tokens)")
        .where(~F.exists("tokens", lambda t: (t < 0) | (t >= 50257)))
        .dropDuplicates(["doc_id"])
    )
    suite = CheckSuite(FLAGSHIP_SUITE)
    res = suite.run(clean, key="doc_id", partition_by="source",
                    context={"source_domain": source_domain(spark, SF_DIR)})
    assert res.ok() is True
    assert res.render() == "no violations"
