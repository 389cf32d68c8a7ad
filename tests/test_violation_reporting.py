"""Exact violation-row assertions — the lift of the reference's
error-reporting unit tests (``/root/reference/src/error.rs:133-154``
``test_pretty_print_errors`` and ``validators.rs:1085-1113``
``test_additional_properties_errors``): check_id schema paths, observed
witnesses, expected texts, and the renderer."""

import pytest
from pyspark.sql import functions as F

from jsonschema_valid_spark import CheckSuite, SuiteBindError


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [("d1", 5, "abc", [1, 2]), ("d2", -3, "x", [1, 200]),
         ("d3", 7, None, None)],
        "id string, x long, s string, a array<long>")


def _viols(res):
    return {(r["doc_id"], r["check_id"], r["observed"], r["expected"])
            for r in res.violations.collect()}


def test_exact_violation_rows(spark, df):
    suite = CheckSuite({
        "version": 7,
        "required": ["s"],
        "properties": {
            "x": {"minimum": 0},
            "s": {"minLength": 2},
            "a": {"items": {"maximum": 100}},
        },
    })
    got = _viols(suite.run(df, key="id"))
    assert got == {
        ("d2", "properties/x/minimum", "-3", ">= 0"),
        ("d2", "properties/s/minLength", "x", "length >= 2"),
        ("d2", "properties/a/items", "[1, 200]", "all items valid"),
        ("d3", "required/s", "NULL", "s is not null"),
    }


def test_schema_path_nesting(spark, df):
    """check_id is the slash-joined schema path (≙ error.rs:29-35 path
    accumulation, built at compile time instead of leaf-to-root reversal)."""
    suite = CheckSuite({
        "version": 7,
        "properties": {"x": {"allOf": [{"minimum": 0}, {"maximum": 6}]}},
    })
    got = {(r["doc_id"], r["check_id"])
           for r in suite.run(df, key="id").violations.collect()}
    assert got == {("d2", "properties/x/allOf"), ("d3", "properties/x/allOf")}


def test_renderer_wraps_and_labels(spark, df):
    suite = CheckSuite({"properties": {"x": {"minimum": 0}}})
    out = suite.run(df, key="id").render()
    assert "doc d2" in out
    assert "expected >= 0" in out
    assert "observed -3" in out
    assert "[at properties/x/minimum]" in out


def test_missing_required_column_fails_all_rows(spark, df):
    """required on an absent column ⇒ every row violates (presence check,
    validators.rs:792-818)."""
    suite = CheckSuite({"required": ["nope"]})
    res = suite.run(df, key="id")
    assert res.violations.count() == 3
    assert res.violations.select("check_id").distinct().first()[0] == "required/nope"


def test_strict_schema_bind_error_lists_columns(spark, df):
    with pytest.raises(SuiteBindError) as ei:
        CheckSuite({"properties": {"id": True, "x": True},
                    "additionalProperties": False}).run(df, key="id")
    assert "'a'" in str(ei.value) and "'s'" in str(ei.value)


def test_property_names_bind_check(spark, df):
    with pytest.raises(SuiteBindError):
        CheckSuite({"propertyNames": {"maxLength": 1}}).run(df, key="id")
    # passes when names conform
    CheckSuite({"propertyNames": {"pattern": "^[a-z]+$"}}).run(df, key="id")


def test_max_properties_bind_check(spark, df):
    with pytest.raises(SuiteBindError):
        CheckSuite({"maxProperties": 2}).run(df, key="id")
    CheckSuite({"minProperties": 2, "maxProperties": 10}).run(df, key="id")


def test_parity_keyword(spark, df):
    """x-parity: per-row equality vs a reference table (BASELINE.json:15
    token-array invariant) through the suite spec."""
    ref = spark.createDataFrame(
        [("d1", [1, 2]), ("d2", [1, 999]), ("d3", None)],
        "id string, a array<long>")
    suite = CheckSuite({"properties": {
        "a": {"x-parity": {"reference": "@ref", "key": "id"}}}})
    res = suite.run(df, key="id", context={"ref": ref})
    got = {(r["doc_id"], r["check_id"]) for r in res.violations.collect()}
    assert got == {("d2", "properties/a/x-parity")}

    # arrow mode: same result through the Arrow-batched mapInPandas kernel
    suite2 = CheckSuite({"properties": {
        "a": {"x-parity": {"reference": "@ref", "key": "id", "mode": "arrow"}}}})
    res2 = suite2.run(df, key="id", context={"ref": ref})
    got2 = {(r["doc_id"], r["check_id"]) for r in res2.violations.collect()}
    assert got2 == got


def test_markdown_report_bounded_and_deterministic(spark):
    from jsonschema_valid_spark import CheckSuite

    rows = [(i, "s%d" % (i % 3), i % 7) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id: long, src: string, v: long")
    suite = CheckSuite({"properties": {"v": {"minimum": 2}}})
    res = suite.run(df, key="doc_id", partition_by="src")
    rep = res.report(k_exemplars=3)
    assert rep.startswith("# Validation report")
    assert "**Status: FAILED**" in rep
    assert "| `properties/v/minimum` |" in rep
    # violation counts: v in {0,1} -> 2/7 of 200 rows ≈ 58
    n = sum(1 for _, _, v in rows if v < 2)
    assert ("| `properties/v/minimum` | %d |" % n) in rep
    # exemplar section bounded at k per check
    ex_lines = [ln for ln in rep.splitlines() if ln.startswith("- `")]
    assert 1 <= len(ex_lines) <= 3
    assert rep == suite.run(df, key="doc_id", partition_by="src") \
        .report(k_exemplars=3)  # deterministic rerun

    ok = CheckSuite({"properties": {"v": {"minimum": 0}}}).run(
        df, key="doc_id", partition_by="src")
    rep_ok = ok.report()
    assert "**Status: PASSED**" in rep_ok
    assert "## Violations" not in rep_ok
