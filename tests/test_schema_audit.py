"""Pre-flight schema audit — the non-throwing twin of compiler.bind: whole
gap list (missing required / undeclared / static type mismatch / bad names /
property-count) from df.schema alone, zero Spark jobs on the data."""

import pytest

from jsonschema_valid_spark import CheckSuite, SuiteBindError
from jsonschema_valid_spark.operators.schema_audit import (
    FAILING_STATUSES,
    schema_diff,
    schema_ok,
    schema_report,
)


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [(1, "a", "en", 1.0, 2.5)],
        "doc_id bigint, text string, lang string, score double, Bad_Col double")


SPEC = {
    "additionalProperties": False,
    "required": ["doc_id", "checksum"],
    "properties": {
        "doc_id": {"type": "integer"},       # ok: bigint
        "text": {"type": "string"},          # ok
        "lang": {"type": "integer"},         # dynamic: string coerces
        "score": {"type": "integer"},        # dynamic: 2.0 counts as integer
        "checksum": {"type": "string"},      # missing + required
        "title": {"type": "string"},         # missing, optional
        "Bad_Col": {"type": "array"},        # static mismatch (double)
    },
    "propertyNames": {"pattern": "^[a-z_]+$"},  # Bad_Col violates
}


def test_report_statuses(spark, df):
    got = {(r["column"], r["status"]) for r in
           schema_report(SPEC, df).collect()}
    assert got == {
        ("doc_id", "ok"), ("text", "ok"),
        ("lang", "dynamic"), ("score", "dynamic"),
        ("checksum", "missing_required"), ("title", "absent"),
        ("Bad_Col", "type_mismatch"), ("Bad_Col", "bad_name"),
    }


def test_report_matches_bind_refusal(spark, df):
    """Audit failing <=> bind refuses on the structural subset bind
    enforces (strict-mode undeclared columns, propertyNames); the audit
    ADDS the classes bind defers to constant-false row checks
    (missing_required, type_mismatch)."""
    assert not schema_ok(SPEC, df)
    strict = dict(SPEC, properties={k: v for k, v in SPEC["properties"].items()
                                    if k != "Bad_Col"})
    del strict["propertyNames"]
    assert {r["status"] for r in schema_report(strict, df).collect()} >= \
        {"undeclared"}
    with pytest.raises(SuiteBindError):
        CheckSuite(strict).bind(df)  # Bad_Col now undeclared under strict
    clean = {"properties": {"doc_id": {"type": "integer"},
                            "text": {"type": "string"}}}
    assert schema_ok(clean, df)
    CheckSuite(clean).bind(df)  # and bind agrees


def test_undeclared_and_pattern_routing(spark, df):
    spec = {"additionalProperties": False,
            "properties": {"doc_id": {"type": "integer"}},
            "patternProperties": {"^(text|lang)$": {"type": "string"}}}
    rep = {(r["column"], r["status"]) for r in
           schema_report(spec, df).collect()}
    # text ok via pattern; lang routed but declared string == ok;
    # score & Bad_Col neither declared nor matched -> undeclared
    assert ("text", "ok") in rep and ("lang", "ok") in rep
    assert ("score", "undeclared") in rep
    assert ("Bad_Col", "undeclared") in rep


def test_property_count_and_bool_suites(spark, df):
    rep = schema_report({"minProperties": 10}, df).collect()
    assert [(r["column"], r["status"]) for r in rep] == \
        [("<table>", "property_count")]
    assert schema_report(True, df).count() == 0
    rej = schema_report(False, df).collect()
    assert rej[0]["status"] == "reject_all"


def test_ref_resolution_in_audit(spark, df):
    spec = {"$defs": {"n": {"type": "integer"}},
            "properties": {"doc_id": {"$ref": "#/$defs/n"},
                           "text": {"$ref": "#/$defs/n"}}}
    rep = {(r["column"], r["status"]) for r in
           schema_report(spec, df).collect()}
    assert ("doc_id", "ok") in rep
    assert ("text", "dynamic") in rep  # string coerces to integer


def test_schema_diff(spark):
    old = spark.createDataFrame([(1, 2, "x", 1.5)],
                                "a bigint, b int, c string, d double")
    new = spark.createDataFrame([(1.0, 2, True, 7)],
                                "a double, b int, c boolean, e bigint")
    got = [(r["column"], r["status"], r["old"], r["new"])
           for r in schema_diff(old, new).collect()]
    assert got == [
        ("a", "widened", "bigint", "double"),
        ("c", "retyped", "string", "boolean"),
        ("d", "dropped", "double", "<absent>"),
        ("e", "added", "<absent>", "bigint"),
    ]
    assert schema_diff(old, old).count() == 0
    # narrowed: fractional -> integral
    nar = schema_diff(spark.createDataFrame([(1.0,)], "x double"),
                      spark.createDataFrame([(1,)], "x int")).collect()
    assert nar[0]["status"] == "narrowed"


def test_failing_statuses_frozen():
    assert "dynamic" not in FAILING_STATUSES
    assert "absent" not in FAILING_STATUSES
    # a `false` root suite rejects every row — the pre-flight gate must
    # fail it, not wave it through (ADVICE r5)
    assert "reject_all" in FAILING_STATUSES
