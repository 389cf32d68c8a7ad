"""MapType open-keyed-object keyword forms: patternProperties,
additionalProperties, properties, required (SURVEY §2.1 #19-23 MapType
column mappings)."""

import pytest

from jsonschema_valid_spark import validate


@pytest.fixture(scope="module")
def df(spark):
    rows = [
        ("a", {"k1": "val1", "k2": "val2"}),
        ("b", {"k1": "x"}),                      # k-value too short
        ("c", {"k1": "val1", "other": "zzz"}),   # undeclared key
        ("d", {"k2": "val2"}),                   # missing required k1
    ]
    return spark.createDataFrame(rows, "id string, m map<string,string>")


def test_map_pattern_properties(spark, df):
    res = validate(df, {"properties": {"m": {
        "patternProperties": {"^k": {"minLength": 3}}}}}, key="id")
    got = {r["doc_id"] for r in res.violations.collect()}
    assert got == {"b"}


def test_map_additional_properties_false(spark, df):
    res = validate(df, {"properties": {"m": {
        "properties": {"k1": True, "k2": True},
        "additionalProperties": False}}}, key="id")
    got = {r["doc_id"] for r in res.violations.collect()}
    assert got == {"c"}


def test_map_additional_properties_schema(spark, df):
    # undeclared keys allowed but their values must satisfy the subschema
    res = validate(df, {"properties": {"m": {
        "properties": {"k1": True, "k2": True},
        "additionalProperties": {"maxLength": 2}}}}, key="id")
    got = {r["doc_id"] for r in res.violations.collect()}
    assert got == {"c"}  # "zzz" has length 3 > 2


def test_map_properties_and_required(spark, df):
    res = validate(df, {"properties": {"m": {
        "properties": {"k1": {"minLength": 2}},
        "required": ["k1"]}}}, key="id")
    got = {(r["doc_id"], r["check_id"]) for r in res.violations.collect()}
    assert ("d", "properties/m/required") in got
    # b's k1="x" violates minLength via map properties routing
    assert ("b", "properties/m/properties") in got
