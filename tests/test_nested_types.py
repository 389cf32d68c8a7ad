"""Nested StructType and MapType column coverage: properties/required inside
struct columns; propertyNames / minProperties / maxProperties over MapType
(the open-keyed-object form, SURVEY §2.1 #20-24)."""

import pytest

from jsonschema_valid_spark import validate


@pytest.fixture(scope="module")
def nested(spark):
    rows = [
        ("a", {"w": 10, "h": 20}, {"k1": "v1", "k2": "v2"}),
        ("b", {"w": -5, "h": 20}, {"k1": "v1"}),
        ("c", {"w": 10, "h": None}, {"BAD KEY": "v"}),
    ]
    return spark.createDataFrame(
        rows, "id string, dims struct<w:long,h:long>, attrs map<string,string>")


def test_struct_properties(spark, nested):
    res = validate(nested, {"properties": {"dims": {
        "properties": {"w": {"minimum": 0}},
    }}}, key="id")
    got = {(r["doc_id"], r["check_id"]) for r in res.violations.collect()}
    assert got == {("b", "properties/dims/properties")}


def test_struct_required(spark, nested):
    res = validate(nested, {"properties": {"dims": {
        "required": ["h"],
    }}}, key="id")
    got = {r["doc_id"] for r in res.violations.collect()}
    assert got == {"c"}


def test_map_property_names(spark, nested):
    res = validate(nested, {"version": 7, "properties": {"attrs": {
        "propertyNames": {"pattern": "^k[0-9]$"},
    }}}, key="id")
    got = {r["doc_id"] for r in res.violations.collect()}
    assert got == {"c"}


def test_map_min_properties(spark, nested):
    res = validate(nested, {"properties": {"attrs": {
        "minProperties": 2,
    }}}, key="id")
    got = {r["doc_id"] for r in res.violations.collect()}
    assert got == {"b", "c"}


def test_map_max_properties(spark, nested):
    res = validate(nested, {"properties": {"attrs": {
        "maxProperties": 1,
    }}}, key="id")
    got = {r["doc_id"] for r in res.violations.collect()}
    assert got == {"a"}
