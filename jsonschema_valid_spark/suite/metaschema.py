"""Self-hosted suite metaschema: validate suite specs THROUGH the engine.

The reference validates schemas with the same engine against compiled-in
draft metaschemas (``schemas.rs:103-108,172-177,233-238``, wired in
``Config::validate_schema``, ``config.rs:75-90``). This module is the
Spark-native analog (VERDICT r2 item 2):

* :func:`suite_nodes` flattens a suite tree into one row per
  (schema-node, keyword) — the structural walk only records shapes, it
  never judges;
* :data:`METASCHEMA_SUITE` is a plain **CheckSuite** (type/enum/const/
  contains/items/minimum/if-then keywords — nothing special-cased) whose
  rules mirror ``validate_suite_spec``'s, INCLUDING ``pattern`` validity
  via the exact ``format: regex`` probe;
* :func:`validate_suite_with_engine` runs the node rows through the
  standard compiled engine and returns the violations DataFrame — empty
  iff the suite is valid.

``validate_suite_spec`` (suite/spec.py) remains the fast path: pure
Python, no Spark session needed, raises on the first error. The engine
path is the self-hosting proof and reports ALL problems at once. The one
rule only the walker enforces is ``x-rowExpr`` SQL parseability (needs
the Catalyst parser, not expressible as a row predicate).
"""

from __future__ import annotations

from typing import Any

from jsonschema_valid_spark.suite import registry

JSON_TYPES = ["null", "boolean", "integer", "number", "string", "array",
              "object"]

NODE_SCHEMA = (
    "node_id string, path string, keyword string, value_type string, "
    "str_value string, num_value double, bool_value boolean, "
    "str_list array<string>, list_len int, list_types array<string>, "
    "dict_keys array<string>, draft int, sibling_keys array<string>"
)

# keywords whose values are themselves schema nodes (recursed, and their
# own row carries only the container shape)
_SCHEMA_VALUED = ("additionalItems", "additionalProperties", "propertyNames",
                  "contains", "not", "if", "then", "else")
_SCHEMA_MAPS = ("properties", "patternProperties", "$defs", "definitions")
_SCHEMA_LISTS = ("allOf", "anyOf", "oneOf")


def _jtype(v: Any) -> str:
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "boolean"
    if isinstance(v, int):
        return "integer"
    if isinstance(v, float):
        return "number"
    if isinstance(v, str):
        return "string"
    if isinstance(v, list):
        return "array"
    if isinstance(v, dict):
        return "object"
    return "other"


def _node_row(path: tuple, keyword: str, v: Any, draft: int,
              sibling_keys: list[str]) -> dict:
    t = _jtype(v)
    return {
        "node_id": "/".join(str(x) for x in path) + "#" + keyword,
        "path": "/".join(str(x) for x in path) or "<root>",
        "keyword": keyword,
        "value_type": t,
        "str_value": v if t == "string" else None,
        "num_value": float(v) if t in ("integer", "number") else None,
        "bool_value": v if t == "boolean" else None,
        "str_list": (list(v) if t == "array"
                     and all(isinstance(x, str) for x in v) else None),
        "list_len": len(v) if t == "array" else None,
        "list_types": (sorted({_jtype(x) for x in v})
                       if t == "array" else None),
        "dict_keys": sorted(v.keys()) if t == "object" else None,
        "draft": draft,
        "sibling_keys": sibling_keys,
    }


def suite_nodes(spec: Any, draft: int | None = None,
                path: tuple = ()) -> list[dict]:
    """Flatten a suite tree into metaschema-instance rows. NEVER raises on
    malformed input — shapes are recorded and the ENGINE judges them (the
    walk is parsing, not validation). Recursion mirrors
    ``validate_suite_spec``'s descend structure."""
    rows: list[dict] = []
    if isinstance(spec, bool):
        return rows
    if not isinstance(spec, dict):
        # a non-bool, non-object node: one row the metaschema rejects
        rows.append(_node_row(path, "<node>", spec, draft or 7, []))
        return rows
    if draft is None:
        try:
            draft = registry.resolve_draft(spec)
        except Exception:
            draft = 7
    siblings = sorted(spec.keys())
    for kw, v in spec.items():
        p = path + (kw,)
        rows.append(_node_row(p, kw, v, draft, siblings))
        if kw == "items":
            if isinstance(v, list):
                for i, sub in enumerate(v):
                    rows += suite_nodes(sub, draft, p + (i,))
            else:
                rows += suite_nodes(v, draft, p)
        elif kw in _SCHEMA_VALUED:
            rows += suite_nodes(v, draft, p)
        elif kw in _SCHEMA_MAPS and isinstance(v, dict):
            for name, sub in v.items():
                rows += suite_nodes(sub, draft, p + (name,))
        elif kw in _SCHEMA_LISTS and isinstance(v, list):
            for i, sub in enumerate(v):
                rows += suite_nodes(sub, draft, p + (i,))
        elif kw == "x-blocklist" and isinstance(v, dict):
            # the terms list gets its own shape row (same pattern as
            # <dependency-entry>): non-empty list of strings
            rows.append(_node_row(p + ("terms",), "<blocklist-terms>",
                                  v.get("terms"), draft, siblings))
        elif kw == "dependencies" and isinstance(v, dict):
            for name, dep in v.items():
                # list form gets its own shape row; schema form recurses
                rows.append(_node_row(p + (name,), "<dependency-entry>",
                                      dep, draft, siblings))
                if not isinstance(dep, list):
                    rows += suite_nodes(dep, draft, p + (name,))
    return rows


def _branch(if_props: dict, then_schema: dict) -> dict:
    return {"if": {"properties": if_props}, "then": then_schema}


def _kw(name: str, then_schema: dict, **extra_if) -> dict:
    if_props = {"keyword": {"const": name}}
    if_props.update(extra_if)
    return _branch(if_props, then_schema)


_NUMERIC = {"properties": {"value_type": {"enum": ["integer", "number"]}}}
_NONNEG_INT = {"properties": {
    "value_type": {"const": "integer"},
    "num_value": {"minimum": 0},
}}
_OBJECT = {"properties": {"value_type": {"const": "object"}}}
_STRING = {"properties": {"value_type": {"const": "string"}}}
_SCHEMA_NODE = {"properties": {"value_type": {"enum": ["boolean", "object"]}}}
_NONEMPTY_LIST = {"properties": {
    "value_type": {"const": "array"},
    "list_len": {"minimum": 1},
}}
_STRING_LIST = {"properties": {
    "value_type": {"const": "array"},
    "list_types": {"items": {"const": "string"}},
}}


METASCHEMA_SUITE: dict = {
    "$id": "suite-metaschema",
    "version": 7,
    "allOf": [
        # node structure: every schema node is bool or object
        _kw("<node>", {"properties": {"value_type": {
            "enum": ["boolean", "object"]}}}),
        # type: name or list of names from the JSON type lattice
        _kw("type", {"properties": {"value_type": {
            "enum": ["string", "array"]}}}),
        _kw("type", {"properties": {"str_value": {"enum": JSON_TYPES}}},
            value_type={"const": "string"}),
        _kw("type", {"properties": {
            "list_len": {"minimum": 1},
            "str_list": {"items": {"enum": JSON_TYPES}},
            "list_types": {"items": {"const": "string"}},
        }}, value_type={"const": "array"}),
        # enum: non-empty list
        _kw("enum", _NONEMPTY_LIST),
        # numeric bounds
        _kw("minimum", _NUMERIC),
        _kw("maximum", _NUMERIC),
        _kw("multipleOf", _NUMERIC),
        _kw("multipleOf", {"properties": {
            "num_value": {"exclusiveMinimum": 0}}}),
        # exclusive bounds: draft4 = boolean modifier (a lone flag without
        # its minimum/maximum sibling is INERT, not invalid — the reference
        # reads it from inside the bound validator, validators.rs:416-445,
        # and registers no standalone draft4 exclusive validator; r4 fix);
        # draft6/7 = standalone number
        _kw("exclusiveMinimum", {"properties": {
            "value_type": {"const": "boolean"},
        }}, draft={"const": 4}),
        _kw("exclusiveMaximum", {"properties": {
            "value_type": {"const": "boolean"},
        }}, draft={"const": 4}),
        _kw("exclusiveMinimum", _NUMERIC, draft={"enum": [6, 7]}),
        _kw("exclusiveMaximum", _NUMERIC, draft={"enum": [6, 7]}),
        # size bounds: non-negative integers
        _kw("minLength", _NONNEG_INT),
        _kw("maxLength", _NONNEG_INT),
        _kw("minItems", _NONNEG_INT),
        _kw("maxItems", _NONNEG_INT),
        _kw("minProperties", _NONNEG_INT),
        _kw("maxProperties", _NONNEG_INT),
        # pattern: string AND a compilable regex — self-hosted on the exact
        # format:regex probe (formats.py), ≙ draft metaschema's
        # {"type": "string", "format": "regex"}
        _kw("pattern", {"properties": {
            "value_type": {"const": "string"},
            "str_value": {"format": "regex"},
        }}),
        _kw("format", _STRING),
        _kw("uniqueItems", {"properties": {
            "value_type": {"const": "boolean"}}}),
        # schema containers
        _kw("properties", _OBJECT),
        _kw("patternProperties", _OBJECT),
        _kw("dependencies", _OBJECT),
        _kw("<dependency-entry>", {"properties": {"value_type": {
            "enum": ["array", "boolean", "object"]}}}),
        _kw("<dependency-entry>", _STRING_LIST,
            value_type={"const": "array"}),
        _kw("required", _STRING_LIST),
        _kw("allOf", _NONEMPTY_LIST),
        _kw("anyOf", _NONEMPTY_LIST),
        _kw("oneOf", _NONEMPTY_LIST),
        _kw("$ref", _STRING),
        # items: schema, or tuple of schemas (list recursion covers members)
        _kw("items", {"properties": {"value_type": {
            "enum": ["boolean", "object", "array"]}}}),
        # dataset-scope extensions
        _kw("x-nullRate", {"properties": {
            "value_type": {"const": "object"},
            "dict_keys": {"contains": {"enum": ["max", "min"]}},
        }}),
        _kw("x-unique", {"properties": {"value_type": {
            "enum": ["boolean", "object", "array"]}}}),
        _kw("x-unique", {"properties": {
            # object form: HLL sketch mode, time-scoped mode (which
            # needs its ts column declared alongside the horizon), or
            # the where-scoped exact form
            "dict_keys": {"anyOf": [
                {"contains": {"const": "approx"}},
                {"allOf": [{"contains": {"const": "withinSeconds"}},
                           {"contains": {"const": "ts"}}]},
                {"contains": {"const": "where"}},
                {"contains": {"const": "index"}},
            ]}}},
            value_type={"const": "object"}),
        _kw("x-unique", {"properties": {
            "list_len": {"minimum": 1},
            "list_types": {"items": {"const": "string"}},
        }}, value_type={"const": "array"}),
        _kw("x-referential", {"properties": {
            "value_type": {"const": "object"},
            "dict_keys": {"contains": {"const": "domain"}},
        }}),
        _kw("x-stats", {"properties": {
            "value_type": {"const": "object"},
            "dict_keys": {"items": {
                "enum": ["min", "max", "avg", "stddev", "sum"]}},
        }}),
        _kw("x-distinctCount", _OBJECT),
        _kw("x-quantile", {"properties": {
            "value_type": {"const": "object"},
            "dict_keys": {"contains": {"const": "q"}},
        }}),
        _kw("x-drift", {"properties": {
            "value_type": {"const": "object"},
            "dict_keys": {"contains": {"const": "baseline"}},
        }}),
        _kw("x-rowExpr", _STRING),  # SQL parseability: walker-only (Catalyst)
        _kw("x-parity", {"properties": {
            "value_type": {"const": "object"},
            "dict_keys": {"contains": {"const": "reference"}},
        }}),
        _kw("x-decontamination", {"properties": {
            "value_type": {"const": "object"},
            "dict_keys": {"contains": {"const": "benchmark"}},
        }}),
        _kw("x-blocklist", {"properties": {
            "value_type": {"const": "object"},
            "dict_keys": {"contains": {"const": "terms"}},
        }}),
        _kw("x-lmScore", {"properties": {
            "value_type": {"const": "object"},
            "dict_keys": {"contains": {"const": "minScore"}},
        }}),
        _kw("x-nearDup", {"properties": {
            "value_type": {"const": "object"},
            "dict_keys": {"contains": {"const": "method"}},
        }}),
        _kw("x-linkage", {"properties": {
            "value_type": {"const": "object"},
            "dict_keys": {"contains": {"const": "blockOn"}},
        }}),
        _kw("x-distribution", {"properties": {
            "value_type": {"const": "object"},
            "dict_keys": {"contains": {"const": "family"}},
        }}),
        _kw("x-maxFrequency", {"properties": {
            "value_type": {"const": "object"},
            "dict_keys": {"minItems": 1, "items": {
                "enum": ["maxFraction", "maxCount", "mode", "k", "by",
                         "verdicts", "where"]}},
        }}),
        _kw("x-rowCount", {"properties": {
            "value_type": {"const": "object"},
            "dict_keys": {"minItems": 1, "items": {
                "enum": ["min", "max", "scope", "verdicts",
                         "where"]}},
        }}),
        _kw("x-monotonic", {"properties": {
            "value_type": {"const": "object"},
            "dict_keys": {"contains": {"const": "orderBy"}},
        }}),
        _kw("x-noOverlap", {"properties": {
            "value_type": {"const": "object"},
            "dict_keys": {"contains": {"const": "endColumn"}},
        }}),
        _kw("x-outlier", {"properties": {
            "value_type": {"const": "object"},
            # zscore/mad declare maxZ; iqr declares iqrK
            "dict_keys": {"anyOf": [
                {"contains": {"const": "maxZ"}},
                {"contains": {"const": "iqrK"}},
            ]},
        }}),
        _kw("x-levelShift", {"properties": {
            "value_type": {"const": "object"},
            "dict_keys": {"allOf": [
                {"contains": {"const": "orderBy"}},
                {"contains": {"const": "maxShift"}},
            ]},
        }}),
        _kw("x-correlation", {"properties": {
            "value_type": {"const": "object"},
            "dict_keys": {"allOf": [
                {"contains": {"const": "with"}},
                {"contains": {"enum": ["min", "max"]}},
            ]},
        }}),
        _kw("x-contiguous", {"properties": {
            "value_type": {"const": "object"},
        }}),
        _kw("x-association", {"properties": {
            "value_type": {"const": "object"},
            "dict_keys": {"allOf": [
                {"contains": {"const": "with"}},
                {"contains": {"enum": ["min", "max"]}},
            ]},
        }}),
        _kw("x-acyclic", {"properties": {
            "value_type": {"const": "object"},
            "dict_keys": {"contains": {"const": "parent"}},
        }}),
        _kw("x-reciprocal", {"properties": {
            "value_type": {"const": "object"},
            "dict_keys": {"contains": {"const": "with"}},
        }}),
        _kw("x-cohortParity", {"properties": {
            "value_type": {"const": "object"},
            "dict_keys": {"allOf": [
                {"contains": {"const": "cohort"}},
                {"contains": {"const": "baseline"}},
                {"contains": {"const": "maxGap"}},
            ]},
        }}),
        _kw("x-entropy", {"properties": {
            "value_type": {"const": "object"},
            "dict_keys": {"contains": {"enum": ["min", "max"]}},
        }}),
        _kw("x-funnel", {"properties": {
            "value_type": {"const": "object"},
            "dict_keys": {"allOf": [
                {"contains": {"const": "steps"}},
                {"contains": {"const": "minRates"}},
                {"contains": {"const": "key"}},
                {"contains": {"const": "ts"}},
            ]},
        }}),
        _kw("x-compliance", {"properties": {
            "value_type": {"const": "object"},
            "dict_keys": {"allOf": [
                {"contains": {"const": "expr"}},
                {"contains": {"enum": ["min", "max"]}},
            ]},
        }}),
        _kw("x-distinctRatio", {"properties": {
            "value_type": {"const": "object"},
            "dict_keys": {"contains": {"enum": ["min", "max"]}},
        }}),
        _kw("x-trend", {"properties": {
            "value_type": {"const": "object"},
            "dict_keys": {"allOf": [
                {"contains": {"const": "orderBy"}},
                {"contains": {"enum": ["min", "max"]}},
            ]},
        }}),
        _kw("x-seasonality", {"properties": {
            "value_type": {"const": "object"},
            "dict_keys": {"allOf": [
                {"contains": {"const": "orderBy"}},
                {"contains": {"const": "lag"}},
                {"contains": {"enum": ["min", "max"]}},
            ]},
        }}),
        _kw("x-eventOrder", {"properties": {
            "value_type": {"const": "object"},
            "dict_keys": {"allOf": [
                {"contains": {"const": "first"}},
                {"contains": {"const": "then"}},
                {"contains": {"const": "by"}},
            ]},
        }}),
        _kw("x-session", {"properties": {
            "value_type": {"const": "object"},
            # needs the gap AND at least one session bound
            "dict_keys": {"allOf": [
                {"contains": {"const": "gapSeconds"}},
                {"contains": {"enum": ["maxDurationSeconds",
                                       "maxEvents", "minEvents"]}},
            ]},
        }}),
        _kw("x-functionalDependency", {"properties": {
            "value_type": {"const": "object"},
            "dict_keys": {"contains": {"const": "determines"}},
        }}),
        _kw("x-kAnonymity", {"properties": {
            "value_type": {"const": "object"},
            "dict_keys": {"allOf": [
                {"contains": {"const": "quasi"}},
                {"anyOf": [{"contains": {"const": "k"}},
                           {"contains": {"const": "l"}},
                           {"contains": {"const": "t"}}]},
            ]},
        }}),
        _kw("x-freshness", {"properties": {
            "value_type": {"const": "object"},
            "dict_keys": {"contains": {"const": "asOf"}},
        }}),
        _kw("x-aggConsistency", {"properties": {
            "value_type": {"const": "object"},
            "dict_keys": {"contains": {"const": "childAgg"}},
        }}),
        _kw("x-partitionComplete", {"properties": {
            "value_type": {"const": "object"},
            "dict_keys": {"contains": {"const": "expected"}},
        }}),
        _kw("x-jsonWellFormed", {"properties": {
            "value_type": {"const": "boolean"},
            "bool_value": {"const": True},
        }}),
        _kw("x-tokenShape", {"properties": {
            "value_type": {"const": "object"},
            "dict_keys": {"minItems": 1, "items": {
                "enum": ["startsWith", "endsWith", "forbidden", "pad"]}},
        }}),
        _kw("x-vector", {"properties": {
            "value_type": {"const": "object"},
            "dict_keys": {"minItems": 1, "items": {
                "enum": ["dim", "unit", "tol", "finite"]}},
        }}),
        _kw("<blocklist-terms>", {"properties": {
            "value_type": {"const": "array"},
            "list_len": {"minimum": 1},
            "list_types": {"items": {"const": "string"}},
        }}),
    ],
}


def validate_suite_with_engine(spark, spec: Any):
    """Run a suite spec through the ENGINE-hosted metaschema (the analog of
    ``Config::validate_schema``, ``config.rs:75-90``). Returns the
    ValidationResult over the node rows: ``res.ok()`` is the verdict,
    ``res.violations`` lists every offending (node, keyword) with its
    schema path in ``doc_id``."""
    from jsonschema_valid_spark import CheckSuite

    rows = suite_nodes(spec)
    if not rows:  # bool suite: trivially valid
        rows = [_node_row((), "<node>", {}, 7, [])]
    df = spark.createDataFrame(rows, NODE_SCHEMA)
    return CheckSuite(METASCHEMA_SUITE).run(df, key="node_id")
