"""Pre-flight schema audit: the NON-THROWING twin of ``compiler.bind``.

``bind`` enforces the compile-time structural contract by raising
:class:`SuiteBindError` at the FIRST problem (strict-mode undeclared column,
propertyNames violation, property-count bounds — compiler.py:976-994). That
is the right behavior inside a pipeline, but before launching a 10^12-row
job a user wants the WHOLE gap list at once: every missing required column,
every undeclared column, every statically type-mismatched declaration —
without paying a single Spark job (the audit reads only ``df.schema``).

Reference analog: ``Config::from_schema`` validates the SCHEMA up front
(config.rs:75-90); the reference has no instance-side pre-flight because its
instance is one in-memory document. A bound table's schema is the one part
of the "instance" that exists before any data is read — auditing it is the
table-native lift of that up-front contract.

Statuses (failing ones marked ✗):

* ``ok`` — declared property present, declared ``type`` statically
  compatible with the Spark dtype (or no ``type`` keyword).
* ``dynamic`` — present, but the type verdict needs row data (StringType
  coercion to number/integer/boolean; ``integer`` on a fractional column;
  declared ``null``) — the ``try_cast`` path of compiler._type_pred.
* ``type_mismatch`` ✗ — declared ``type`` can NEVER hold for the dtype
  (the compiler would emit a constant-false row check: every row violates).
* ``missing_required`` ✗ — listed in ``required``, absent from the schema.
* ``absent`` — declared but absent and not required (JSON Schema: the
  subschema is simply not applied; informational).
* ``undeclared`` ✗ — present but not declared while
  ``additionalProperties: false`` (bind would refuse the whole table).
* ``bad_name`` ✗ — column name violates root ``propertyNames``.
* ``property_count`` ✗ — column count outside min/maxProperties.

Everything is driver-side schema metadata; the returned DataFrame is built
with ``createDataFrame`` over at most #columns rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, types as T

FAILING_STATUSES = frozenset({
    "type_mismatch", "missing_required", "undeclared", "bad_name",
    "property_count", "reject_all",
})

_REPORT_SCHEMA = "column string, status string, declared string, observed string"


def _resolve_refs(spec, resolver):
    """Follow a ``$ref`` chain (ref short-circuits siblings,
    validators.rs:60-63) with an id()-based cycle guard; cycles surface as
    the unresolved node rather than recursing (bind raises on them — the
    audit stays non-throwing and classifies with what it has)."""
    seen: set[int] = set()
    while isinstance(spec, dict) and "$ref" in spec:
        if id(spec) in seen:
            return spec
        seen.add(id(spec))
        try:
            spec = resolver.resolve(spec["$ref"], scope=spec)
        except Exception:
            return spec
    return spec


def _classify_type(names, dtype: T.DataType) -> str:
    """Static trichotomy of compiler._type_pred (compiler.py:695-732):
    statically satisfied / needs row data / constant fail."""
    from jsonschema_valid_spark.compiler import (
        _FRACTIONAL, _json_type_of,
    )

    jt = _json_type_of(dtype)
    dynamic = False
    for name in names:
        if name == jt or (name == "number" and jt == "integer"):
            return "ok"
        if name == "integer" and isinstance(dtype, _FRACTIONAL):
            dynamic = True            # x.0 counts as integer (:739-748)
        elif name == "null":
            dynamic = True
        elif isinstance(dtype, T.StringType) and name in (
                "number", "integer", "boolean"):
            dynamic = True            # self-describing string coercion
    return "dynamic" if dynamic else "type_mismatch"


def schema_report(suite_or_spec, df: DataFrame) -> DataFrame:
    """Audit ``df.schema`` against the suite's structural contract; one row
    per finding (see module docstring for the status vocabulary). Never
    raises on a contract violation — that is :func:`compiler.bind`'s job."""
    import re

    from jsonschema_valid_spark.compiler import _eval_name_suite
    from jsonschema_valid_spark.suite.spec import CheckSuite

    suite = (suite_or_spec if isinstance(suite_or_spec, CheckSuite)
             else CheckSuite(suite_or_spec))
    spec = _resolve_refs(suite.spec, suite.resolver)
    rows: list[tuple[str, str, str, str]] = []
    fields = {f.name: f.dataType for f in df.schema.fields}

    if spec is False:
        rows.append(("<table>", "reject_all", "false suite", "-"))
    if not isinstance(spec, dict):
        return df.sparkSession.createDataFrame(rows, _REPORT_SCHEMA)

    props = spec.get("properties") or {}
    pat_props = {p: s for p, s in (spec.get("patternProperties") or {}).items()}
    pat_res = {p: re.compile(p) for p in pat_props}
    required = list(spec.get("required") or [])

    def classify_present(colname: str, sub, declared_as: str | None = None):
        sub = _resolve_refs(sub, suite.resolver)
        label = declared_as or "-"
        if sub is False:
            rows.append((colname, "type_mismatch", label + " (false schema)",
                         fields[colname].simpleString()))
            return
        if not isinstance(sub, dict) or "type" not in sub:
            rows.append((colname, "ok", label, fields[colname].simpleString()))
            return
        names = sub["type"] if isinstance(sub["type"], list) else [sub["type"]]
        status = _classify_type(names, fields[colname])
        rows.append((colname, status, "/".join(names),
                     fields[colname].simpleString()))

    for colname, sub in props.items():
        if colname in fields:
            classify_present(colname, sub)
        elif colname in required:
            sub_r = _resolve_refs(sub, suite.resolver)
            names = (sub_r.get("type") if isinstance(sub_r, dict) else None)
            declared = "/".join(names if isinstance(names, list)
                                else [names] if names else ["-"])
            rows.append((colname, "missing_required", declared, "<absent>"))
        else:
            rows.append((colname, "absent", "-", "<absent>"))

    # required names with no properties entry at all
    for name in required:
        if name not in props and name not in fields:
            rows.append((name, "missing_required", "-", "<absent>"))

    # pattern-routed columns (bind routes them like declared properties)
    for pat, sub in pat_props.items():
        for colname in fields:
            if colname not in props and pat_res[pat].search(colname):
                classify_present(colname, sub, declared_as=f"~/{pat}/")

    if spec.get("additionalProperties") is False:
        for colname in fields:
            if colname not in props and not any(
                    r.search(colname) for r in pat_res.values()):
                rows.append((colname, "undeclared", "-",
                             fields[colname].simpleString()))

    if "propertyNames" in spec:
        for colname in fields:
            if not _eval_name_suite(spec["propertyNames"], colname, ()):
                rows.append((colname, "bad_name",
                             "propertyNames", colname))

    n = len(fields)
    if "minProperties" in spec and n < spec["minProperties"]:
        rows.append(("<table>", "property_count",
                     f">= {spec['minProperties']} columns", str(n)))
    if "maxProperties" in spec and n > spec["maxProperties"]:
        rows.append(("<table>", "property_count",
                     f"<= {spec['maxProperties']} columns", str(n)))

    rows.sort()
    return df.sparkSession.createDataFrame(rows, _REPORT_SCHEMA)


def schema_diff(old: DataFrame, new: DataFrame) -> DataFrame:
    """Table-vs-table schema drift: what changed between yesterday's batch
    and today's — ``added`` / ``dropped`` / ``retyped`` columns (plus
    ``widened``/``narrowed`` for integral↔fractional moves, the common
    silent parquet-evolution hazard: an int64 column that starts arriving
    as double). One row per difference; empty report = identical schemas.
    Driver-side footer metadata only — no job touches row data, so it is
    free to run before every ingest append."""
    from jsonschema_valid_spark.compiler import _FRACTIONAL, _INTEGRAL

    o = {f.name: f.dataType for f in old.schema.fields}
    n = {f.name: f.dataType for f in new.schema.fields}
    rows: list[tuple[str, str, str, str]] = []
    for name in o.keys() - n.keys():
        rows.append((name, "dropped", o[name].simpleString(), "<absent>"))
    for name in n.keys() - o.keys():
        rows.append((name, "added", "<absent>", n[name].simpleString()))
    for name in o.keys() & n.keys():
        if o[name] == n[name]:
            continue
        status = "retyped"
        if isinstance(o[name], _INTEGRAL) and isinstance(n[name], _FRACTIONAL):
            status = "widened"
        elif isinstance(o[name], _FRACTIONAL) and isinstance(n[name], _INTEGRAL):
            status = "narrowed"
        rows.append((name, status, o[name].simpleString(),
                     n[name].simpleString()))
    rows.sort()
    return old.sparkSession.createDataFrame(
        rows, "column string, status string, old string, new string")


def schema_ok(suite_or_spec, df: DataFrame) -> bool:
    """True iff :func:`compiler.bind` would accept ``df``'s schema AND no
    declared type is a static constant-fail. Driver-side only."""
    report = schema_report(suite_or_spec, df)
    return not any(r["status"] in FAILING_STATUSES for r in report.collect())
