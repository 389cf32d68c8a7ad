"""jsonschema_valid_spark — a PySpark-native schema + constraint validation engine.

A brand-new engine (NOT a port) with the capabilities of the Rust JSON Schema
validator ``mdboom/jsonschema-valid`` (reference at /root/reference), lifted
onto Spark DataFrames:

* the reference validates ONE JSON document at a time with a recursive tree
  walker (``/root/reference/src/lib.rs:84-102``); we validate a whole table in
  ONE fused DataFrame pass — all row-level keyword checks compile into a
  single ``select`` projection (whole-stage codegen) and all dataset-level
  checks into a single multi-aggregate ``groupBy().agg()``.
* the reference emits a lazy iterator of ``ValidationError`` with
  instance/schema paths (``error.rs:108-110``); we emit a *violations*
  DataFrame ``(doc_id, check_id, observed, expected)`` and a per-partition
  *verdicts* DataFrame ``(partition_id, check_id, passed, metric_value,
  threshold)`` — Spark's lazy plan plays the role of the lazy iterator.

Public API::

    from jsonschema_valid_spark import CheckSuite

    suite = CheckSuite({...})                 # ≙ Config::from_schema + validate_schema
    result = suite.run(df, key="doc_id", partition_by="source")
    result.violations                          # DataFrame
    result.verdicts                            # DataFrame
    result.ok()                                # bool — LIMIT-1 probe (≙ lib.rs:95-101 peek)
"""

from jsonschema_valid_spark.suite.spec import (
    CheckSuite,
    SuiteError,
    SuiteBindError,
    validate_suite_spec,
)
from jsonschema_valid_spark.suite.metaschema import validate_suite_with_engine
from jsonschema_valid_spark.engine import ValidationResult, split_valid


def validate(df, spec, key: str = "doc_id", **kwargs) -> ValidationResult:
    """One-shot API (≙ the reference's free function ``validate(cfg,
    instance)``, ``lib.rs:84-102``): compile the suite and run it in one
    call. For repeated runs over many tables, build a :class:`CheckSuite`
    once and reuse it (≙ sharing a ``Config`` across threads,
    ``examples/threaded.rs``)."""
    return CheckSuite(spec).run(df, key=key, **kwargs)


__all__ = [
    "CheckSuite",
    "SuiteError",
    "SuiteBindError",
    "ValidationResult",
    "split_valid",
    "validate",
    "validate_suite_spec",
    "validate_suite_with_engine",
]

__version__ = "0.1.0"
