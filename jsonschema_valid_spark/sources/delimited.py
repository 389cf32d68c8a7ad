"""Delimited-text (CSV/TSV) source with corrupt-record quarantine: the
malformed-input seam of the validation engine.

For parquet/Iceberg the storage layer already guarantees row shape; for
delimited text the FIRST check is "does the line even parse as the
declared schema" — and that check cannot run through the suite, because
an unparseable line has no columns to check. Spark's PERMISSIVE mode is
the scale-correct answer: one pass, parse failures become NULL fields
plus the ORIGINAL raw line in ``_corrupt_record``, nothing throws, and
the split into (clean, quarantine) is a pair of filters over the same
scan — no second read, no driver-side parsing.

The schema is DERIVED FROM THE SUITE (``suite_to_spark_schema``, the
jsonl.py contract): explicit, never inferred, so a 100 TB read needs no
sampling pass. Delimited text has no native arrays/structs — a suite
whose properties declare them is refused eagerly rather than silently
string-ified.

The reference parses one JSON document and reports a parse error
(lib.rs:84-102); this is the dataset lift: parse errors become
quarantine ROWS carrying their raw line, routable to the same sink as
suite violations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from jsonschema_valid_spark.sources.jsonl import suite_to_spark_schema

CORRUPT_COL = "_corrupt_record"


def _check_flat(schema: T.StructType) -> None:
    for f in schema.fields:
        if isinstance(f.dataType, (T.ArrayType, T.StructType, T.MapType)):
            raise ValueError(
                f"column {f.name!r} is {f.dataType.simpleString()}: "
                "delimited text cannot carry arrays/objects — use the "
                "JSONL or parquet source for nested columns")


def read_delimited(spark: SparkSession, path: str, suite_spec: dict,
                   sep: str = ",", header: bool = True
                   ) -> tuple[DataFrame, DataFrame]:
    """Read CSV/TSV with the suite-derived schema and split into
    ``(clean, quarantine)`` in one PERMISSIVE pass.

    * ``clean``: rows where every field parsed — the suite's input
      (run it through ``CheckSuite.run`` next; this split is only the
      PARSE gate, not the semantic checks);
    * ``quarantine``: rows with any parse failure — the declared
      columns as far as they parsed (failed fields NULL) plus
      ``_corrupt_record`` holding the ORIGINAL line for drill-down
      and replay after a fix.

    Both sides are filters over the same scan: predicate pushdown and
    column pruning still apply to ``clean`` downstream; nothing is
    cached or collected.

    Implementation: ``read.text`` + ``from_csv`` rather than the CSV
    file source — the file source's corrupt column is an INTERNAL
    column Spark refuses to query in isolation
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN; the
    documented workaround is ``cache()``, a non-starter at 100 TB).
    Parsing the line column keeps the raw text a PLAIN column, so
    ``quarantine.count()``/``isEmpty()`` just work. With
    ``header=True`` lines equal to the sep-joined declared field names
    are dropped (the header as Spark itself writes it); blank lines are
    skipped."""
    schema = suite_to_spark_schema(suite_spec)
    _check_flat(schema)
    ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                    for f in list(schema)
                    + [T.StructField(CORRUPT_COL, T.StringType())])
    raw = spark.read.text(path).where(F.length(F.trim("value")) > 0)
    if header:
        hdr = sep.join(f.name for f in schema.fields)
        raw = raw.where(F.col("value") != hdr)
    flat = raw.select(
        F.from_csv("value", ddl,
                   {"mode": "PERMISSIVE", "sep": sep,
                    "columnNameOfCorruptRecord": CORRUPT_COL}).alias("__r")
    ).select("__r.*")
    clean = flat.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    quarantine = flat.where(F.col(CORRUPT_COL).isNotNull())
    return clean, quarantine


def validate_delimited(spark: SparkSession, path: str, suite,
                       key: str, sep: str = ",", header: bool = True):
    """One-call CSV validation: parse gate then suite — returns
    ``(result, quarantine)`` where ``result`` is the ValidationResult
    over the rows that PARSED and ``quarantine`` is the raw-line DF of
    those that did not. A file is fully healthy iff ``result.ok()`` and
    ``quarantine.isEmpty()``."""
    clean, quarantine = read_delimited(spark, path, suite.spec,
                                       sep=sep, header=header)
    return suite.run(clean, key=key), quarantine
