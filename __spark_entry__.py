"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship validation run at sf0.001.
``queries()`` / ``oracle_sql()`` — operator inventory with DuckDB oracles
(see ``jsonschema_valid_spark/driver_queries.py``).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: derive the canonical tokenized-sequence table from
    sf0.001 documents, run the full validation suite (row invariants, token
    range, enum/referential, null-rate, uniqueness, stats), return verdicts."""
    from jsonschema_valid_spark import CheckSuite
    from jsonschema_valid_spark.sources.sequences import (
        load_sequences,
        source_domain,
    )

    sf_dir = "/root/testdata/sf0.001"
    seq = load_sequences(spark, sf_dir)
    suite = CheckSuite(
        {
            "$id": "flagship-sequence-validation",
            "version": 7,
            "required": ["doc_id", "tokens", "n_tok"],
            "properties": {
                "doc_id": {"type": "string", "pattern": "^doc-[0-9]{12}$",
                           "x-unique": True},
                "tokens": {
                    "type": "array",
                    "minItems": 1,
                    "maxItems": 8192,
                    "items": {"type": "integer", "minimum": 0,
                              "exclusiveMaximum": 50257},
                },
                "n_tok": {
                    "type": "integer", "minimum": 1, "maximum": 8192,
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
    )
    result = suite.run(
        seq, key="doc_id", partition_by="source",
        context={"source_domain": source_domain(spark, sf_dir)},
    )
    return result.verdicts


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from jsonschema_valid_spark import driver_queries

    return driver_queries.queries()


def oracle_sql() -> dict[str, str]:
    from jsonschema_valid_spark import driver_queries

    return driver_queries.oracle_sql()
