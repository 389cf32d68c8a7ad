"""Driver-contract query inventory.

Each entry pairs a Spark implementation (engine-backed where possible) with
an equivalent DuckDB oracle SQL over the SAME pre-registered parquet views.
Column names/types are aligned on both sides (the driver hash-compares values
after sorting columns by name). Float outputs are rounded in BOTH dialects so
the value-hash is deterministic.

The `sequences` table (BASELINE.json input_hint shape) is derived inside the
query on both sides — see ``sources/sequences.py`` for the dual-dialect
derivation (verified byte-identical).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jsonschema_valid_spark.sources.sequences import (
    SEQUENCES_CTE_SPARK,
    load_sequences,
    oracle_with_sequences,
    source_domain,
)

# registry: name -> (spark_fn, oracle_sql | None)
_REGISTRY: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {}


def register(name: str, sql: str | None):
    def deco(fn):
        _REGISTRY[name] = (fn, sql)
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _) in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in _REGISTRY.items() if sql is not None}


# ---------------------------------------------------------------------------
# Flagship: sequence-table validation (SURVEY.md §2 lifted checks)
# ---------------------------------------------------------------------------

@register(
    "seq_invariant_ntok",
    oracle_with_sequences(
        "SELECT doc_id, n_tok, CAST(len(tokens) AS INTEGER) AS arr_len "
        "FROM sequences WHERE n_tok != len(tokens)"
    ),
)
def seq_invariant_ntok(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row invariant n_tok == len(tokens) — minItems with a column bound
    (SURVEY.md §2.1 #17); violations projection, no shuffle."""
    seq = load_sequences(spark, sf_dir)
    return seq.where(F.col("n_tok") != F.size("tokens")).select(
        "doc_id", "n_tok", F.size("tokens").alias("arr_len")
    )


@register(
    "seq_engine_row_violations",
    oracle_with_sequences(
        """
SELECT doc_id, 'properties/tokens/items' AS check_id FROM sequences
  WHERE len(list_filter(tokens, t -> t < 0 OR t >= 50257)) > 0
UNION ALL
SELECT doc_id, 'x-rowExpr' AS check_id FROM sequences WHERE n_tok != len(tokens)
UNION ALL
SELECT doc_id, 'properties/source/enum' AS check_id FROM sequences
  WHERE source IS NOT NULL AND source NOT IN (SELECT source FROM documents)
UNION ALL
SELECT doc_id, 'properties/doc_id/pattern' AS check_id FROM sequences
  WHERE NOT regexp_matches(doc_id, '^doc-[0-9]{12}$')
UNION ALL
SELECT doc_id, 'properties/tokens/minItems' AS check_id FROM sequences
  WHERE len(tokens) < 1
"""
    ),
)
def seq_engine_row_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ENGINE's fused row pass vs a hand-written oracle union — checks the
    compiler+executor end-to-end (items range, row invariant, enum, pattern,
    minItems)."""
    from jsonschema_valid_spark import CheckSuite

    seq = load_sequences(spark, sf_dir)
    domain = [r["source"] for r in source_domain(spark, sf_dir).collect()]
    suite = CheckSuite(
        {
            "version": 7,
            "properties": {
                "doc_id": {"pattern": "^doc-[0-9]{12}$"},
                "tokens": {
                    "minItems": 1,
                    "items": {"minimum": 0, "exclusiveMaximum": 50257},
                },
                "source": {"enum": sorted(domain)},
            },
            "x-rowExpr": "n_tok = size(tokens)",
        }
    )
    res = suite.run(seq, key="doc_id")
    return res.violations.select("doc_id", "check_id")


@register(
    "seq_engine_verdicts_by_source",
    oracle_with_sequences(
        """
SELECT source AS partition_id, 'properties/tokens/items' AS check_id,
       CAST(sum(CASE WHEN len(list_filter(tokens, t -> t < 0 OR t >= 50257)) > 0
                THEN 1 ELSE 0 END) AS BIGINT) AS failed
FROM sequences GROUP BY source
UNION ALL
SELECT source AS partition_id, 'x-rowExpr' AS check_id,
       CAST(sum(CASE WHEN n_tok != len(tokens) THEN 1 ELSE 0 END) AS BIGINT) AS failed
FROM sequences GROUP BY source
"""
    ),
)
def seq_engine_verdicts_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ENGINE's fused multi-aggregate verdicts pass (fail counters per
    partition) vs oracle GROUP BYs."""
    from jsonschema_valid_spark import CheckSuite

    seq = load_sequences(spark, sf_dir)
    suite = CheckSuite(
        {
            "version": 7,
            "properties": {
                "tokens": {"items": {"minimum": 0, "exclusiveMaximum": 50257}},
            },
            "x-rowExpr": "n_tok = size(tokens)",
        }
    )
    res = suite.run(seq, key="doc_id", partition_by="source")
    return res.verdicts.select(
        "partition_id", "check_id", F.col("metric_value").cast("long").alias("failed")
    )


@register(
    "seq_null_rate",
    oracle_with_sequences(
        "SELECT CAST(count(*) AS BIGINT) AS n_rows, "
        "CAST(sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null, "
        "round(avg(CASE WHEN source IS NULL THEN 1.0 ELSE 0.0 END), 6) AS null_rate "
        "FROM sequences"
    ),
)
def seq_null_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x-nullRate metric (lift of `required`, validators.rs:792-818)."""
    seq = load_sequences(spark, sf_dir)
    isnull = F.col("source").isNull().cast("double")
    return seq.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(isnull.cast("long")).alias("n_null"),
        F.round(F.avg(isnull), 6).alias("null_rate"),
    )


@register(
    "seq_unique_docid",
    oracle_with_sequences(
        "SELECT doc_id, CAST(count(*) AS BIGINT) AS dup_count FROM sequences "
        "GROUP BY doc_id HAVING count(*) > 1"
    ),
)
def seq_unique_docid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-row uniqueness via the salted two-phase aggregate
    (SURVEY.md §2.1 #18; operators/uniqueness.py)."""
    from jsonschema_valid_spark.operators.uniqueness import duplicate_keys

    seq = load_sequences(spark, sf_dir)
    return duplicate_keys(seq, "doc_id").select(
        "doc_id", F.col("dup_count").cast("long").alias("dup_count")
    )


@register(
    "seq_referential_source",
    oracle_with_sequences(
        "SELECT doc_id, source FROM sequences WHERE source IS NOT NULL "
        "AND source NOT IN (SELECT source FROM documents)"
    ),
)
def seq_referential_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential membership via broadcast left-anti join
    (operators/referential.py; lift of `enum`, validators.rs:715-728)."""
    from jsonschema_valid_spark.operators.referential import non_members

    seq = load_sequences(spark, sf_dir)
    return non_members(seq, "source", source_domain(spark, sf_dir)).select(
        "doc_id", "source"
    )


@register(
    "seq_stats_ntok",
    oracle_with_sequences(
        "SELECT min(n_tok) AS min_ntok, max(n_tok) AS max_ntok, "
        "CAST(count(*) AS BIGINT) AS n_rows, "
        "CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs, "
        "round(avg(n_tok), 6) AS avg_ntok FROM sequences"
    ),
)
def seq_stats_ntok(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single multi-aggregate stats pass (x-stats / x-distinctCount exact
    form)."""
    seq = load_sequences(spark, sf_dir)
    return seq.agg(
        F.min("n_tok").alias("min_ntok"),
        F.max("n_tok").alias("max_ntok"),
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.round(F.avg("n_tok"), 6).alias("avg_ntok"),
    )


@register(
    "seq_hist_ntok",
    oracle_with_sequences(
        "SELECT CAST(floor(n_tok / 16.0) AS BIGINT) AS bucket, "
        "CAST(count(*) AS BIGINT) AS cnt FROM sequences GROUP BY 1"
    ),
)
def seq_hist_ntok(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-bin histogram aggregation (drift building block,
    operators/drift.py histogram)."""
    from jsonschema_valid_spark.operators.drift import histogram

    seq = load_sequences(spark, sf_dir)
    return histogram(seq, "n_tok", 16.0).select(
        F.col("bucket").cast("long").alias("bucket"),
        F.col("count").cast("long").alias("cnt"),
    )
