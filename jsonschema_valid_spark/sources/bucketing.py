"""Bucketed table layout: pre-shuffled storage for shuffle-free validation.

At 10^12 rows the dominant cost of cross-row checks (uniqueness, exact
dedup, key-key joins) is the shuffle of the fact table. Spark bucketing
moves that shuffle to WRITE time, once: a table written with
``bucketBy(N, key)`` stores rows hash-clustered by the key, and every later
``groupBy(key)`` / equi-join on the key reads the clustering from the file
layout instead of exchanging 100 TB — the scan itself reports
``outputPartitioning = HashPartitioning(key)`` and Catalyst drops the
Exchange (asserted in ``tests/test_plans.py``).

This mirrors what an Iceberg deployment gets from a ``bucket(N, doc_id)``
partition transform; the helpers below are the plain-Spark seam
(``saveAsTable`` — bucket metadata lives in the session catalog, the
mechanism Spark exposes for it).

Salted two-phase uniqueness composes with this: phase 1 groups on
``(key, salt)`` and ``HashPartitioning(key)`` already satisfies the
clustered distribution for any superset of columns containing ``key`` —
both phases run shuffle-free on a bucketed layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, keys, buckets: int = 64,
                   sort_by=None, mode: str = "overwrite") -> None:
    """Write ``df`` as a bucketed managed table (one-time shuffle; every
    subsequent key-clustered operation is exchange-free)."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    w = df.write.mode(mode).bucketBy(buckets, *keys)
    if sort_by:
        sort_by = [sort_by] if isinstance(sort_by, str) else list(sort_by)
        w = w.sortBy(*sort_by)
    w.format("parquet").saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table (bucket metadata comes from the catalog —
    ``spark.read.parquet(path)`` on the same files would NOT know the
    clustering and would shuffle again)."""
    return spark.table(table)
