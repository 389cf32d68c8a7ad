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

import os

from pyspark.sql import DataFrame, SparkSession, functions as F


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


def write_range_layout(df: DataFrame, path: str, column: str,
                       n_files: int = 32, mode: str = "overwrite") -> None:
    """RANGE-sorted layout for min/max data skipping — bucketing's
    complement: bucketing kills the shuffle of KEY-clustered operations;
    this kills the SCAN of range-predicate queries. ``repartitionByRange``
    + ``sortWithinPartitions`` makes every written file own a narrow,
    (near-)disjoint ``column`` interval, so the parquet min/max footer
    stats (and an Iceberg manifest's identical field bounds) let a
    ``column BETWEEN ...`` query drop whole files BEFORE reading a byte —
    a selective predicate touches O(selectivity) of a 100 TB table
    instead of scanning everything to discard rows post-decode. The
    range exchange is paid once at write time (sampling-based
    partitioner, skew-tolerant); the layout serves every later range
    query. ≙ Iceberg ``sort_order(column)`` table property.

    Evidence contract: :func:`file_range_stats` reads the footers back;
    tests assert the written intervals are disjoint and that a narrow
    predicate's interval intersects ~1/n_files of them (vs ALL files in
    an unsorted control), plus ``PushedFilters`` in the scan plan."""
    (df.repartitionByRange(int(n_files), F.col(column))
       .sortWithinPartitions(column)
       .write.mode(mode).parquet(path))


def file_range_stats(path: str, column: str) -> list[dict]:
    """Per-file [min, max] bounds of ``column`` from the parquet footers
    (driver-side, metadata-only — exactly what a scan planner reads to
    skip). Returns ``[{"file", "min", "max", "rows"}, ...]``."""
    import pyarrow.parquet as pq

    out = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        pf = pq.ParquetFile(os.path.join(path, name))
        idx = pf.schema_arrow.get_field_index(column)
        lo, hi, rows = None, None, 0
        for rg in range(pf.metadata.num_row_groups):
            st = pf.metadata.row_group(rg).column(idx).statistics
            rows += pf.metadata.row_group(rg).num_rows
            if st is None or not st.has_min_max:
                continue
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        out.append({"file": name, "min": lo, "max": hi, "rows": rows})
    return out


def files_matching_range(stats: list[dict], lo, hi) -> list[dict]:
    """The files a min/max-pruning scan planner would actually read for
    ``column BETWEEN lo AND hi`` — the skip-count evidence."""
    return [s for s in stats
            if s["min"] is not None and not (s["max"] < lo or s["min"] > hi)]
