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


def zorder_key(df: DataFrame, columns: list[str], bits: int = 8,
               edges: dict[str, list[float]] | None = None):
    """``(df + __zorder column, edges)``: the Morton (Z-order) interleave
    key over ``columns``, each rank-normalized to ``bits`` bits.

    Rank normalization first: raw bit-interleaving is useless when the
    columns live on different scales (interleaving a [0, 10^9] key with
    a [0, 100] key gives the wide column every significant bit).  Each
    column is bucketed by its own approx-quantile edges (2^bits - 1 of
    them, computed once on the driver from a sample-backed sketch, then
    applied as the same literal-array HOF as equi-depth drift — no join,
    no UDF), so every column contributes exactly ``bits`` uniformly-
    populated bits.  Then bit j of column c lands at position
    j * n_cols + c — pure shift/AND/OR codegen, no Python.

    Pass ``edges`` to reuse a previous layout's quantile grid (so
    incremental writes stay comparable); otherwise they are computed
    here and returned for that purpose."""
    if not 1 <= int(bits) <= 16:
        raise ValueError(f"bits must be in [1, 16], got {bits}")
    if len(columns) < 2:
        raise ValueError("zorder needs >= 2 columns (use "
                         "write_range_layout for one)")
    bits = int(bits)
    if bits * len(columns) > 63:
        raise ValueError(
            f"bits ({bits}) x columns ({len(columns)}) = "
            f"{bits * len(columns)} interleaved bits exceeds the 63 a "
            "signed long key can hold — lower bits")
    n_cells = (1 << bits) - 1
    if edges is None:
        qs = [i / (n_cells + 1) for i in range(1, n_cells + 1)]
        # ONE pass: approxQuantile accepts a column list and computes
        # every sketch in a single scan (per-column calls would each
        # rescan the input)
        all_es = df.approxQuantile(list(columns), qs, 0.001)
        edges = dict(zip(columns, all_es))
    key = None
    for ci, c in enumerate(columns):
        es = list(edges[c])
        arr = F.array(*[F.lit(float(e)) for e in es])
        val = F.col(c).cast("double")
        rank = F.size(F.filter(arr, lambda e: val >= e))
        # LONG before shifting: shiftleft on an int wraps modulo 32, so
        # bit positions >= 31 would corrupt the key (sign bit at 31,
        # collisions past 32) for bits x columns > 31
        bucket = F.least(rank, F.lit(n_cells)).cast("long")
        for j in range(bits):
            bit = F.shiftleft(
                F.shiftright(bucket, j).bitwiseAND(F.lit(1)),
                j * len(columns) + ci)
            key = bit if key is None else key.bitwiseOR(bit)
    return df.withColumn("__zorder", key.cast("long")), edges


def write_zorder_layout(df: DataFrame, path: str, columns: list[str],
                        n_files: int = 32, bits: int = 8,
                        mode: str = "overwrite",
                        edges: dict[str, list[float]] | None = None
                        ) -> dict[str, list[float]]:
    """MULTI-column data skipping — :func:`write_range_layout`'s k-D
    sibling.  A single-column sort gives perfect pruning on that column
    and NONE on any other; sorting by the Morton interleave gives every
    participating column locality at once, so each written file owns a
    small k-D tile and its parquet min/max footers are narrow in EVERY
    dimension — a box predicate (``a BETWEEN .. AND b BETWEEN ..``)
    prunes files on all columns simultaneously (the Delta/Iceberg
    ``OPTIMIZE ZORDER BY`` layout, rebuilt from first principles:
    quantile-rank normalization + bit interleave + range-partitioned
    sorted write).  The range exchange is paid once at write time; the
    returned ``edges`` reproduce the grid for incremental writes.

    Evidence contract (tests): per-dimension footer intervals from
    :func:`file_range_stats` are narrow for BOTH columns, and a 2-D box
    probe via :func:`files_matching_box` touches a small fraction of
    files — while a 1-D sorted control prunes only its own column and a
    box probe on the other column touches everything."""
    keyed, edges = zorder_key(df, columns, bits=bits, edges=edges)
    (keyed.repartitionByRange(int(n_files), F.col("__zorder"))
          .sortWithinPartitions("__zorder")
          .drop("__zorder")
          .write.mode(mode).parquet(path))
    return edges


def files_matching_box(path: str, ranges: dict[str, tuple]) -> list[str]:
    """The files a min/max-pruning planner would read for a conjunctive
    box predicate ``AND_c (c BETWEEN lo_c AND hi_c)`` — the k-D
    skip-count evidence: a file survives only if its footer interval
    intersects the box in EVERY dimension.  Each file's footer is
    opened ONCE and every queried column's bounds extracted from it
    (k separate file_range_stats passes would pay k metadata reads per
    file — a real cost on object stores)."""
    import pyarrow.parquet as pq

    out = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        pf = pq.ParquetFile(os.path.join(path, name))
        alive = True
        for c, (lo, hi) in ranges.items():
            idx = pf.schema_arrow.get_field_index(c)
            cmin, cmax = None, None
            for rg in range(pf.metadata.num_row_groups):
                st = pf.metadata.row_group(rg).column(idx).statistics
                if st is None or not st.has_min_max:
                    continue
                cmin = st.min if cmin is None else min(cmin, st.min)
                cmax = st.max if cmax is None else max(cmax, st.max)
            if cmin is None or cmax < lo or cmin > hi:
                alive = False
                break
        if alive:
            out.append(name)
    return out


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
