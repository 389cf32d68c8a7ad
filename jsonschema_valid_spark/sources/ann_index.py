"""Write-time ANN index layout: IVF cells as PARTITIONS, PQ codes as a
column.

``ivf_topk``/``pq_topk`` compute cell assignments and codes inline (fine
for fixtures); at 100 TB both belong at WRITE time, once:

* ``__cell`` becomes the table's partition column → a query's n_probe cell
  filter is PARTITION PRUNING (the scan plans only n_probe/n_cells of the
  files — zero I/O for unprobed cells, the Iceberg
  ``partition = bucket/…`` story);
* ``__codes`` (m× log₂(n_codes)-bit PQ codes, 4 bytes here) ride each row →
  query-time scoring never touches the 256-byte float vector; the
  optional exact re-rank reads vectors for only the top-R candidates.

This module is that layout: :func:`write_ivf_pq_index` builds it,
:func:`ivf_pq_topk` queries it and compiles to
``Scan(PartitionFilters=[__cell IN probes]) → ADC projection →
TakeOrderedAndProject`` — asserted in ``tests/test_plans.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from jsonschema_valid_spark.functions.similarity import (
    _nearest_cell1,
    ivf_centroids,
    pq_codebooks,
    pq_encode,
)


def write_ivf_pq_index(df: DataFrame, path: str, key: str, vec_col: str,
                       dim: int, n_cells: int = 16, seed: int = 11,
                       m: int = 8, n_codes: int = 16, pq_seed: int = 13,
                       keep_vectors: bool = True) -> None:
    """Materialize the ANN index: one pass over the corpus computing cell +
    codes (both pure projections), written ``partitionBy("__cell")``.
    ``keep_vectors=False`` drops the float vectors for a codes-only index
    (ADC-only serving, ~64× smaller)."""
    cents = ivf_centroids(dim, n_cells, seed)
    books = pq_codebooks(dim, m, n_codes, pq_seed)
    v = F.col(vec_col).cast("array<double>")
    cols = [F.col(key),
            _nearest_cell1(v, cents).alias("__cell"),
            pq_encode(v, books).alias("__codes")]
    if keep_vectors:
        cols.append(F.col(vec_col))
    df.select(*cols).write.mode("overwrite").partitionBy("__cell").parquet(path)


def ivf_pq_topk(spark: SparkSession, path: str, key: str,
                query: list[float], k: int = 10, n_cells: int = 16,
                n_probe: int = 4, seed: int = 11, m: int = 8,
                n_codes: int = 16, pq_seed: int = 13) -> DataFrame:
    """Approximate top-k over a written index: probe cells are computed
    driver-side from the (tiny, deterministic) centroid set, so the filter
    is a literal ``__cell IN (...)`` the scan prunes on; scoring is the
    same ADC lookup as ``pq_topk`` but over the PRECOMPUTED ``__codes``
    column — the float vectors are never read."""
    dim = len(query)
    cents = ivf_centroids(dim, n_cells, seed)
    probe1 = [i + 1 for i in
              sorted(range(n_cells),
                     key=lambda i: -sum(q * x for q, x in zip(query, cents[i]))
                     )[:n_probe]]
    books = pq_codebooks(dim, m, n_codes, pq_seed)
    d = dim // m
    luts = [
        F.array(*[F.lit(sum(q * c for q, c in
                            zip(query[j * d:(j + 1) * d], cent)))
                  for cent in book])
        for j, book in enumerate(books)
    ]
    codes = F.col("__codes")
    score = F.try_element_at(luts[0], F.try_element_at(codes, F.lit(1)))
    for j in range(1, m):
        score = score + F.try_element_at(
            luts[j], F.try_element_at(codes, F.lit(j + 1)))
    idx = spark.read.parquet(path)
    return (
        idx.where(F.col("__cell").isin(probe1))
        .select(F.col(key), F.round(score, 6).alias("adc"))
        .orderBy(F.desc("adc"), F.col(key))
        .limit(k)
    )
