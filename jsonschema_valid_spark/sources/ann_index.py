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
    cosine,
    ivf_centroids,
    pq_codebooks,
    pq_encode,
)


def write_ivf_pq_index(df: DataFrame, path: str, key: str, vec_col: str,
                       dim: int, n_cells: int = 16, seed: int = 11,
                       m: int = 8, n_codes: int = 16, pq_seed: int = 13,
                       keep_vectors: bool = True,
                       centroids: list | None = None,
                       books: list | None = None) -> None:
    """Materialize the ANN index: one pass over the corpus computing cell +
    codes (both pure projections), written ``partitionBy("__cell")``.
    ``keep_vectors=False`` drops the float vectors for a codes-only index
    (ADC-only serving, ~64× smaller). Pass ``centroids``/``books`` from
    ``train_ivf_centroids``/``train_pq_codebooks`` for k-means-trained
    quantizers (r4); the seeded defaults keep the index input-independent.
    Queries against a trained index must pass the SAME constants."""
    cents = centroids if centroids is not None else ivf_centroids(
        dim, n_cells, seed)
    books = books if books is not None else pq_codebooks(
        dim, m, n_codes, pq_seed)
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
                n_codes: int = 16, pq_seed: int = 13,
                centroids: list | None = None,
                books: list | None = None) -> DataFrame:
    """Approximate top-k over a written index: probe cells are computed
    driver-side from the (tiny, deterministic) centroid set, so the filter
    is a literal ``__cell IN (...)`` the scan prunes on; scoring is the
    same ADC lookup as ``pq_topk`` but over the PRECOMPUTED ``__codes``
    column — the float vectors are never read."""
    dim = len(query)
    cents = centroids if centroids is not None else ivf_centroids(
        dim, n_cells, seed)
    probe1 = [i + 1 for i in
              sorted(range(n_cells),
                     key=lambda i: -sum(q * x for q, x in zip(query, cents[i]))
                     )[:n_probe]]
    books = books if books is not None else pq_codebooks(
        dim, m, n_codes, pq_seed)
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


def ivf_pq_rerank_from_index(spark: SparkSession, path: str, key: str,
                             vec_col: str, query: list[float], k: int = 10,
                             n_cells: int = 16, n_probe: int = 4,
                             seed: int = 11, m: int = 8, n_codes: int = 16,
                             pq_seed: int = 13,
                             rerank: int = 64,
                             centroids: list | None = None,
                             books: list | None = None) -> DataFrame:
    """The complete IVF-PQ serving pipeline over a written index
    (``write_ivf_pq_index`` with ``keep_vectors=True``):

    1. prune cells (``__cell IN probes`` → partition pruning),
    2. ADC-score the PRECOMPUTED ``__codes`` → top ``rerank`` candidates —
       this stage's scan reads only (key, __codes): the float vector column
       is absent from its ReadSchema (plan-asserted in tests/test_plans.py),
    3. fetch vectors for ONLY the candidates (broadcast join of the tiny
       candidate set) and exact-cosine reorder → top-k.

    At 100 TB stage 2 touches 4-byte codes across probed cells and stage 3
    touches ``rerank`` vectors — the full-precision column is never scanned
    corpus-wide."""
    cand = ivf_pq_topk(spark, path, key, query, k=rerank, n_cells=n_cells,
                       n_probe=n_probe, seed=seed, m=m, n_codes=n_codes,
                       pq_seed=pq_seed, centroids=centroids,
                       books=books).select(key)
    q = F.array(*[F.lit(float(x)) for x in query])
    vecs = spark.read.parquet(path).select(
        F.col(key), F.col(vec_col).alias("__v"))
    return (
        F.broadcast(cand).join(vecs, on=key)
        .select(F.col(key),
                F.round(cosine(F.col("__v").cast("array<double>"), q), 6)
                .alias("cos"))
        .orderBy(F.desc("cos"), F.col(key))
        .limit(k)
    )


# ---------------------------------------------------------------------------
# SemDeDup write-time layout: the soft cell-assignment table bucketed by
# cell, so the candidate self-join — the operator's only large shuffle —
# reads its clustering from the file layout (zero Exchange on either join
# side, same mechanism as sources/bucketing.py uniqueness).
# ---------------------------------------------------------------------------

def write_semdedup_assignments(df: DataFrame, table: str, key: str,
                               vec_col: str, dim: int | None = None,
                               n_cells: int = 16, n_assign: int = 1,
                               seed: int = 11,
                               centroids: list | None = None,
                               buckets: int = 32) -> None:
    """Materialize the exploded (cell, id, v) soft-assignment table
    bucketed by ``cell``: one pass computing assignments (a pure
    projection — centroids live in the plan) plus the one-time write
    shuffle. Every subsequent :func:`semdedup_pairs_from_assignments`
    candidate join is then exchange-free. Pass ``train_ivf_centroids``
    output for production recall; the same constants must be used at
    query time only if cells are recomputed — here they are STORED, so
    the pair query needs no centroid constants at all."""
    from jsonschema_valid_spark.functions.similarity import (
        _require_dim,
        ivf_centroids,
        soft_cell_assign,
    )
    from jsonschema_valid_spark.sources.bucketing import write_bucketed

    dim = _require_dim(df, vec_col, dim)
    cents = centroids if centroids is not None else ivf_centroids(
        dim, n_cells, seed)
    v = F.col(vec_col).cast("array<double>")
    assigned = df.select(
        F.col(key).alias("id"), v.alias("v"),
        F.explode(soft_cell_assign(v, cents, n_assign)).alias("cell"))
    write_bucketed(assigned, table, "cell", buckets=buckets)


def semdedup_pairs_from_assignments(spark: SparkSession, table: str,
                                    threshold: float = 0.45) -> DataFrame:
    """SemDeDup pairs over a written assignment table: bucketed self-join
    on ``cell`` (no Exchange on either side — plan-asserted in
    tests/test_plans.py), exact cosine on the carried vectors (no
    separate vector-fetch joins: each assignment row brought its vector),
    then one distinct over the (a, b, cos) candidates — the only shuffle,
    keyed by the (small) verified-pair set."""
    from jsonschema_valid_spark.functions.similarity import cosine
    from jsonschema_valid_spark.sources.bucketing import read_bucketed

    t = read_bucketed(spark, table)
    x, y = t.alias("x"), t.alias("y")
    joined = (x.join(y, on="cell")
              .where(F.col("x.id") < F.col("y.id")))
    cos = cosine(F.col("x.v"), F.col("y.v"))
    return (joined.select(F.col("x.id").alias("a"),
                          F.col("y.id").alias("b"),
                          cos.alias("cos"))
            .where(F.col("cos") >= threshold)
            .distinct())
