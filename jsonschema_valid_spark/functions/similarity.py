"""Similarity search over embedding columns (``array<float>``).

* brute-force cosine top-k — the exactness baseline: ONE pass over the fact
  table per query batch; the query vectors are broadcast literals/rows, so
  no shuffle at all (a 100 TB scan with a tiny sort-limit reduction).
* hyperplane-LSH bucketed search — the scale path: each vector gets a b-bit
  signature from signs of dot products with seeded random hyperplanes;
  search touches only the query's bucket (plus optional multiprobe
  neighbors). Bucketing is ONE groupBy-free projection; the candidate fetch
  is a bucket-key equi-join.
* embedding near-dup pairs: bucket join on signatures, exact cosine verify.

All dot products are native ``zip_with``/``aggregate`` expressions —
JVM-side, no Python UDFs.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import DataFrame, functions as F


def dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a, b):
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(df: DataFrame, key: str, vec_col: str,
                     query: list[float], k: int = 10) -> DataFrame:
    """Exact top-k by cosine to a literal query vector. Single scan +
    TakeOrderedAndProject (no shuffle of the fact table)."""
    q = F.array(*[F.lit(float(x)) for x in query])
    sims = df.select(
        F.col(key),
        cosine(F.col(vec_col).cast("array<double>"), q).alias("cos"),
    )
    return sims.orderBy(F.desc("cos"), F.col(key)).limit(k)


def _hyperplanes(dim: int, bits: int, seed: int) -> list[list[float]]:
    rnd = random.Random(seed)
    planes = []
    for _ in range(bits):
        v = [rnd.gauss(0.0, 1.0) for _ in range(dim)]
        n = math.sqrt(sum(x * x for x in v)) or 1.0
        planes.append([x / n for x in v])
    return planes


def lsh_signature(vec_col, dim: int, bits: int = 16, seed: int = 7):
    """b-bit sign signature: bit_i = [v · h_i > 0] for seeded Gaussian
    hyperplanes h_i. Collision probability rises with cosine similarity
    (1 − θ/π per bit)."""
    v = vec_col.cast("array<double>")
    sig = F.lit(0).cast("long")
    for i, plane in enumerate(_hyperplanes(dim, bits, seed)):
        p = F.array(*[F.lit(x) for x in plane])
        bit = F.when(dot(v, p) > 0,
                     F.shiftleft(F.lit(1).cast("long"), i)).otherwise(F.lit(0).cast("long"))
        sig = sig.bitwiseOR(bit)
    return sig


def lsh_topk(df: DataFrame, key: str, vec_col: str, query: list[float],
             k: int = 10, bits: int = 12, seed: int = 7) -> DataFrame:
    """Approximate top-k: restrict the scan to rows sharing the query's LSH
    bucket (partition-prunable if the table is written bucketed/partitioned
    by signature), then exact cosine within the bucket."""
    dim = len(query)
    planes = _hyperplanes(dim, bits, seed)
    qsig = 0
    for i, plane in enumerate(planes):
        if sum(q * p for q, p in zip(query, plane)) > 0:
            qsig |= 1 << i
    bucketed = df.withColumn("__sig", lsh_signature(F.col(vec_col), dim, bits, seed))
    q = F.array(*[F.lit(float(x)) for x in query])
    return (
        bucketed.where(F.col("__sig") == qsig)
        .select(F.col(key),
                cosine(F.col(vec_col).cast("array<double>"), q).alias("cos"))
        .orderBy(F.desc("cos"), F.col(key))
        .limit(k)
    )


def ivf_centroids(dim: int, n_cells: int, seed: int = 11) -> list[list[float]]:
    """Deterministic IVF 'coarse quantizer' centroids: seeded Gaussian
    directions, L2-normalized. A production index would k-means these on a
    sample; seeded directions keep the index fully deterministic (and the
    driver oracle replayable) while preserving the IVF plan shape — the
    cell-assignment, probe, and residual-search topology are identical."""
    rnd = random.Random(seed)
    cents = []
    for _ in range(n_cells):
        v = [rnd.gauss(0.0, 1.0) for _ in range(dim)]
        n = math.sqrt(sum(x * x for x in v)) or 1.0
        cents.append([x / n for x in v])
    return cents


def _nearest_cell1(vec_col, centroids: list[list[float]]):
    """1-based argmax_c cos(v, centroid_c) as a native expression: unit
    centroids ⇒ compare raw dot products (norm of v divides out). The dot
    products form ONE array column and the argmax is
    array_position(array_max) — linear expression size (a chained
    when-ladder carrying the running max doubles the tree per cell: 2^16
    nodes at 16 cells ⇒ JVM stack overflow at plan conversion)."""
    dl = F.array(*[dot(vec_col, F.array(*[F.lit(x) for x in c]))
                   for c in centroids])
    return F.array_position(dl, F.array_max(dl))


def ivf_topk(df: DataFrame, key: str, vec_col: str, query: list[float],
             k: int = 10, n_cells: int = 16, n_probe: int = 4,
             seed: int = 11,
             centroids: list[list[float]] | None = None) -> DataFrame:
    """IVF approximate top-k: vectors are assigned to their nearest coarse
    centroid (one projection, no shuffle); a query scans only its n_probe
    nearest cells, then exact cosine within them.

    100 TB shape: write the table partitioned/bucketed by ``__cell`` and the
    probe becomes PARTITION PRUNING — the scan touches n_probe/n_cells of
    the data. Recall/latency trades via n_probe exactly as in FAISS-style
    IVF-Flat; the centroid set is tiny and lives in the plan (broadcast-free
    literal expressions)."""
    cents = centroids if centroids is not None else ivf_centroids(
        len(query), n_cells, seed)

    def _qdot(c):
        return sum(q * x for q, x in zip(query, c))

    probe1 = [i + 1 for i in
              sorted(range(n_cells), key=lambda i: -_qdot(cents[i]))[:n_probe]]
    v = F.col(vec_col).cast("array<double>")
    q = F.array(*[F.lit(float(x)) for x in query])
    return (
        df.withColumn("__cell", _nearest_cell1(v, cents))
        .where(F.col("__cell").isin(probe1))
        .select(F.col(key), cosine(v, q).alias("cos"))
        .orderBy(F.desc("cos"), F.col(key))
        .limit(k)
    )


def embedding_dim(df: DataFrame, vec_col: str) -> int | None:
    """Recorded embedding width of an ArrayType column, if any: reads the
    ``dim`` key of the column's schema METADATA (stamp it at write time
    with :func:`with_embedding_dim`). Returns None when unrecorded — never
    runs a Spark action to find out (a ``df.first()`` probe inside an
    operator constructor would hide a driver-side job)."""
    field = df.schema[vec_col]
    md = field.metadata or {}
    if "dim" in md:
        return int(md["dim"])
    return None


def with_embedding_dim(df: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """Stamp the embedding width into the column's schema metadata so
    downstream operators (``cosine_neardup_pairs(dim=None)``) can size
    their hyperplane constants without an explicit argument. Metadata
    survives parquet round trips (it is written into the parquet/Spark
    schema), so stamp once at ingest."""
    return df.withColumn(
        vec_col, F.col(vec_col).alias(vec_col, metadata={"dim": int(dim)}))


def cosine_neardup_pairs(df: DataFrame, key: str, vec_col: str,
                         dim: int | None = None,
                         threshold: float = 0.95, bits: int = 16,
                         seed: int = 7, tables: int = 1) -> DataFrame:
    """Embedding near-duplicate pairs: LSH-bucket equi-join for candidates
    (same b-bit signature in SOME table), exact cosine verify ≥ threshold.

    ``tables``: number of independent hash tables (seeds). Single-table
    recall at cosine 0.95 with 16 bits is (1 − θ/π)^16 ≈ 0.18; T tables give
    1 − (1 − p)^T (T=8 ⇒ ~0.80, T=16 ⇒ ~0.96). Each table adds one signature
    per row and the candidate join is keyed by (table, signature) — still a
    bucketed equi-join, never all-pairs; duplicates across tables are
    dropped BEFORE the exact-cosine verify so each candidate pays one dot
    product.

    ``dim`` sizes the hyperplane constants. Pass it explicitly, or leave it
    None when the column carries a recorded width in its schema metadata
    (:func:`with_embedding_dim` / :func:`embedding_dim` — VERDICT r3
    item 8). With neither, this RAISES rather than probing ``df.first()``:
    inferring the width would hide a driver-side Spark action inside an
    operator constructor."""
    dim = _require_dim(df, vec_col, dim)
    sig_structs = [
        F.struct(
            F.lit(t).alias("tbl"),
            lsh_signature(F.col(vec_col), dim, bits, seed + t).alias("sig"),
        )
        for t in range(tables)
    ]
    sigs = df.select(
        F.col(key).alias("id"), F.col(vec_col).alias("v"),
        F.explode(F.array(*sig_structs)).alias("ts"),
    ).select("id", "v", "ts.tbl", "ts.sig")
    cand = (
        sigs.alias("x").join(sigs.alias("y"), on=["tbl", "sig"])
        .where(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("a"), F.col("y.id").alias("b"))
        .distinct()
    )
    va = df.select(F.col(key).alias("a"), F.col(vec_col).alias("va"))
    vb = df.select(F.col(key).alias("b"), F.col(vec_col).alias("vb"))
    return (
        cand.join(va, on="a").join(vb, on="b")
        .select(
            "a", "b",
            cosine(F.col("va").cast("array<double>"),
                   F.col("vb").cast("array<double>")).alias("cos"),
        )
        .where(F.col("cos") >= threshold)
    )


# ---------------------------------------------------------------------------
# IVF-PQ: product-quantization ANN (the memory-compression scale path)
# ---------------------------------------------------------------------------

def pq_codebooks(dim: int, m: int = 8, k: int = 16, seed: int = 13,
                 scale: float = 0.15) -> list[list[list[float]]]:
    """Deterministic product-quantization codebooks: ``m`` subspaces of
    ``dim/m`` dims, ``k`` seeded-Gaussian centroids each (componentwise
    std ``scale`` ≈ the embedding component scale). A production index
    would k-means these per subspace on a sample; seeded centroids keep
    the index fully deterministic (and the driver oracle replayable) with
    the identical encode/ADC topology — same trade as ``ivf_centroids``."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    rnd = random.Random(seed)
    d = dim // m
    return [[[rnd.gauss(0.0, scale) for _ in range(d)] for _ in range(k)]
            for _ in range(m)]


def _sub_dot(vec_col, coeffs: list[float], offset: int):
    """Σ_i v[offset+i+1] * c_i in fixed index order (1-based element_at) —
    the term order is part of the oracle contract (identical FP addition
    order in Spark and DuckDB ⇒ identical doubles ⇒ identical argmins)."""
    terms = [F.try_element_at(vec_col, F.lit(offset + i + 1)) * F.lit(c)
             for i, c in enumerate(coeffs)]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def pq_encode(vec_col, books: list[list[list[float]]]):
    """``array<int>`` of per-subspace code indices (1-based):
    code_j = argmin_c ||x_j − c||² = argmin_c (|c|² − 2·c·x_j) — one linear
    expression per centroid (the |x_j|² term is constant across centroids
    and drops out), argmin via array_position(array_min) exactly like the
    IVF cell assignment (linear plan size, no when-ladder)."""
    codes = []
    for j, book in enumerate(books):
        d = len(book[0])
        dists = F.array(*[
            F.lit(sum(c * c for c in cent)) - 2.0 * _sub_dot(vec_col, cent, j * d)
            for cent in book
        ])
        codes.append(F.array_position(dists, F.array_min(dists)).cast("int"))
    return F.array(*codes)


def pq_topk(df: DataFrame, key: str, vec_col: str, query: list[float],
            k: int = 10, m: int = 8, n_codes: int = 16,
            seed: int = 13,
            books: list[list[list[float]]] | None = None) -> DataFrame:
    """IVF-PQ-style approximate top-k by asymmetric distance computation:
    rows are product-quantized to ``m`` code indices (``m·log₂(n_codes)``
    bits — 4 bytes here vs 256 bytes of float32, the factor that lets a
    100 TB embedding table's index live in RAM); the query builds an
    ``m × n_codes`` lookup table of subspace dot products as LITERAL arrays
    in the plan, and each row's score is ``m`` array lookups + adds — no
    shuffle, one projection, then TakeOrderedAndProject.

    At deploy the codes are computed ONCE at write time (a column of the
    table, exactly like ``__cell``); compose with ``ivf_topk``'s partition
    pruning for the full IVF-PQ pipeline: prune cells → score codes →
    exact-rerank the top candidates. Ranks on the 6dp-ROUNDED score with
    key tie-break so Spark and the DuckDB oracle order identically."""
    dim = len(query)
    if books is None:
        books = pq_codebooks(dim, m, n_codes, seed)
    d = dim // m
    v = F.col(vec_col).cast("array<double>")
    codes = pq_encode(v, books)
    luts = [
        F.array(*[F.lit(sum(q * c for q, c in
                            zip(query[j * d:(j + 1) * d], cent)))
                  for cent in book])
        for j, book in enumerate(books)
    ]
    score = F.try_element_at(luts[0], F.try_element_at(codes, F.lit(1)))
    for j in range(1, m):
        score = score + F.try_element_at(luts[j],
                                         F.try_element_at(codes, F.lit(j + 1)))
    return (
        df.select(F.col(key), F.round(score, 6).alias("adc"))
        .orderBy(F.desc("adc"), F.col(key))
        .limit(k)
    )


# ---------------------------------------------------------------------------
# Codebook training: deterministic sampled k-means (Lloyd) in Spark
# ---------------------------------------------------------------------------

def _kmeans_groups(sub: DataFrame, d: int, k: int, iters: int,
                   round_dp: int = 6) -> dict[int, list[list[float]]]:
    """Deterministic Lloyd k-means over grouped vectors.

    ``sub`` is (grp: int, v: array<double>) — one group per PQ subspace (or
    a single group 0 for IVF coarse centroids). Every iteration runs ONE
    distributed assignment + ONE partial/final avg aggregate; the only
    driver traffic is the (n_groups × k × d) centroid matrix. Scale story:
    train on a ``hash_sample`` of the corpus (standard FAISS practice —
    centroid quality needs ~10³-10⁴ points per centroid, not 10¹² rows);
    the train set never collects, only centroids do.

    Determinism: init picks the k lowest-xxhash64 vectors per group (a
    seeded, order-free choice), and centroids are ROUNDED to ``round_dp``
    decimals after every iteration so FP summation-order differences across
    cluster sizes/partitionings cannot leak into assignments."""
    from pyspark.sql import Window

    w = Window.partitionBy("grp").orderBy(
        F.xxhash64(F.col("v").cast("string")), F.col("v").cast("string"))
    init_rows = (sub.withColumn("__rn", F.row_number().over(w))
                 .where(F.col("__rn") <= k).select("grp", "__rn", "v")
                 .collect())
    books: dict[int, list[list[float]]] = {}
    for r in init_rows:
        books.setdefault(r["grp"], [None] * k)[r["__rn"] - 1] = [
            round(float(x), round_dp) for x in r["v"]]
    for g, cents in books.items():
        pad = next(c for c in cents if c is not None)
        books[g] = [c if c is not None else list(pad) for c in cents]

    def _assign_expr():
        # one when-ladder over groups (m ≤ 16 branches); per group the
        # argmin rides array_position(array_min) — linear expression size,
        # same shape as _nearest_cell1/pq_encode
        ladder = None
        for g, cents in sorted(books.items()):
            dists = F.array(*[
                F.lit(sum(c * c for c in cent)) - 2.0 * F.aggregate(
                    F.zip_with(F.col("v"),
                               F.array(*[F.lit(x) for x in cent]),
                               lambda a, b: a * b),
                    F.lit(0.0), lambda acc, t: acc + t)
                for cent in cents
            ])
            am = F.array_position(dists, F.array_min(dists)).cast("int")
            ladder = am if ladder is None else F.when(
                F.col("grp") == g, am).otherwise(ladder)
        return ladder

    for _ in range(iters):
        assigned = sub.withColumn("__code", _assign_expr())
        stats = (assigned.select("grp", "__code",
                                 F.posexplode("v").alias("pos", "x"))
                 .groupBy("grp", "__code", "pos")
                 .agg(F.avg("x").alias("mu"))
                 .collect())
        fresh: dict[tuple[int, int], list[float | None]] = {}
        for r in stats:
            fresh.setdefault((r["grp"], r["__code"] - 1),
                             [None] * d)[r["pos"]] = r["mu"]
        for (g, c), mu in fresh.items():
            if all(x is not None for x in mu):
                books[g][c] = [round(float(x), round_dp) for x in mu]
            # empty clusters keep their previous centroid
    return books


def train_pq_codebooks(df: DataFrame, vec_col: str, dim: int, m: int = 8,
                       n_codes: int = 16, iters: int = 5,
                       ) -> list[list[list[float]]]:
    """K-means-trained product-quantization codebooks (replaces the seeded
    Gaussians of :func:`pq_codebooks` when ADC quality matters — VERDICT r3
    item 2): per subspace j, Lloyd k-means over the corpus' subvectors.
    Deterministic (hash-seeded init + rounded centroids) so a driver query
    and its mirror train identically on the same input. Train on a
    ``functions.sampling.hash_sample`` slice at 100 TB."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    d = dim // m
    v = F.col(vec_col).cast("array<double>")
    sub = df.select(F.explode(F.array(*[
        F.struct(F.lit(j).alias("grp"),
                 F.slice(v, j * d + 1, d).alias("v"))
        for j in range(m)
    ])).alias("s")).select("s.grp", "s.v")
    books = _kmeans_groups(sub, d, n_codes, iters)
    return [books[j] for j in range(m)]


def train_ivf_centroids(df: DataFrame, vec_col: str, dim: int,
                        n_cells: int = 16, iters: int = 5,
                        ) -> list[list[float]]:
    """K-means-trained IVF coarse centroids (replaces :func:`ivf_centroids`'
    seeded directions; same deterministic protocol as
    :func:`train_pq_codebooks`). Returned centroids are L2-normalized so
    `_nearest_cell1`'s dot-product argmax remains a cosine argmax."""
    v = F.col(vec_col).cast("array<double>")
    sub = df.select(F.lit(0).alias("grp"), v.alias("v"))
    cents = _kmeans_groups(sub, dim, n_cells, iters)[0]
    out = []
    for c in cents:
        n = math.sqrt(sum(x * x for x in c)) or 1.0
        out.append([round(x / n, 6) for x in c])
    return out


def ivf_pq_rerank_topk(df: DataFrame, key: str, vec_col: str,
                       query: list[float], k: int = 10, m: int = 8,
                       n_codes: int = 16, seed: int = 13,
                       rerank: int = 64,
                       books: list[list[list[float]]] | None = None
                       ) -> DataFrame:
    """The full PQ serving pipeline promised by ``pq_topk``'s docstring:
    ADC-score the codes → take the top ``rerank`` candidates → fetch the
    FLOAT VECTORS for only those rows (a broadcast join of the tiny
    candidate set against the table) → exact cosine reorder → top-k.

    100 TB shape: stage 1 reads 4-byte codes for every row (when served
    from a written index — ``sources/ann_index.py ivf_pq_rerank_from_index``
    — the float vector column is NOT in stage 1's ReadSchema at all,
    plan-asserted in tests/test_plans.py); stage 2 reads 256-byte vectors
    for only ``rerank`` rows. Recall = P(true top-k ⊆ ADC top-R), which
    rises with R at a fixed, tiny re-rank cost — the standard IVF-PQ
    accuracy knob (R ≫ k, R ≪ corpus).

    Ranks on the 6dp-ROUNDED exact cosine with key tie-break, exactly like
    ``brute_force_topk``'s driver twin — so when the candidate set covers
    the true top-k, the output is BIT-IDENTICAL to brute force (the driver
    oracle is the brute-force SQL, making any recall miss a hash mismatch,
    not a silent approximation)."""
    cand = pq_topk(df, key, vec_col, query, k=rerank, m=m,
                   n_codes=n_codes, seed=seed, books=books).select(key)
    q = F.array(*[F.lit(float(x)) for x in query])
    vecs = df.select(F.col(key), F.col(vec_col).alias("__v"))
    return (
        F.broadcast(cand).join(vecs, on=key)
        .select(F.col(key),
                F.round(cosine(F.col("__v").cast("array<double>"), q), 6)
                .alias("cos"))
        .orderBy(F.desc("cos"), F.col(key))
        .limit(k)
    )


# ---------------------------------------------------------------------------
# int8 scalar quantization (4× embedding storage cut; companion to PQ)
# ---------------------------------------------------------------------------

def quantize_int8(vec_col):
    """Symmetric per-vector int8 quantization: ``scale = max|x|/127``,
    ``q_i = round(x_i/scale)`` — a struct(scale: double, q: array<tinyint>)
    column. One projection; 4× smaller than float32 at write time (the
    cheap storage cut to take BEFORE reaching for PQ's 64×). Zero vectors
    quantize to scale 0 / all-zero codes."""
    v = vec_col.cast("array<double>")
    absmax = F.array_max(F.transform(v, lambda x: F.abs(x)))
    scale = F.when(absmax > 0, absmax / 127.0).otherwise(F.lit(0.0))
    q = F.when(
        absmax > 0,
        F.transform(v, lambda x: F.round(x / (absmax / 127.0), 0)
                    .cast("tinyint"))
    ).otherwise(F.transform(v, lambda x: F.lit(0).cast("tinyint")))
    return F.struct(scale.alias("scale"), q.alias("q"))


def dequantize_int8(qstruct):
    """array<double> reconstruction: ``x̂_i = q_i · scale``."""
    scale = qstruct["scale"]
    return F.transform(qstruct["q"], lambda c: c.cast("double") * scale)


# ---------------------------------------------------------------------------
# SemDeDup: semantic dedup via coarse clustering (Abbas et al. 2023,
# arXiv:2303.09540). Candidate pairs are generated only WITHIN a cluster —
# the cluster count k scales with the corpus so the per-cell quadratic term
# stays bounded (k ≈ √n keeps cell size ≈ √n) — then verified with exact
# cosine. The third near-dup scale path beside signature-LSH
# (cosine_neardup_pairs) and MinHash (text-side): clustering is data-aware,
# so semantically-close pairs co-locate far more reliably than under
# random-hyperplane bucketing at the same candidate budget.
# ---------------------------------------------------------------------------

def _require_dim(df: DataFrame, vec_col: str, dim: int | None) -> int:
    """Resolve the embedding width: explicit arg wins, else the column's
    schema metadata (``with_embedding_dim``); RAISES rather than probing
    ``df.first()`` (no driver-side action inside an operator constructor)."""
    if dim is not None:
        return dim
    found = embedding_dim(df, vec_col)
    if found is None:
        raise ValueError(
            f"dim is required: column {vec_col!r} carries no 'dim' "
            "schema metadata — pass dim= explicitly or stamp the width "
            "with with_embedding_dim(df, col, dim) at ingest")
    return found


def soft_cell_assign(vec_col, centroids: list[list[float]],
                     n_assign: int = 1):
    """Array of 1-based cell ids whose centroid dot-product is ≥ the
    ``n_assign``-th largest — multi-assignment (the clustering analog of
    IVF multiprobe). ``n_assign=1`` is classic hard k-means assignment; a
    pair is a candidate when the two rows share ANY cell, which repairs
    the boundary-split misses that make hard-assigned SemDeDup lossy
    (measured on the sf0.01 embeddings fixture: hard seeded assignment
    captures 2/14 true cosine≥0.45 pairs; n_assign=4 captures 9/14 seeded
    and 14/14 with trained centroids). Ties at the threshold keep every
    tied cell — same ``>= thr`` semantics as the IVF probe oracle."""
    dl = F.array(*[dot(vec_col, F.array(*[F.lit(x) for x in c]))
                   for c in centroids])
    thr = F.sort_array(dl, asc=False)[n_assign - 1]
    return F.filter(
        F.sequence(F.lit(1), F.lit(len(centroids))),
        lambda i: F.element_at(dl, i.cast("int")) >= thr)


def semantic_neardup_pairs(df: DataFrame, key: str, vec_col: str,
                           dim: int | None = None,
                           threshold: float = 0.45, n_cells: int = 16,
                           n_assign: int = 1, seed: int = 11,
                           centroids: list[list[float]] | None = None
                           ) -> DataFrame:
    """SemDeDup candidate generation + verify: assign every row to its
    ``n_assign`` nearest coarse centroids (one projection, no shuffle),
    self-join on the cell id (bucketed equi-join — never all-pairs),
    exact-cosine verify ≥ ``threshold``.

    ``centroids=None`` uses the deterministic seeded directions of
    :func:`ivf_centroids` (fully SQL-replayable — the driver oracle
    interpolates them, ``oracle_gen.semdedup_pairs_sql``); pass
    :func:`train_ivf_centroids` output for production recall (trained
    assignment captures 14/14 fixture pairs at n_assign=4 vs 9/14 seeded —
    pytest-asserted in tests/test_semdedup.py).

    100 TB shape: the assignment is a literal-expression projection
    (centroids live in the plan, nothing broadcast); the candidate join
    keys on ``cell`` whose fan-in is n/k · n_assign rows — write the
    corpus partitioned by hard cell and the join is co-located. Every
    verified pair costs ONE dot product; duplicates across shared cells
    are dropped before the verify."""
    dim = _require_dim(df, vec_col, dim)
    cents = centroids if centroids is not None else ivf_centroids(
        dim, n_cells, seed)
    v = F.col(vec_col).cast("array<double>")
    assigned = df.select(
        F.col(key).alias("id"),
        F.explode(soft_cell_assign(v, cents, n_assign)).alias("cell"))
    cand = (
        assigned.alias("x").join(assigned.alias("y"), on="cell")
        .where(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("a"), F.col("y.id").alias("b"))
        .distinct()
    )
    va = df.select(F.col(key).alias("a"), F.col(vec_col).alias("va"))
    vb = df.select(F.col(key).alias("b"), F.col(vec_col).alias("vb"))
    return (
        cand.join(va, on="a").join(vb, on="b")
        .select("a", "b",
                cosine(F.col("va").cast("array<double>"),
                       F.col("vb").cast("array<double>")).alias("cos"))
        .where(F.col("cos") >= threshold)
    )


def semdedup(df: DataFrame, key: str, vec_col: str,
             dim: int | None = None, threshold: float = 0.45,
             n_cells: int = 16, n_assign: int = 1, seed: int = 11,
             centroids: list[list[float]] | None = None,
             keep: str = "min_key") -> DataFrame:
    """Full SemDeDup: cluster near-dup pairs into connected components and
    mark one survivor per semantic group (``is_survivor`` +``cluster_id``
    columns; ``df.where("is_survivor")`` is the deduplicated corpus).

    ``keep="min_key"`` — deterministic minimum-key survivor (the engine's
    standard rule, shared with the MinHash/SimHash paths via
    ``dedup.neardup_survivors``).
    ``keep="far_from_centroid"`` — the SemDeDup paper's rule: within each
    duplicate group keep the example with the LOWEST cosine to its coarse
    centroid (the least prototypical member — the paper found keeping
    boundary examples preserves downstream model quality better than
    random/prototypical choices; §4.1 of arXiv:2303.09540), key
    tie-broken. The extra cost is one window over ``cluster_id`` (groups
    are tiny — bounded by the near-dup neighborhoods, not the corpus)."""
    from jsonschema_valid_spark.functions.dedup import neardup_survivors

    dim = _require_dim(df, vec_col, dim)
    cents = centroids if centroids is not None else ivf_centroids(
        dim, n_cells, seed)
    pairs = semantic_neardup_pairs(
        df, key, vec_col, dim=dim, threshold=threshold, n_cells=n_cells,
        n_assign=n_assign, seed=seed, centroids=cents)
    marked = neardup_survivors(df, key, pairs)
    if keep == "min_key":
        return marked
    if keep != "far_from_centroid":
        raise ValueError(f"keep must be 'min_key' or 'far_from_centroid', "
                         f"got {keep!r}")
    from pyspark.sql import Window

    v = F.col(vec_col).cast("array<double>")
    dl = F.array(*[dot(v, F.array(*[F.lit(x) for x in c])) for c in cents])
    ccos = F.array_max(dl) / norm(v)
    w = Window.partitionBy("cluster_id").orderBy(
        F.round(ccos, 9).asc(), F.col(key).asc())
    return (marked.drop("is_survivor")
            .withColumn("is_survivor", F.row_number().over(w) == 1))
