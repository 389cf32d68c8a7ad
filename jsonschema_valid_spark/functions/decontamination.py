"""Benchmark decontamination — n-gram overlap of a training corpus against
an evaluation/benchmark set.

The standard hygiene pass before training: any document sharing enough
word n-grams with a benchmark item is flagged (and usually dropped) so eval
scores measure generalization, not memorization of leaked test data.

Scale shape (corpus ~10⁹ docs, benchmark ~10⁴-10⁶ items — benchmarks are
ALWAYS the small side):

1. benchmark n-grams: distinct shingles of the benchmark texts — a tiny
   table, explicitly ``broadcast()``;
2. corpus side: explode each doc's distinct shingles (carrying the doc's
   shingle count on every posting row, same trick as ``jaccard_pairs`` —
   no per-doc side table), broadcast-hash-join against the benchmark set
   (NO shuffle of the corpus), and
3. one groupBy(doc_id) — the only shuffle, keyed by the uniform doc id and
   carrying only the matched posting rows (a sparse subset of the corpus).

Everything is native HOFs + joins; no Python in the row path. The reference
has no dedup/decontamination stage — this is a beyond-reference pipeline op
per the brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from jsonschema_valid_spark.functions.dedup import word_shingles


def benchmark_ngrams(bench: DataFrame, text_col: str, n: int = 8) -> DataFrame:
    """Distinct word n-grams of the benchmark set — the contamination
    probe list. n=8-13 is the published range (large n ⇒ near-zero false
    positives on natural text); small corpora/tests use smaller n."""
    return (
        bench.select(F.explode(
            F.array_distinct(word_shingles(F.col(text_col), n))).alias("s"))
        .distinct()
    )


def contamination(docs: DataFrame, bench: DataFrame, key: str,
                  text_col: str, n: int = 8,
                  bench_text_col: str | None = None) -> DataFrame:
    """Per-document contamination report vs the benchmark set:
    ``(key, n_shingles, n_contaminated, contamination_ratio)`` for every
    document with ≥1 overlapping n-gram. Join the result back with a
    left-anti (or threshold the ratio) to drop contaminated docs.

    The benchmark side is deduplicated to distinct n-grams and broadcast;
    the corpus is never shuffled before the (sparse) per-doc rollup."""
    probes = benchmark_ngrams(bench, bench_text_col or text_col, n)
    posting = docs.select(
        F.col(key).alias("id"),
        F.array_distinct(word_shingles(F.col(text_col), n)).alias("sh"),
    ).select(
        "id", F.size("sh").alias("n_shingles"), F.explode("sh").alias("s"))
    hits = posting.join(F.broadcast(probes), on="s")
    return (
        hits.groupBy(F.col("id").alias(key))
        .agg(F.min("n_shingles").alias("n_shingles"),
             F.count(F.lit(1)).alias("n_contaminated"))
        .withColumn("contamination_ratio",
                    F.round(F.col("n_contaminated") / F.col("n_shingles"), 6))
    )


def decontaminate(docs: DataFrame, bench: DataFrame, key: str,
                  text_col: str, n: int = 8, max_ratio: float = 0.0,
                  bench_text_col: str | None = None) -> DataFrame:
    """The clean corpus: drop documents whose contamination_ratio exceeds
    ``max_ratio`` (default 0 — any overlap drops). One broadcast join + one
    sparse groupBy + one left-anti join against the (small) flagged set."""
    flagged = (
        contamination(docs, bench, key, text_col, n, bench_text_col)
        .where(F.col("contamination_ratio") > max_ratio)
        .select(key)
    )
    return docs.join(flagged, on=key, how="left_anti")


def decontamination_violations(df: DataFrame, text_col: str, bench: DataFrame,
                               check_id: str, key: str = "doc_id",
                               n: int = 8, max_ratio: float = 0.0,
                               bench_text_col: str | None = None) -> DataFrame:
    """Violation rows (doc_id, check_id, observed, expected) for the
    ``x-decontamination`` dataset keyword: one row per document whose
    benchmark n-gram contamination_ratio exceeds ``max_ratio``."""
    rep = contamination(df, bench, key, text_col, n, bench_text_col)
    return (
        rep.where(F.col("contamination_ratio") > max_ratio)
        .select(
            F.col(key).cast("string").alias("doc_id"),
            F.lit(check_id).alias("check_id"),
            F.col("contamination_ratio").cast("string").alias("observed"),
            F.lit(f"contamination_ratio <= {max_ratio}").alias("expected"),
        )
    )


def semantic_contamination(
    docs: DataFrame,
    bench: DataFrame,
    key: str,
    vec_col: str,
    bench_key: str | None = None,
    bench_vec_col: str | None = None,
    dim: int | None = None,
    threshold: float = 0.8,
    n_cells: int = 16,
    n_assign: int = 1,
    seed: int = 11,
    centroids: list | None = None,
) -> DataFrame:
    """SEMANTIC decontamination: corpus documents whose EMBEDDING is too
    close to any benchmark embedding — the paraphrase channel n-gram
    overlap misses entirely (a reworded test question shares no 8-gram
    with the original but sits on top of it in embedding space).
    Returns ``(key, bench_id, cos)`` — one row per contaminated doc with
    its closest benchmark item (max cosine; ties break to the larger
    bench id, deterministically).

    Cross-table SemDeDup shape, benchmark-small by construction: both
    sides soft-assign to the SAME coarse centroids (a literal-expression
    projection — share trained ``train_ivf_centroids`` output between
    corpus and bench or the cells don't line up), the benchmark's
    exploded (cell, vector) table is BROADCAST, and candidates meet in a
    broadcast hash join — the corpus is NEVER shuffled before the final
    per-doc max rollup (the one shuffle, carrying only matched pairs).
    Duplicate (doc, bench) meetings across shared cells are harmless:
    the rollup is a max, so no distinct is spent on them."""
    from jsonschema_valid_spark.functions.similarity import (
        _require_dim,
        cosine,
        ivf_centroids,
        soft_cell_assign,
    )

    bench_key = bench_key or key
    bench_vec_col = bench_vec_col or vec_col
    dim = _require_dim(docs, vec_col, dim)
    cents = centroids if centroids is not None else ivf_centroids(
        dim, n_cells, seed)

    dv = F.col(vec_col).cast("array<double>")
    bv = F.col(bench_vec_col).cast("array<double>")
    da = docs.select(
        F.col(key).alias("__doc"), dv.alias("__vd"),
        F.explode(soft_cell_assign(dv, cents, n_assign)).alias("cell"))
    ba = bench.select(
        F.col(bench_key).alias("bench_id"), bv.alias("__vb"),
        F.explode(soft_cell_assign(bv, cents, n_assign)).alias("cell"))
    hits = (
        da.join(F.broadcast(ba), on="cell")
        .select("__doc", "bench_id",
                cosine(F.col("__vd"), F.col("__vb")).alias("cos"))
        .where(F.col("cos") >= float(threshold))
    )
    return (hits.groupBy("__doc")
            .agg(F.max(F.struct("cos", "bench_id")).alias("m"))
            .select(F.col("__doc").alias(key), F.col("m.bench_id"),
                    F.col("m.cos").alias("cos")))


def semantic_decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    key: str,
    vec_col: str,
    **kwargs,
) -> DataFrame:
    """Drop semantically contaminated documents: ``docs`` minus every row
    :func:`semantic_contamination` flags (left-anti on the key)."""
    flagged = semantic_contamination(docs, bench, key, vec_col,
                                     **kwargs).select(key)
    return docs.join(flagged, on=key, how="left_anti")


def fuzzy_contamination(
    docs: DataFrame,
    bench: DataFrame,
    key: str,
    text_col: str,
    bench_key: str | None = None,
    bench_text_col: str | None = None,
    num_perm: int = 64,
    bands: int = 16,
    n: int = 3,
    threshold: float = 0.7,
    seed: int = 42,
    portable: bool = False,
) -> DataFrame:
    """FUZZY-TEXT decontamination: corpus documents whose n-gram shingle
    set is near-duplicate to any benchmark item — the middle channel of
    the trio (exact n-gram :func:`contamination` misses edits; embedding
    :func:`semantic_contamination` needs vectors; this catches the
    lightly-edited verbatim leak from text alone). Returns
    ``(key, bench_id, jaccard)`` — closest benchmark item per
    contaminated doc (max Jaccard; ties to the larger bench id).

    Cross-table MinHash-LSH, benchmark-small by construction: both sides
    band their signatures (identical permutations — same seed or the
    buckets don't line up), the benchmark's banded table AND its shingle
    sets broadcast, candidates meet in broadcast hash joins, exact
    Jaccard verifies — the corpus is NEVER shuffled before the final
    per-doc max rollup. Duplicate meetings across bands are absorbed by
    the max (no distinct spent). ``portable=True`` = md5 shingle hash +
    raw band keys for the SQL oracle."""
    from jsonschema_valid_spark.functions.dedup import (
        minhash_sig_from_hashes,
        shingle_hashes,
        word_shingles,
    )

    if num_perm % bands != 0:
        raise ValueError(f"num_perm ({num_perm}) must be divisible by "
                         f"bands ({bands})")
    r = num_perm // bands
    bench_key = bench_key or key
    bench_text_col = bench_text_col or text_col

    def prep(df, k, t, out_id):
        # staged shingle-hash column: the num_perm permutation exprs
        # reference one materialized array instead of re-tokenizing the
        # text per permutation (HOFs are CodegenFallback — no CSE)
        return (df.select(
                    F.col(k).alias(out_id),
                    F.array_distinct(word_shingles(F.col(t), n))
                    .alias("sh"),
                    shingle_hashes(F.col(t), n, portable=portable)
                    .alias("__shh"))
                .withColumn("sig", minhash_sig_from_hashes(
                    F.col("__shh"), num_perm, seed))
                .drop("__shh"))

    def banded(base, out_id, sh_out):
        # the shingle set RIDES the banding explode: band-bucket misses
        # are dropped inside the same stage by the broadcast join below,
        # so the corpus is never re-fetched by key (which would be a
        # corpus-wide shuffle) — the bands-x array duplication exists
        # only in flight
        def band_key(b):
            parts = [F.col("sig")[b * r + i].cast("string")
                     for i in range(r)]
            joined = F.concat_ws(",", *parts)
            return joined if portable else F.xxhash64(joined)

        structs = [F.struct(F.lit(b).alias("band"),
                            band_key(b).alias("bh")) for b in range(bands)]
        return (base.select(out_id, F.col("sh").alias(sh_out),
                            F.explode(F.array(*structs)).alias("bb"))
                .select(out_id, sh_out, "bb.band", "bb.bh"))

    dside = prep(docs, key, text_col, "__doc")
    bside = prep(bench, bench_key, bench_text_col, "bench_id")
    jac = (F.size(F.array_intersect("sha", "shb"))
           / F.size(F.array_union("sha", "shb")))
    hits = (banded(dside, "__doc", "sha")
            .join(F.broadcast(banded(bside, "bench_id", "shb")),
                  on=["band", "bh"])
            .select("__doc", "bench_id", jac.alias("jaccard"))
            .where(F.col("jaccard") >= float(threshold)))
    return (hits.groupBy("__doc")
            .agg(F.max(F.struct("jaccard", "bench_id")).alias("m"))
            .select(F.col("__doc").alias(key), F.col("m.bench_id"),
                    F.col("m.jaccard").alias("jaccard")))


def fuzzy_decontamination_violations(
    df: DataFrame, text_col: str, bench: DataFrame, check_id: str,
    key: str = "doc_id", threshold: float = 0.7, num_perm: int = 64,
    bands: int = 16, n: int = 3, seed: int = 42,
    bench_text_col: str | None = None, portable: bool = False,
) -> DataFrame:
    """``x-decontamination {"method": "fuzzy"}`` adapter: one violation
    row per document whose shingle Jaccard to some benchmark item
    reaches ``threshold``."""
    hits = fuzzy_contamination(
        df, bench, key, text_col, bench_text_col=bench_text_col,
        num_perm=num_perm, bands=bands, n=n, threshold=threshold,
        seed=seed, portable=portable)
    return hits.select(
        F.col(key).cast("string").alias("doc_id"),
        F.lit(check_id).alias("check_id"),
        F.concat(F.lit("jaccard="), F.round("jaccard", 6).cast("string"),
                 F.lit(" vs "),
                 F.col("bench_id").cast("string")).alias("observed"),
        F.lit(f"benchmark shingle jaccard < {float(threshold):g}")
        .alias("expected"),
    )


def semantic_decontamination_violations(
    df: DataFrame, vec_col: str, bench: DataFrame, check_id: str,
    key: str = "doc_id", threshold: float = 0.8, dim: int | None = None,
    n_cells: int = 16, n_assign: int = 1, seed: int = 11,
    centroids: list | None = None, bench_vec_col: str | None = None,
) -> DataFrame:
    """``x-decontamination {"method": "semantic"}`` adapter: one violation
    row per document whose embedding cosine to some benchmark item
    reaches ``threshold``."""
    hits = semantic_contamination(
        df, bench, key, vec_col, bench_vec_col=bench_vec_col, dim=dim,
        threshold=threshold, n_cells=n_cells, n_assign=n_assign,
        seed=seed, centroids=centroids)
    return hits.select(
        F.col(key).cast("string").alias("doc_id"),
        F.lit(check_id).alias("check_id"),
        F.concat(F.lit("cosine="), F.round("cos", 6).cast("string"),
                 F.lit(" vs "),
                 F.col("bench_id").cast("string")).alias("observed"),
        F.lit(f"benchmark cosine < {float(threshold):g}")
        .alias("expected"),
    )


def bloom_contamination_flags(
    df: DataFrame,
    bench: DataFrame,
    text_col: str,
    n: int = 8,
    max_ratio: float = 0.0,
    m_bits: int = 1 << 20,
    k: int = 5,
    seed: int = 7,
    bench_text_col: str | None = None,
) -> DataFrame:
    """STATELESS contamination flagging: ``df`` + ``contamination_ratio``
    + ``contaminated`` columns, computed per row against a Bloom filter
    of the benchmark's n-grams — no explode, no join on the corpus side,
    no per-doc re-grouping. Because it is a pure projection over a
    stream-static broadcast, THE SAME CALL WORKS ON A STREAMING
    DataFrame (validate-on-ingest decontamination; the exact-overlap
    operator needs a per-doc rollup a stateless stream can't do).

    Probe semantics: Bloom has no false negatives, so the ratio never
    UNDERcounts — a flagged-clean doc is certainly clean. False
    positives inflate the ratio by ~FPR per shingle (size ``m_bits`` at
    >= ~10 bits per benchmark n-gram for FPR < 1%); with
    ``max_ratio=0`` an FP can over-flag, so streaming deployments
    route flags to quarantine for the exact batch check rather than
    dropping outright."""
    from jsonschema_valid_spark.operators.bloom import (
        _probe_hash,
        bloom_build,
    )

    ngrams = benchmark_ngrams(bench, bench_text_col or text_col, n)
    bloom = bloom_build(ngrams, "s", m_bits=m_bits, k=k, seed=seed)

    # shiftleft needs a LITERAL shift amount (Spark 4), so the per-bit
    # masks come from a 63-entry powers-of-two literal array instead
    pow2 = F.array(*[F.lit(1 << b).cast("long") for b in range(63)])

    def member(s):
        tests = None
        for i in range(k):
            h = _probe_hash(s, m_bits, seed, i)
            mask = F.try_element_at(pow2,
                                    (F.pmod(h, F.lit(63)) + 1).cast("int"))
            t = ((F.try_element_at(
                F.col("__bloom_words"),
                F.floor(h / F.lit(63)).cast("int") + F.lit(1))
                .bitwiseAND(mask)) != 0)
            tests = t if tests is None else (tests & t)
        return tests

    sh = F.array_distinct(word_shingles(F.col(text_col), n))
    probed = df.crossJoin(F.broadcast(
        bloom.select(F.col("words").alias("__bloom_words"))))
    staged = probed.withColumn("__sh", sh)
    ratio = F.when(
        F.size("__sh") > 0,
        F.size(F.filter("__sh", member)).cast("double")
        / F.size("__sh").cast("double")).otherwise(F.lit(0.0))
    return (staged.withColumn("contamination_ratio", F.round(ratio, 6))
            .withColumn("contaminated",
                        F.col("contamination_ratio") > float(max_ratio))
            .drop("__sh", "__bloom_words"))
