"""Deduplication operators for training-data pipelines.

Exact, MinHash+LSH, SimHash, and n-gram Jaccard — each designed for the
100 TB shape:

* **exact**: hash-groupBy on a fingerprint column; one shuffle keyed by the
  fingerprint (skew-free: fingerprints are uniform), window row_number to
  pick the survivor deterministically.
* **MinHash+LSH**: shingle → 64 minhash values → b bands × r rows; candidate
  generation is an equi-join on (band_id, band_hash) — i.e. a shuffle keyed
  by band buckets, NEVER an all-pairs product. Verification computes exact
  Jaccard only on candidates.
* **SimHash**: 64-bit signature via sign-summed word-hash bits; near-dup
  candidates via the pigeonhole band trick (split into 4×16-bit chunks; any
  pair within Hamming distance 3 shares ≥1 exact chunk).
* **n-gram Jaccard**: exact pairwise Jaccard via an inverted-index join on
  shared shingles (posting-list join), not a cross join.

Everything is native Column expressions (HOF transforms, xxhash64) — no
Python in the row path.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, Window, functions as F

MERSENNE61 = (1 << 61) - 1


# ---------------------------------------------------------------------------
# exact
# ---------------------------------------------------------------------------

def exact_duplicates(df: DataFrame, key: str, on) -> DataFrame:
    """Rows to DROP under exact dedup on expression/column ``on``; the
    survivor per group is the minimum key (deterministic)."""
    fp = on
    base = df.select(F.col(key), F.col(fp).alias("__fp") if isinstance(fp, str) else fp.alias("__fp"))
    w = Window.partitionBy("__fp").orderBy(F.col(key))
    return (
        base.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") > 1)
        .select(F.col(key), F.col("__fp"))
    )


def dedup_exact(df: DataFrame, key: str, on) -> DataFrame:
    """The deduplicated table (keep min-key row per fingerprint group)."""
    w = Window.partitionBy(on).orderBy(F.col(key))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


# ---------------------------------------------------------------------------
# shingles + exact Jaccard (inverted-index join)
# ---------------------------------------------------------------------------

def word_shingles(col, n: int = 3):
    """n-word shingles as strings (native HOFs)."""
    words = F.split(F.lower(F.trim(col)), r"\s+")
    k = F.size(words) - (n - 1)
    return F.when(k <= 0, F.array(F.concat_ws(" ", words))).otherwise(
        F.transform(F.sequence(F.lit(1), k),
                    lambda i: F.concat_ws(" ", F.slice(words, i, n)))
    )


def jaccard_pairs(df: DataFrame, key: str, text_col: str, n: int = 3,
                  threshold: float = 0.8,
                  max_doc_freq: int | None = None) -> DataFrame:
    """Exact n-gram Jaccard similar pairs via inverted-index join.

    Plan: explode distinct shingles carrying each doc's shingle-set size →
    self-join on shingle (posting lists) → count shared shingles per pair →
    Jaccard = shared / (|A|+|B|−shared). The sizes ride the exploded rows
    (min() in the same groupBy), so NO per-document side table is ever
    built or broadcast — a broadcast of one-row-per-doc would OOM the driver
    at 10⁹ documents.

    ``max_doc_freq``: document-frequency cap — shingles appearing in more
    than this many documents (stopword runs, boilerplate) are dropped from
    the index via a broadcast anti-join against the (tiny) hot-shingle set.
    This bounds the worst posting list: a shingle shared by D docs creates
    D² candidate rows, so a hot shingle at D=10⁶ is a 10¹²-row skew bomb.
    NOTE: capping changes the measured Jaccard for affected pairs (the
    capped shingles leave the universe); it is the standard
    precision-for-survival trade at corpus scale. None = exact.

    Returns (a, b, jaccard) with a < b."""
    sh = df.select(
        F.col(key).alias("id"),
        F.array_distinct(word_shingles(F.col(text_col), n)).alias("sh"),
    )
    # n_sh rides every posting row — grouped back out with min() below
    inv = sh.select(
        "id", F.size("sh").alias("n_sh"), F.explode("sh").alias("s"))
    if max_doc_freq is not None:
        hot = (inv.groupBy("s").agg(F.count(F.lit(1)).alias("__df"))
               .where(F.col("__df") > max_doc_freq)
               .select("s"))
        inv = inv.join(F.broadcast(hot), on="s", how="left_anti")
        # recompute set sizes over the CAPPED universe so the Jaccard
        # denominator matches the shared-count numerator (one extra
        # shuffle of the posting table, only when capping is on)
        inv = inv.withColumn(
            "n_sh", F.count(F.lit(1)).over(Window.partitionBy("id")))
    pairs = (
        inv.alias("x")
        .join(inv.alias("y"), on="s")
        .where(F.col("x.id") < F.col("y.id"))
        .groupBy(F.col("x.id").alias("a"), F.col("y.id").alias("b"))
        .agg(F.count(F.lit(1)).alias("shared"),
             F.min(F.col("x.n_sh")).alias("na"),
             F.min(F.col("y.n_sh")).alias("nb"))
    )
    return (
        pairs.select(
            "a", "b",
            (F.col("shared")
             / (F.col("na") + F.col("nb") - F.col("shared"))).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

MERSENNE31 = (1 << 31) - 1


def portable_hash60(col):
    """60-bit deterministic string hash computable IDENTICALLY in Spark and
    DuckDB: the first 15 hex digits of md5, parsed as an integer. Slower
    than xxhash64 (the production default) but lets the driver's DuckDB
    oracle replay the full MinHash/SimHash/fingerprint math — the hash is
    the only piece xxhash64 keeps Spark-specific.

    Spark:  CAST(conv(substr(md5(s), 1, 15), 16, 10) AS BIGINT)
    DuckDB: CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def _perm_params(num_perm: int, seed: int) -> list[tuple[int, int]]:
    rnd = random.Random(seed)
    return [(rnd.randrange(1, MERSENNE31), rnd.randrange(0, MERSENNE31))
            for _ in range(num_perm)]


def _affine_min(hashes, a: int, b: int):
    # single-arg lambda via closure factory: PySpark infers HOF arity from
    # the Python signature, so default-arg tricks (lambda h, a=a) break it.
    # 31-bit hash space keeps a*h+b inside int64 under ANSI mode.
    return F.array_min(F.transform(
        hashes,
        lambda h: F.pmod(F.lit(a) * h + F.lit(b), F.lit(MERSENNE31)),
    ))


def shingle_hashes(col, n: int = 3, portable: bool = False):
    """Array<long> of 31-bit shingle hashes — STAGE this as its own
    column before fanning out the permutations (see
    :func:`minhash_sig_from_hashes`)."""
    shingle_hash = (
        (lambda s: F.pmod(portable_hash60(s), F.lit(MERSENNE31)))
        if portable
        else (lambda s: F.pmod(F.xxhash64(s), F.lit(MERSENNE31)))
    )
    return F.transform(F.array_distinct(word_shingles(col, n)),
                       shingle_hash)


def minhash_sig_from_hashes(hashes, num_perm: int = 64, seed: int = 42):
    """num_perm affine permutations min-reduced over an ALREADY-STAGED
    hash-array column.  The staging matters: HOF expressions are
    CodegenFallback, so a `hashes` built inline would be re-tokenized
    and re-hashed once per permutation (the O(n·perms) pitfall
    kgram_hashes documents) — pass a real column (e.g. via
    ``withColumn``), not the tokenize-and-hash expression."""
    return F.array(*[_affine_min(hashes, a, b)
                     for a, b in _perm_params(num_perm, seed)])


def minhash_signature(col, num_perm: int = 64, n: int = 3, seed: int = 42,
                      portable: bool = False):
    """Array<long> MinHash signature of the text's n-gram shingle set.
    One hash per shingle (folded to 31 bits), then num_perm affine
    permutations min-reduced per row — all native array HOFs.

    NOTE (review find): as a single inline expression the shingle
    hashing is re-evaluated once per permutation (HOFs are
    CodegenFallback — no CSE).  The df-level operators
    (minhash_lsh_pairs, fuzzy_contamination) stage
    :func:`shingle_hashes` as a column and call
    :func:`minhash_sig_from_hashes`; keep this convenience form for
    one-off expressions and oracles only.

    ``portable=True`` swaps xxhash64 for the md5-based ``portable_hash60``
    so an external SQL engine (the driver's DuckDB oracle) can replay the
    identical signature; the permutation/banding math is unchanged."""
    return minhash_sig_from_hashes(
        shingle_hashes(col, n, portable=portable), num_perm, seed)


def minhash_lsh_pairs(df: DataFrame, key: str, text_col: str,
                      num_perm: int = 64, bands: int = 16, n: int = 3,
                      threshold: float = 0.7, seed: int = 42,
                      portable: bool = False) -> DataFrame:
    """Near-duplicate pairs via MinHash LSH banding + exact-Jaccard verify.

    r = num_perm // bands rows per band; a pair lands in the same bucket of
    some band with probability 1−(1−J^r)^bands. Candidates come from a
    groupBy/self-join on (band, band_hash) — shuffle keyed by buckets —
    then exact Jaccard on the candidates only.

    ``portable=True``: md5-based shingle hash + raw concat band keys so the
    whole pipeline is replayable in ANSI SQL (oracle mode); xxhash64 stays
    the production default (faster, same math)."""
    if num_perm % bands != 0:
        raise ValueError(f"num_perm ({num_perm}) must be divisible by "
                         f"bands ({bands})")
    r = num_perm // bands
    # STAGED: the shingle-hash array becomes a real column before the
    # num_perm permutation expressions reference it — inline it and every
    # permutation re-tokenizes and re-hashes the text (no CSE in HOFs)
    sh = (df.select(
            F.col(key).alias("id"),
            F.array_distinct(word_shingles(F.col(text_col), n)).alias("sh"))
          .withColumn("__shh", F.transform(
              F.col("sh"),
              (lambda s: F.pmod(portable_hash60(s), F.lit(MERSENNE31)))
              if portable
              else (lambda s: F.pmod(F.xxhash64(s), F.lit(MERSENNE31)))))
          .withColumn("sig", minhash_sig_from_hashes(
              F.col("__shh"), num_perm, seed))
          .drop("__shh"))
    # band hashes via literal indexing (bands/r are driver constants) —
    # avoids nested HOF lambdas, which Catalyst's lambda binder rejects.
    # Portable mode joins on the raw signature-slice string (no xxhash64
    # compression of the key — identical join semantics).
    def band_key(b):
        parts = [F.col("sig")[b * r + i].cast("string") for i in range(r)]
        joined = F.concat_ws(",", *parts)
        # production keeps the 8-byte xxhash64 join key (narrow shuffle)
        return joined if portable else F.xxhash64(joined)

    band_structs = [
        F.struct(F.lit(b).alias("band"), band_key(b).alias("bh"))
        for b in range(bands)
    ]
    banded = sh.select(
        "id", F.explode(F.array(*band_structs)).alias("bb")
    ).select("id", "bb.band", "bb.bh")
    cand = (
        banded.alias("x")
        .join(banded.alias("y"), on=["band", "bh"])
        .where(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("a"), F.col("y.id").alias("b"))
        .distinct()
    )
    verified = (
        cand.join(sh.select(F.col("id").alias("a"), F.col("sh").alias("sha")), on="a")
        .join(sh.select(F.col("id").alias("b"), F.col("sh").alias("shb")), on="b")
        .select(
            "a", "b",
            (F.size(F.array_intersect("sha", "shb"))
             / F.size(F.array_union("sha", "shb"))).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
    return verified


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def _bit_vote(hashes, b: int):
    """Σ_words (bit_b(hash) ? +1 : −1) — literal shift amount (Spark's
    shift functions take Python-int bit counts, not Columns)."""
    return F.aggregate(
        hashes, F.lit(0).cast("long"),
        lambda acc, h: acc + (F.shiftright(h, b).bitwiseAND(F.lit(1)) * 2 - 1),
    )


def simhash64(col, portable: bool = False):
    """64-bit SimHash over whitespace words: bit b of the signature is the
    sign of Σ_words (bit_b(xxhash64(word)) ? +1 : −1). Native: 64 unrolled
    array aggregates (one per bit), fused by codegen into one pass over the
    word-hash array.

    ``portable=True``: md5-based 60-bit word hash (``portable_hash60``) so
    the DuckDB oracle can replay the signature; bits 60–63 vote all −1 and
    stay 0 in both engines (an effective 60-bit SimHash — the voting,
    pigeonhole banding, and Hamming math are identical)."""
    if portable:
        hashes = F.transform(F.split(F.lower(F.trim(col)), r"\s+"),
                             lambda w: portable_hash60(w))
        n_bits = 60
    else:
        hashes = F.transform(F.split(F.lower(F.trim(col)), r"\s+"),
                             lambda w: F.xxhash64(w))
        n_bits = 64
    return simhash_from_hashes(hashes, n_bits)


def simhash_from_hashes(hashes, n_bits: int = 64):
    """SimHash bit votes over an (ideally STAGED) word-hash array —
    see :func:`minhash_sig_from_hashes` for the staging rationale."""
    sig = F.lit(0).cast("long")
    for b in range(n_bits):
        bit = F.when(_bit_vote(hashes, b) > 0,
                     F.shiftleft(F.lit(1).cast("long"), b)).otherwise(
                         F.lit(0).cast("long"))
        sig = sig.bitwiseOR(bit)
    return sig


def _popcount(col):
    """Hamming weight of a 64-bit long (native bit trick fold)."""
    x = col
    out = F.lit(0)
    for shift in range(0, 64, 8):
        byte = F.shiftright(x, shift).bitwiseAND(F.lit(255))
        # table-free popcount per byte via nibble sums
        n1 = byte.bitwiseAND(F.lit(0x55)) + F.shiftright(byte, 1).bitwiseAND(F.lit(0x55))
        n2 = n1.bitwiseAND(F.lit(0x33)) + F.shiftright(n1, 2).bitwiseAND(F.lit(0x33))
        n3 = n2.bitwiseAND(F.lit(0x0F)) + F.shiftright(n2, 4).bitwiseAND(F.lit(0x0F))
        out = out + n3
    return out


# ---------------------------------------------------------------------------
# connected components (pair lists -> cluster assignments -> survivors)
# ---------------------------------------------------------------------------

def connected_components(pairs: DataFrame, a: str = "a", b: str = "b",
                         max_iter: int = 25) -> DataFrame:
    """Cluster assignment ``(id, cluster_id)`` for every node in an
    undirected edge list, where ``cluster_id`` is the MINIMUM node id (in
    the key column's native ordering) of the connected component — the piece that turns near-dup PAIR lists (Jaccard /
    MinHash-LSH / SimHash / embedding-cosine) into a keep/drop decision.

    Algorithm: alternating large-star / small-star (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC 2014) — the
    standard shared-nothing CC algorithm:

    * **large-star**: every node connects its LARGER neighbors to the
      minimum of its neighborhood (incl. itself);
    * **small-star**: every node connects its smaller-or-equal neighbors
      (and itself) to that minimum.

    Each round is two groupBy/join shuffles keyed by node id; the edge set
    contracts toward a forest of stars rooted at component minima in
    O(log² n) rounds (2-4 in practice for near-dup graphs, whose components
    are small and dense). Per-round `localCheckpoint` truncates the lineage
    so the plan does not grow with iterations — without it the DAG doubles
    every round and the driver, not the data, becomes the bottleneck at
    10⁹ edges. Convergence is detected with a count + order-insensitive
    XOR-fold fingerprint of the edge set (order-insensitive and
    overflow-free under ANSI mode; one cheap aggregate per round, never a
    `collect()` of rows).

    At 100 TB this is a driver-side loop of Spark jobs over an edge table
    ~1000× smaller than the corpus (only near-dup pairs), so the iteration
    cost is marginal next to the candidate-generation join that produced
    the pairs. Reference analog: the reference validates rows one-by-one and
    has no dedup graph stage; this extends SURVEY §2's pipeline ops.
    """
    e = (
        pairs.select(F.col(a).alias("u"), F.col(b).alias("v"))
        .where(F.col("u") != F.col("v"))
        .select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    fp_prev = e.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.bit_xor(F.xxhash64("u", "v")), F.lit(0)).alias("h"),
    ).first()
    for _ in range(max_iter):
        # large-star: m(u) = min(N(u) ∪ {u}); emit (v, m(u)) for v > u
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = (sym.groupBy("u").agg(F.min("v").alias("mn"))
                .select("u", F.least("mn", F.col("u")).alias("m")))
        large = (
            sym.join(mins, on="u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        e1 = (large.where(F.col("u") != F.col("v")).distinct()
              .localCheckpoint(eager=True))
        # small-star over (hi=u, lo=v) edges: m(hi) = min(lo ∪ {hi});
        # emit (lo, m) for every lo, plus (hi, m)
        smins = (e1.groupBy("u").agg(F.min("v").alias("mn"))
                 .select("u", F.least("mn", F.col("u")).alias("m")))
        small = (
            e1.join(smins, on="u")
            .select(F.col("v").alias("n"), F.col("m"))
            .union(smins.select(F.col("u").alias("n"), F.col("m")))
        )
        e = (
            small.where(F.col("n") != F.col("m"))
            .select(F.greatest("n", "m").alias("u"), F.least("n", "m").alias("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        fp = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.bit_xor(F.xxhash64("u", "v")), F.lit(0)).alias("h"),
        ).first()
        if (fp["n"], fp["h"]) == (fp_prev["n"], fp_prev["h"]):
            break
        fp_prev = fp
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds")
    # fixed point = stars (node -> component min); roots appear only as v
    nodes = (pairs.select(F.col(a).alias("id"))
             .union(pairs.select(F.col(b).alias("id")))
             .distinct())
    return (
        nodes.join(e, nodes["id"] == e["u"], "left")
        .select("id", F.coalesce(F.col("v"), F.col("id")).alias("cluster_id"))
    )


def neardup_survivors(df: DataFrame, key: str, pairs: DataFrame,
                      a: str = "a", b: str = "b") -> DataFrame:
    """Annotate ``df`` with ``cluster_id`` + ``is_survivor`` from a near-dup
    pair list: one deterministic survivor (minimum key) per connected
    component; rows in no pair survive as their own singleton cluster.
    ``df.where("is_survivor")`` is the deduplicated corpus; the complement is
    the drop set. One broadcast-or-shuffle join against the (small) cluster
    table on top of :func:`connected_components`."""
    cc = connected_components(pairs, a, b)
    joined = df.join(
        cc.select(F.col("id").alias(key), "cluster_id"), on=key, how="left")
    return joined.withColumn(
        "cluster_id", F.coalesce(F.col("cluster_id"), F.col(key))
    ).withColumn("is_survivor", F.col("cluster_id") == F.col(key))


def simhash_pairs(df: DataFrame, key: str, text_col: str,
                  max_hamming: int = 3, portable: bool = False) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) ≤ max_hamming via the pigeonhole
    band join: with 4 chunks of 16 bits, any pair within distance 3 agrees
    exactly on ≥1 chunk → candidates = equi-join per chunk, then exact
    Hamming verify. Returns (a, b, hamming).

    ``max_hamming`` must be ≤ 3: the 4-chunk pigeonhole only GUARANTEES a
    shared chunk up to distance 3 — a larger bound would silently miss
    pairs whose differing bits spread across all four chunks (review
    find: previously accepted and under-reported)."""
    if not 0 <= int(max_hamming) <= 3:
        raise ValueError(
            f"max_hamming must be in [0, 3] (4x16-bit pigeonhole "
            f"guarantee), got {max_hamming}")
    # STAGED word-hash array (same CSE rationale as minhash_lsh_pairs):
    # the 60/64 per-bit vote aggregates reference one materialized column
    # instead of re-splitting and re-hashing the text per bit
    wh = (lambda w: portable_hash60(w)) if portable         else (lambda w: F.xxhash64(w))
    sigs = (df.select(
                F.col(key).alias("id"),
                F.transform(F.split(F.lower(F.trim(F.col(text_col))),
                                    r"\s+"), wh).alias("__wh"))
            .withColumn("sig", simhash_from_hashes(
                F.col("__wh"), n_bits=60 if portable else 64))
            .drop("__wh"))
    chunk_structs = [
        F.struct(
            F.lit(c).alias("chunk"),
            F.shiftright(F.col("sig"), c * 16).bitwiseAND(F.lit(0xFFFF)).alias("cv"),
        )
        for c in range(4)
    ]
    chunks = sigs.select(
        "id", "sig", F.explode(F.array(*chunk_structs)).alias("cc")
    ).select("id", "sig", "cc.chunk", "cc.cv")
    cand = (
        chunks.alias("x")
        .join(chunks.alias("y"), on=["chunk", "cv"])
        .where(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("a"), F.col("x.sig").alias("siga"),
                F.col("y.id").alias("b"), F.col("y.sig").alias("sigb"))
        .distinct()
    )
    return (
        cand.select(
            "a", "b",
            _popcount(F.col("siga").bitwiseXOR(F.col("sigb"))).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
    )


def neardup_violations(df: DataFrame, column: str, check_id: str,
                       key: str = "doc_id",
                       params: dict | None = None) -> DataFrame:
    """``x-nearDup`` engine adapter: near-duplicate membership as a
    first-class VALIDATION check — every non-survivor row becomes a
    violation (doc_id, check_id, observed="duplicate of <survivor>",
    expected), mirroring how ``x-unique`` reports exact duplicates.

    ``method`` selects the candidate generator, all three scale paths
    shared with the standalone operators (never all-pairs):

    * ``minhash``  — :func:`minhash_lsh_pairs` over a text column
      (threshold = Jaccard; numPerm/bands/n/seed knobs);
    * ``simhash``  — :func:`simhash_pairs` over a text column
      (maxHamming knob);
    * ``spans``    — :func:`duplicate_span_pairs` over a text column
      (substring-level: k/w/minShared/maxDocFreq knobs);
    * ``semantic`` — ``similarity.semantic_neardup_pairs`` over an
      embedding column (threshold = cosine; dim/nCells/nAssign/seed
      knobs, dim falling back to schema metadata).

    Survivors follow the engine's deterministic min-key rule
    (:func:`neardup_survivors`), so the violation set is exactly the rows
    ``semdedup``/dedup pipelines would drop."""
    p = params or {}
    method = p.get("method", "minhash")
    portable = bool(p.get("portable", False))
    if method == "jaccard":
        thr = float(p.get("threshold", 0.8))
        pairs = jaccard_pairs(
            df, key, column, n=int(p.get("n", 3)), threshold=thr,
            max_doc_freq=p.get("maxDocFreq"))
        expected = f"no near-duplicate (ngram-jaccard >= {thr})"
    elif method == "minhash":
        thr = float(p.get("threshold", 0.7))
        pairs = minhash_lsh_pairs(
            df, key, column, num_perm=int(p.get("numPerm", 64)),
            bands=int(p.get("bands", 16)), n=int(p.get("n", 3)),
            threshold=thr, seed=int(p.get("seed", 42)), portable=portable)
        expected = f"no near-duplicate (MinHash-LSH, jaccard >= {thr})"
    elif method == "simhash":
        mh = int(p.get("maxHamming", 3))
        pairs = simhash_pairs(df, key, column, max_hamming=mh,
                              portable=portable)
        expected = f"no near-duplicate (SimHash, hamming <= {mh})"
    elif method == "spans":
        ms = int(p.get("minShared", 1))
        pairs = duplicate_span_pairs(
            df, key, column, k=int(p.get("k", 8)), w=int(p.get("w", 8)),
            min_shared=ms, max_doc_freq=p.get("maxDocFreq"),
            portable=portable)
        expected = (f"no near-duplicate (winnowed spans, >= {ms} shared "
                    "fingerprints)")
    elif method == "semantic":
        from jsonschema_valid_spark.functions.similarity import (
            semantic_neardup_pairs,
        )

        thr = float(p.get("threshold", 0.45))
        pairs = semantic_neardup_pairs(
            df, key, column, dim=p.get("dim"), threshold=thr,
            n_cells=int(p.get("nCells", 16)),
            n_assign=int(p.get("nAssign", 1)),
            seed=int(p.get("seed", 11)),
            centroids=p.get("centroids"))
        expected = f"no near-duplicate (semantic clusters, cosine >= {thr})"
    else:
        raise ValueError(
            f"x-nearDup method must be 'jaccard', 'minhash', 'simhash', "
            f"'spans' or 'semantic', got {method!r}")
    marked = neardup_survivors(df, key, pairs.select("a", "b"))
    out = marked.where(~F.col("is_survivor")).select(
        F.col(key).cast("string").alias("doc_id"),
        F.lit(check_id).alias("check_id"),
        F.concat(F.lit("duplicate of "),
                 F.col("cluster_id").cast("string")).alias("observed"),
        F.lit(expected).alias("expected"),
    )
    idx = p.get("index")
    if idx is not None:
        # historical probe (operators/neardup_index.py): like
        # x-unique {"index"}, the keyword reports BOTH the batch-internal
        # near-dups above AND collisions against already-ingested history
        # — history is probed through its bucketed band/signature catalog,
        # never re-paired. indexThreshold defaults to the method threshold
        # (estimated Jaccard = signature agreement, E[est] = J).
        if method != "minhash":
            raise ValueError(
                "x-nearDup 'index' requires method='minhash' (the index "
                "stores MinHash band signatures)")
        ithr = float(p.get("indexThreshold", p.get("threshold", 0.7)))
        out = out.unionByName(idx.collision_violations(
            df, key, column, check_id, est_threshold=ithr))
    return out


# ---------------------------------------------------------------------------
# Substring-level exact dedup: winnowing fingerprints (Schleimer et al.,
# SIGMOD'03 — the MOSS algorithm) + cross-document duplicated-span pairs,
# the relational lift of suffix-array substring dedup (Lee et al. 2022,
# "Deduplicating Training Data Makes Language Models Better",
# arXiv:2107.06499): instead of a global suffix array (which needs the
# whole corpus in one address space), each document emits a bounded
# fingerprint set with the winnowing GUARANTEE — any substring of length
# >= w + k - 1 shared by two documents produces at least one shared
# (hash, window-min) fingerprint — and detection becomes a bucketed
# equi-join on the fingerprint hash. Never all-pairs, never a global sort.
# ---------------------------------------------------------------------------

def kgram_hashes(col, k: int = 8, portable: bool = False):
    """array<long> of the text's k-char-gram hashes (one per 1-based start
    position). STAGE THIS AS ITS OWN COLUMN before windowing over it:
    Catalyst re-evaluates invariant sub-expressions inside higher-order-
    function lambdas per element, so referencing this O(n) expression from
    an O(n)-window transform in the same projection costs O(n²) hashing
    per row (measured: sf0.01 documents went from minutes to seconds once
    staged)."""
    hfn = (lambda s: portable_hash60(s)) if portable else (
        lambda s: F.xxhash64(s))
    n_h = F.greatest(F.length(col) - (k - 1), F.lit(1))
    return F.transform(F.sequence(F.lit(1), n_h),
                       lambda i: hfn(F.substr(col, i, F.lit(k))))


def winnow_from_hashes(hl, w: int = 8):
    """array<struct<h: long, pos: int>> winnowing fingerprints from a
    STAGED k-gram hash array column (``hl`` should be a column reference,
    see :func:`kgram_hashes`): slide a w-hash window, keep each window's
    minimum with its 1-based gram position, distinct. Fingerprint density
    is ~2/(w+1) of the k-gram count (the winnowing bound), so the exploded
    index stays a small multiple of the corpus row count."""
    n_w = F.greatest(F.size(hl) - (w - 1), F.lit(1))

    def _fp(j):
        win = F.slice(hl, j, w)
        mn = F.array_min(win)
        return F.struct(
            mn.alias("h"),
            (j - 1 + F.array_position(win, mn)).cast("int").alias("pos"))

    return F.array_distinct(F.transform(F.sequence(F.lit(1), n_w), _fp))


def winnow_fingerprints(col, k: int = 8, w: int = 8,
                        portable: bool = False):
    """Convenience composition of :func:`kgram_hashes` +
    :func:`winnow_from_hashes` as ONE expression — fine for tests and
    small fixtures, but quadratic inside a single projection (see the
    staging note on kgram_hashes); pipelines should stage the hash array
    like :func:`duplicate_span_pairs` does."""
    return winnow_from_hashes(kgram_hashes(col, k, portable), w)


def duplicate_span_pairs(df: DataFrame, key: str, text_col: str,
                         k: int = 8, w: int = 8, min_shared: int = 1,
                         max_doc_freq: int | None = None,
                         portable: bool = False) -> DataFrame:
    """Cross-document duplicated-substring pairs: documents sharing
    ``min_shared`` or more distinct winnowed fingerprint hashes, each
    match VERIFIED by exact k-gram equality at the recorded positions
    (hash collisions cannot fabricate a span). Returns
    (a, b, shared, pos_a, pos_b) with a < b — shared = distinct verified
    hashes, pos_* = the earliest matching span's 1-based char offset.

    Guarantee (winnowing): every common substring of length >= w + k - 1
    yields at least one shared fingerprint, so min_shared=1 detects all
    such spans; raise min_shared (or lower w) to demand longer/denser
    overlap. ``max_doc_freq`` drops boilerplate fingerprints appearing in
    more than that many documents (broadcast anti-join — the same
    posting-list skew cap as :func:`jaccard_pairs`)."""
    staged = df.select(
        F.col(key).alias("id"),
        kgram_hashes(F.col(text_col), k, portable).alias("__hl"))
    fps = staged.select(
        "id",
        F.explode(winnow_from_hashes(F.col("__hl"), w)).alias("fp"),
    ).select("id", F.col("fp.h").alias("h"), F.col("fp.pos").alias("pos"))
    if max_doc_freq is not None:
        hot = (fps.select("id", "h").distinct()
               .groupBy("h").agg(F.count(F.lit(1)).alias("__df"))
               .where(F.col("__df") > max_doc_freq).select("h"))
        fps = fps.join(F.broadcast(hot), on="h", how="left_anti")
    # one witness per (a, b, h) BEFORE the text fetch: a hash occurring
    # m× in a and n× in b would otherwise join into m·n rows each dragging
    # both full texts; min(pos) on either side still addresses a k-gram
    # hashing to h, so the verify below is unaffected
    cand = (
        fps.alias("x").join(fps.alias("y"), on="h")
        .where(F.col("x.id") < F.col("y.id"))
        .groupBy(F.col("x.id").alias("a"), F.col("y.id").alias("b"), F.col("h"))
        .agg(F.min(F.col("x.pos")).alias("pos_a"),
             F.min(F.col("y.pos")).alias("pos_b"))
    )
    ta = df.select(F.col(key).alias("a"), F.col(text_col).alias("__ta"))
    tb = df.select(F.col(key).alias("b"), F.col(text_col).alias("__tb"))
    verified = (
        cand.join(ta, on="a").join(tb, on="b")
        .where(F.substr(F.col("__ta"), F.col("pos_a"), F.lit(k))
               == F.substr(F.col("__tb"), F.col("pos_b"), F.lit(k)))
    )
    # the reported span must be ONE verified match (review find:
    # independent min(pos_a)/min(pos_b) could combine offsets from two
    # different fingerprints — addresses that do not match each other);
    # lexicographic min over the encoded (pos_a, pos_b) pair keeps the
    # earliest verified span and replays as exact int64 math in DuckDB
    enc = F.col("pos_a") * F.lit(2_147_483_648) + F.col("pos_b")
    return (
        verified.groupBy("a", "b")
        .agg(F.countDistinct("h").alias("shared"),
             F.min(enc).alias("__enc"))
        .where(F.col("shared") >= min_shared)
        .select("a", "b", "shared",
                F.expr("__enc div 2147483648").alias("pos_a"),
                (F.col("__enc") % F.lit(2_147_483_648)).alias("pos_b"))
    )
