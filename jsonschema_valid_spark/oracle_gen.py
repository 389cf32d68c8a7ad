"""Generated DuckDB oracle SQL for the LSH / hashing query family.

The LSH constants (Gaussian hyperplanes, MinHash affine permutations) are
deterministic driver-side values — so the ENTIRE candidate-generation +
verify math is replayable in ANSI SQL by interpolating the same constants.
What xxhash64 keeps Spark-specific is only the string hash; the portable
md5-based ``portable_hash60`` (functions/dedup.py) closes that for the
oracle-mode queries (VERDICT r2 "Next round" item 1: oracle the math,
leave only hashing rows-only).

Every generator mirrors a Spark operator exactly:

* signatures: sign(dot(v, plane)) bits, identical plane constants (repr()
  round-trips doubles exactly in both engines);
* MinHash: min over (a·h + b) mod M31 with identical (a, b) pairs;
* SimHash: per-bit ±1 votes over portable 60-bit word hashes;
* fingerprint: rolling (Σ h·31^(i mod 8)) mod M61 via list_reduce.

Float-sum association differs between engines (fold vs vectorized sum), but
sign decisions sit at |dot| ≫ 1e-15 for random data, and all float OUTPUTS
are rounded to 6 digits on both sides before the driver's value-hash.
"""

from __future__ import annotations

from jsonschema_valid_spark.functions.dedup import MERSENNE31, _perm_params
from jsonschema_valid_spark.functions.similarity import _hyperplanes

MERSENNE61 = (1 << 61) - 1
HASH60 = "CAST(('0x' || substr(md5({s}), 1, 15)) AS BIGINT)"
POW31 = [31 ** k for k in range(8)]


def _dot_sql(vec: str, plane: list[float], dim: int) -> str:
    consts = ", ".join(repr(x) for x in plane)
    return (f"list_sum(list_transform(range(1, {dim + 1}), "
            f"j -> {vec}[j] * ([{consts}])[j]))")


def _sig_sql(vec: str, dim: int, bits: int, seed: int) -> str:
    """Signature expression ≡ functions/similarity.py lsh_signature."""
    terms = []
    for i, plane in enumerate(_hyperplanes(dim, bits, seed)):
        terms.append(f"(CASE WHEN {_dot_sql(vec, plane, dim)} > 0 "
                     f"THEN {1 << i} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"


def _cos_sql(a: str, b: str, dim: int) -> str:
    return (f"list_sum(list_transform(range(1, {dim + 1}), "
            f"j -> {a}[j] * {b}[j]))"
            f" / (sqrt(list_sum(list_transform({a}, t -> t * t)))"
            f" * sqrt(list_sum(list_transform({b}, t -> t * t))))")


def ann_lsh_topk_sql(dim: int = 64, bits: int = 8, seed: int = 7,
                     k: int = 10, query_vec_id: int = 0) -> str:
    """Oracle for lsh_topk: bucket-restricted exact-cosine top-k where the
    query is the embedding of ``query_vec_id`` (its signature computed with
    the SAME interpolated hyperplanes)."""
    sig = _sig_sql("v", dim, bits, seed)
    cos = _cos_sql("s.v", "q.qv", dim)
    return f"""
WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
s AS (SELECT vec_id, v, {sig} AS sig FROM e),
q AS (SELECT v AS qv, sig AS qsig FROM s WHERE vec_id = {query_vec_id})
SELECT s.vec_id AS vec_id, round({cos}, 6) AS cos
FROM s, q WHERE s.sig = q.qsig
ORDER BY {cos} DESC, s.vec_id LIMIT {k}
"""


def emb_neardup_lsh_sql(dim: int = 64, bits: int = 4, tables: int = 16,
                        seed: int = 7, threshold: float = 0.45) -> str:
    """Oracle for cosine_neardup_pairs: T independent hash tables (seeds
    seed..seed+T−1), candidate pairs share (table, signature), exact-cosine
    verify ≥ threshold."""
    keys = ", ".join(
        f"'{t}:' || CAST({_sig_sql('v', dim, bits, seed + t)} AS VARCHAR)"
        for t in range(tables))
    cos = _cos_sql("xa.v", "xb.v", dim)
    return f"""
WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
s AS (SELECT vec_id, unnest([{keys}]) AS k FROM e),
cand AS (SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
         FROM s x JOIN s y USING (k) WHERE x.vec_id < y.vec_id)
SELECT a, b, round({cos}, 6) AS cos
FROM cand JOIN e xa ON cand.a = xa.vec_id JOIN e xb ON cand.b = xb.vec_id
WHERE {cos} >= {threshold!r}
"""


def ivf_topk_sql(dim: int = 64, n_cells: int = 16, n_probe: int = 4,
                 seed: int = 11, k: int = 10, query_vec_id: int = 0) -> str:
    """Oracle for ivf_topk: identical seeded centroids interpolated into
    SQL; cell = argmax dot (1-based list_position of the max), the query's
    probe set = its n_probe largest centroid dots (threshold on the
    n_probe-th order statistic), exact cosine inside probed cells."""
    from jsonschema_valid_spark.functions.similarity import ivf_centroids

    cents = ivf_centroids(dim, n_cells, seed)
    dots = ", ".join(_dot_sql("v", c, dim) for c in cents)
    cos = _cos_sql("c.v", "q.qv", dim)
    return f"""
WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
s AS (SELECT vec_id, v, [{dots}] AS dl FROM e),
c AS (SELECT vec_id, v, list_position(dl, list_max(dl)) AS cell1 FROM s),
q AS (SELECT v AS qv, dl AS qdl,
             list_reverse_sort(dl)[{n_probe}] AS thr
      FROM s WHERE vec_id = {query_vec_id})
SELECT c.vec_id AS vec_id, round({cos}, 6) AS cos
FROM c, q WHERE q.qdl[c.cell1] >= q.thr
ORDER BY {cos} DESC, c.vec_id LIMIT {k}
"""


def minhash_lsh_sql(num_perm: int = 64, bands: int = 16, n: int = 2,
                    threshold: float = 0.5, seed: int = 42,
                    max_k: int = 200) -> str:
    """Oracle for minhash_lsh_pairs(portable=True): identical shingles,
    portable 60-bit shingle hash folded to 31 bits, identical affine
    permutations, band keys = comma-joined signature slices, exact-Jaccard
    verify over the distinct shingle sets."""
    assert num_perm % bands == 0
    r = num_perm // bands
    h = HASH60.format(s="s")
    perms = _perm_params(num_perm, seed)
    sig_exprs = ", ".join(
        f"list_min(list_transform(hs, h -> ({a} * h + {b}) % {MERSENNE31}))"
        for a, b in perms)
    band_keys = ", ".join(
        "'{b}:' || ".format(b=b)
        + " || ',' || ".join(f"CAST(sg[{b * r + i + 1}] AS VARCHAR)"
                             for i in range(r))
        for b in range(bands))
    jac = ("len(list_intersect(sa.shl, sb.shl)) * 1.0 / "
           "(len(sa.shl) + len(sb.shl) - len(list_intersect(sa.shl, sb.shl)))")
    return f"""
WITH w AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS wl
           FROM documents),
sh AS (SELECT doc_id, list_distinct(list_transform(range(1, len(wl)),
           i -> wl[i] || ' ' || wl[i+1])) AS shl FROM w),
h AS (SELECT doc_id, list_transform(shl, s -> {h} % {MERSENNE31}) AS hs FROM sh),
sig AS (SELECT doc_id, [{sig_exprs}] AS sg FROM h),
banded AS (SELECT doc_id, unnest([{band_keys}]) AS bk FROM sig),
cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
         FROM banded x JOIN banded y USING (bk) WHERE x.doc_id < y.doc_id)
SELECT a, b, round({jac}, 6) AS jaccard
FROM cand JOIN sh sa ON cand.a = sa.doc_id JOIN sh sb ON cand.b = sb.doc_id
WHERE {jac} >= {threshold!r}
"""


def neardup_index_sql(num_perm: int = 64, bands: int = 16,
                      threshold: float = 0.5, seed: int = 42) -> str:
    """Oracle for NearDupIndex.probe(portable=True) over the documents
    table split even/odd by doc_id (even = indexed history, odd = the
    probed batch): identical 2-word shingles, portable 60-bit shingle
    hash, seeded affine permutations, the index's band-qualified
    comma-joined band keys, and the signature-agreement Jaccard
    estimator (fraction of equal minhash positions)."""
    assert num_perm % bands == 0
    r = num_perm // bands
    h = HASH60.format(s="s")
    perms = _perm_params(num_perm, seed)
    sig_exprs = ", ".join(
        f"list_min(list_transform(hs, h -> ({a} * h + {b}) % {MERSENNE31}))"
        for a, b in perms)
    band_keys = ", ".join(
        "'{b},' || ".format(b=b)
        + " || ',' || ".join(f"CAST(sg[{b * r + i + 1}] AS VARCHAR)"
                             for i in range(r))
        for b in range(bands))
    est = (f"list_sum(list_transform(range(1, {num_perm + 1}), "
           f"i -> CASE WHEN sa.sg[i] = sb.sg[i] THEN 1 ELSE 0 END)) "
           f"/ {float(num_perm)!r}")
    return f"""
WITH w AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS wl
           FROM documents),
sh AS (SELECT doc_id, list_distinct(list_transform(range(1, len(wl)),
           i -> wl[i] || ' ' || wl[i+1])) AS shl FROM w),
h AS (SELECT doc_id, list_transform(shl, s -> {h} % {MERSENNE31}) AS hs FROM sh),
sig AS (SELECT doc_id, [{sig_exprs}] AS sg FROM h),
banded AS (SELECT doc_id, unnest([{band_keys}]) AS bk FROM sig),
cand AS (SELECT DISTINCT b.doc_id AS batch_id, hist.doc_id AS hist_id
         FROM banded b JOIN banded hist USING (bk)
         WHERE b.doc_id % 2 = 1 AND hist.doc_id % 2 = 0)
SELECT cand.batch_id, cand.hist_id, round({est}, 6) AS est
FROM cand JOIN sig sa ON cand.batch_id = sa.doc_id
          JOIN sig sb ON cand.hist_id = sb.doc_id
WHERE {est} >= {threshold!r}
"""


def simhash_sql(max_hamming: int = 3) -> str:
    """Oracle for simhash_pairs(portable=True): 60-bit portable SimHash
    (bits 60–63 always 0 in both engines), 4×16-bit pigeonhole chunk join,
    exact Hamming verify via bit_count(xor)."""
    h = HASH60.format(s="w")
    votes = " + ".join(
        f"(CASE WHEN list_sum(list_transform(hs, h -> "
        f"CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END)) > 0 "
        f"THEN {1 << b} ELSE 0 END)"
        for b in range(60))
    chunk_keys = ", ".join(
        f"'{c}:' || CAST((sig >> {c * 16}) & 65535 AS VARCHAR)"
        for c in range(4))
    return f"""
WITH w AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS wl
           FROM documents),
h AS (SELECT doc_id, list_transform(wl, w -> {h}) AS hs FROM w),
s AS (SELECT doc_id, ({votes}) AS sig FROM h),
chunks AS (SELECT doc_id, sig, unnest([{chunk_keys}]) AS ck FROM s),
cand AS (SELECT DISTINCT x.doc_id AS a, x.sig AS sa, y.doc_id AS b, y.sig AS sb
         FROM chunks x JOIN chunks y USING (ck) WHERE x.doc_id < y.doc_id)
SELECT a, b, CAST(bit_count(xor(sa, sb)) AS INTEGER) AS hamming
FROM cand WHERE bit_count(xor(sa, sb)) <= {max_hamming}
"""


def fingerprint_sql() -> str:
    """Oracle for fingerprint(portable=True): rolling
    (Σ (h mod 2^27)·31^(i mod 8)) mod M61 folded with list_reduce."""
    h = HASH60.format(s="wl[i]")
    pows = ", ".join(str(p) for p in POW31)
    term = (f"(({h} % {1 << 27}) * ([{pows}])[((i - 1) % 8) + 1])"
            f" % {MERSENNE61}")
    return f"""
WITH w AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS wl
           FROM documents)
SELECT doc_id, list_reduce(
    list_prepend(CAST(0 AS BIGINT),
                 list_transform(range(1, len(wl) + 1), i -> {term})),
    (acc, x) -> (acc + x) % {MERSENNE61}) AS fp
FROM w
"""


def pq_topk_sql(dim: int = 64, m: int = 8, n_codes: int = 16,
                seed: int = 13, k: int = 10, query_vec_id: int = 0) -> str:
    """Oracle for pq_topk: identical seeded codebooks interpolated into SQL;
    per-subspace code = argmin (|c|² − 2·c·x_j) via list_position(list_min),
    ADC score = Σ_j lut_j[code_j] with the lut computed from the query row's
    vector inside SQL. Sums run in the same sequential index order as the
    Spark expressions; argmin gaps are O(0.1) ≫ any association noise, and
    the score is rounded to 6dp on both sides (module docstring contract)."""
    from jsonschema_valid_spark.functions.similarity import pq_codebooks

    books = pq_codebooks(dim, m, n_codes, seed)
    d = dim // m

    def sub_dot(vec: str, cent: list[float], j: int) -> str:
        consts = ", ".join(repr(x) for x in cent)
        return (f"list_sum(list_transform(range(1, {d + 1}), "
                f"i -> {vec}[{j * d} + i] * ([{consts}])[i]))")

    code_cols = []
    for j, book in enumerate(books):
        dists = ", ".join(
            f"({sum(c * c for c in cent)!r} - 2.0 * {sub_dot('v', cent, j)})"
            for cent in book)
        code_cols.append(
            f"list_position([{dists}], list_min([{dists}])) AS c{j}")
    lut_terms = []
    for j, book in enumerate(books):
        luts = ", ".join(f"({sub_dot('q.qv', cent, j)})" for cent in book)
        lut_terms.append(f"([{luts}])[enc.c{j}]")
    adc = " + ".join(lut_terms)
    return f"""
WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
q AS (SELECT v AS qv FROM e WHERE vec_id = {query_vec_id}),
enc AS (SELECT vec_id, v, {', '.join(code_cols)} FROM e)
SELECT enc.vec_id AS vec_id, round({adc}, 6) AS adc
FROM enc, q
ORDER BY adc DESC, enc.vec_id LIMIT {k}
"""


def semdedup_pairs_sql(dim: int = 64, n_cells: int = 16, n_assign: int = 4,
                       seed: int = 11, threshold: float = 0.45) -> str:
    """Oracle for semantic_neardup_pairs (SemDeDup candidate+verify): the
    SAME seeded centroids interpolated as constants; soft assignment =
    every 1-based cell whose dot is ≥ the n_assign-th largest (tied cells
    kept, mirroring the Spark ``>= thr`` filter); candidates share ANY
    cell; exact-cosine verify ≥ threshold."""
    from jsonschema_valid_spark.functions.similarity import ivf_centroids

    cents = ivf_centroids(dim, n_cells, seed)
    dots = ", ".join(_dot_sql("v", c, dim) for c in cents)
    cos = _cos_sql("xa.v", "xb.v", dim)
    return f"""
WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
s AS (SELECT vec_id, v, [{dots}] AS dl FROM e),
x AS (SELECT vec_id,
             unnest(list_filter(range(1, {n_cells + 1}),
                    c -> dl[c] >= list_reverse_sort(dl)[{n_assign}])) AS cell
      FROM s),
cand AS (SELECT DISTINCT xx.vec_id AS a, xy.vec_id AS b
         FROM x xx JOIN x xy USING (cell) WHERE xx.vec_id < xy.vec_id)
SELECT a, b, round({cos}, 6) AS cos
FROM cand JOIN e xa ON cand.a = xa.vec_id JOIN e xb ON cand.b = xb.vec_id
WHERE {cos} >= {threshold!r}
"""


def embedding_drift_sql(dim: int = 64, n_cells: int = 16,
                        seed: int = 11) -> str:
    """Oracle for embedding-cell drift (operators/drift.py
    embedding_cell_histogram + PSI/chi2): the observed side
    deterministically negates every vec_id%3==0 vector (flipping its
    cell), the baseline is the unperturbed corpus, both assigned with the
    SAME interpolated seeded centroids; PSI and chi-square replayed with
    the engine's ε-smoothing."""
    from jsonschema_valid_spark.functions.similarity import ivf_centroids

    cents = ivf_centroids(dim, n_cells, seed)
    dots = ", ".join(_dot_sql("v", c, dim) for c in cents)
    return f"""
WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
p AS (SELECT vec_id, CASE WHEN vec_id % 3 = 0
                          THEN list_transform(v, x -> -x) ELSE v END AS v
      FROM e),
ob AS (SELECT list_position(dl, list_max(dl)) AS bucket,
              CAST(count(*) AS DOUBLE) AS c
       FROM (SELECT [{dots}] AS dl FROM p) GROUP BY 1),
bb AS (SELECT list_position(dl, list_max(dl)) AS bucket,
              CAST(count(*) AS DOUBLE) AS c
       FROM (SELECT [{dots}] AS dl FROM e) GROUP BY 1),
j AS (SELECT coalesce(ob.bucket, bb.bucket) AS bucket,
             coalesce(ob.c, 0) AS oc, coalesce(bb.c, 0) AS bc
      FROM ob FULL OUTER JOIN bb ON ob.bucket = bb.bucket),
t AS (SELECT sum(oc) AS so, sum(bc) AS sb FROM j)
SELECT
  (SELECT round(sum((oc / so - bc / sb)
        * ln((oc / so + 0.000000001) / (bc / sb + 0.000000001))), 6)
   FROM j CROSS JOIN t) AS psi,
  (SELECT round(sum((oc / so - bc / sb) * (oc / so - bc / sb)
        / (bc / sb + 0.000000001)), 6) FROM j CROSS JOIN t) AS chi2
"""


def semantic_contamination_sql(dim: int = 64, n_cells: int = 16,
                               n_assign: int = 4, seed: int = 11,
                               threshold: float = 0.9,
                               leak_mod: int = 41) -> str:
    """Oracle for semantic_contamination: the benchmark is a deterministic
    PERTURBED LEAK of every vec_id % leak_mod == 0 corpus row (every 8th
    coordinate scaled 1.2 -- a paraphrase stand-in at cosine ~0.995 to its
    source, far above any organic pair), the corpus is the full table;
    BOTH sides soft-assigned with the SAME interpolated seeded centroids;
    exact-cosine gate; per-doc max rollup with the (cos DESC, bench_id
    DESC) tie order matching Spark's max(struct(cos, bench_id)).
    DuckDB list lambdas index 1-based (Spark's transform is 0-based), so
    the perturbation mask is (i - 1) % 8 = 0 here and i % 8 = 0 there."""
    from jsonschema_valid_spark.functions.similarity import ivf_centroids

    cents = ivf_centroids(dim, n_cells, seed)
    dots = ", ".join(_dot_sql("v", c, dim) for c in cents)
    cos = _cos_sql("cv.v", "bv.v", dim)
    assign = (f"unnest(list_filter(range(1, {n_cells + 1}), "
              f"c -> dl[c] >= list_reverse_sort(dl)[{n_assign}]))")
    return f"""
WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
b AS (SELECT vec_id + 1000000 AS vec_id,
             list_transform(v, (x, i) -> x * (CASE WHEN (i - 1) % 8 = 0
                                              THEN 1.2 ELSE 1.0 END)) AS v
      FROM e WHERE vec_id % {leak_mod} = 0),
xc AS (SELECT vec_id, {assign} AS cell
       FROM (SELECT vec_id, [{dots}] AS dl FROM e)),
xb AS (SELECT vec_id, {assign} AS cell
       FROM (SELECT vec_id, [{dots}] AS dl FROM b)),
hits AS (SELECT DISTINCT xc.vec_id AS doc, xb.vec_id AS bench_id
         FROM xc JOIN xb USING (cell)),
scored AS (SELECT doc, bench_id, {cos} AS cos
           FROM hits JOIN e cv ON hits.doc = cv.vec_id
                     JOIN b bv ON hits.bench_id = bv.vec_id
           WHERE {cos} >= {threshold!r})
SELECT doc AS vec_id, bench_id, round(cos, 6) AS cos FROM (
  SELECT doc, bench_id, cos,
         row_number() OVER (PARTITION BY doc
                            ORDER BY cos DESC, bench_id DESC) AS rn
  FROM scored)
WHERE rn = 1
"""


def fuzzy_contamination_sql(num_perm: int = 64, bands: int = 16,
                            threshold: float = 0.8, seed: int = 42,
                            leak_mod: int = 43) -> str:
    """Oracle for fuzzy_contamination(portable=True, n=2): the benchmark
    is a deterministic LIGHTLY-EDITED leak of every doc_id % leak_mod == 0
    document (first word dropped — shingle Jaccard ~0.95 to its source,
    far above organic cross-doc overlap at the 0.8 gate); identical
    portable shingle hash, permutations and band keys on BOTH sides;
    exact-Jaccard verify; per-doc max rollup ordered (jaccard DESC,
    bench_id DESC) to match Spark's max(struct)."""
    assert num_perm % bands == 0
    r = num_perm // bands
    h = HASH60.format(s="s")
    perms = _perm_params(num_perm, seed)
    sig_exprs = ", ".join(
        f"list_min(list_transform(hs, h -> ({a} * h + {b}) % {MERSENNE31}))"
        for a, b in perms)
    band_keys = ", ".join(
        "'{b}:' || ".format(b=b)
        + " || ',' || ".join(f"CAST(sg[{b * r + i + 1}] AS VARCHAR)"
                             for i in range(r))
        for b in range(bands))
    jac = ("len(list_intersect(sa.shl, sb.shl)) * 1.0 / "
           "(len(sa.shl) + len(sb.shl) - len(list_intersect(sa.shl, sb.shl)))")

    def pipeline(src, idcol):
        return f"""
w_{idcol} AS (SELECT {idcol}, regexp_split_to_array(lower(trim(text)), '\\s+') AS wl
              FROM {src}),
sh_{idcol} AS (SELECT {idcol}, list_distinct(list_transform(range(1, len(wl)),
                   i -> wl[i] || ' ' || wl[i+1])) AS shl FROM w_{idcol}),
hh_{idcol} AS (SELECT {idcol}, list_transform(shl, s -> {h} % {MERSENNE31}) AS hs
               FROM sh_{idcol}),
sig_{idcol} AS (SELECT {idcol}, [{sig_exprs}] AS sg FROM hh_{idcol}),
banded_{idcol} AS (SELECT {idcol}, unnest([{band_keys}]) AS bk FROM sig_{idcol})"""

    return f"""
WITH bench AS (SELECT doc_id + 1000000 AS bench_id,
                      substr(text, strpos(text, ' ') + 1) AS text
               FROM documents WHERE doc_id % {leak_mod} = 0),
corpus AS (SELECT doc_id, text FROM documents),
{pipeline('corpus', 'doc_id')},
{pipeline('bench', 'bench_id')},
cand AS (SELECT DISTINCT x.doc_id AS doc, y.bench_id
         FROM banded_doc_id x JOIN banded_bench_id y USING (bk)),
scored AS (SELECT doc, cand.bench_id AS bench_id, {jac} AS jaccard
           FROM cand JOIN sh_doc_id sa ON cand.doc = sa.doc_id
                     JOIN sh_bench_id sb ON cand.bench_id = sb.bench_id
           WHERE {jac} >= {threshold!r})
SELECT doc AS doc_id, bench_id, round(jaccard, 6) AS jaccard FROM (
  SELECT doc, bench_id, jaccard,
         row_number() OVER (PARTITION BY doc
                            ORDER BY jaccard DESC, bench_id DESC) AS rn
  FROM scored)
WHERE rn = 1
"""
