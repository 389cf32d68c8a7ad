"""Bloom-filter referential membership — the shuffle-free path for BIG
domains.

``x-referential``'s broadcast anti-join (referential.py) is right when the
domain is dimension-sized. When the domain itself is huge (10^8–10^9 keys
— a user registry, a crawl frontier), broadcasting it is impossible and a
shuffle join would move the 100 TB fact table. The classic answer is a
Bloom filter: one scan of the domain builds an m-bit array; the probe is a
pure per-row expression — ZERO shuffle of the fact side, no join at all.

Semantics (standard Bloom): a probe that MISSES is definitely absent from
the domain ⇒ every reported violation is real (no false alarms). A probe
that hits may be a false positive ⇒ a fraction ≈(1−e^{−kn/m})^k of true
violations goes unreported. With m/n = 10 bits per key and k = 5 that is
~0.9% — monitoring-grade referential checking, explicitly approximate
(the keyword mode is opt-in; exact mode stays the default).

Implementation notes:

* Hashes are ``portable_hash60`` with per-probe seed prefixes — the DuckDB
  oracle replays build AND probe bit-for-bit (even false positives agree,
  so the driver's value-hash check is deterministic).
* The bit array is built IN Spark: explode k probes per key → per-word
  ``bit_or`` aggregate (map-side combined) → one dense array<long> row via
  a sequence/transform over a word→mask map. The only driver transfer is
  the finished one-row filter when Spark broadcasts it to executors.
* ``m_bits`` is capped (default limit 2^27 = 16 MB of words) — above
  that, partition the domain and run one filter per key range; the cap
  raises instead of silently building a driver-crushing literal.
* The probe stays in whole-stage codegen: staged hash columns + SQL
  ``shiftleft``/``&`` bit tests (no Python, no UDF).
* Words pack 63 bits, not 64: a shift of 63 overflows DuckDB's checked
  ``<<`` (and flips Spark's sign bit) — capping the in-word bit index at
  62 keeps the build/probe math identical and overflow-free on both
  engines for ~1.6% extra space.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from jsonschema_valid_spark.functions.dedup import portable_hash60

MAX_M_BITS = 1 << 27


def _probe_hash(col, m_bits: int, seed: int, i: int):
    return F.pmod(
        portable_hash60(F.concat(F.lit(f"{seed}:{i}:"), col.cast("string"))),
        F.lit(m_bits),
    )


def bloom_build(domain: DataFrame, column: str, m_bits: int = 1 << 20,
                k: int = 5, seed: int = 7) -> DataFrame:
    """One-row DataFrame ``(m_bits, k, seed, words array<long>)`` encoding
    the domain's Bloom filter. One scan of the domain; the per-word
    ``bit_or`` aggregate shuffles only #set-words rows (≤ m/64)."""
    if not (64 <= m_bits <= MAX_M_BITS):
        raise ValueError(
            f"m_bits must be in [64, {MAX_M_BITS}] (got {m_bits}); for "
            "larger domains partition the keys and build one filter per range")
    if not (1 <= k <= 16):
        raise ValueError(f"k must be in [1, 16], got {k}")
    n_words = (m_bits + 62) // 63

    keys = domain.select(F.col(column).alias("__key")).where(
        F.col("__key").isNotNull()).distinct()
    probes = keys.select(
        F.explode(F.array(*[
            _probe_hash(F.col("__key"), m_bits, seed, i) for i in range(k)
        ])).alias("h"))
    words = probes.select(
        F.expr("h DIV 63").alias("word"),
        F.expr("shiftleft(1L, CAST(h % 63 AS INT))").alias("mask"),
    ).groupBy("word").agg(F.expr("bit_or(mask)").alias("mask"))
    return words.agg(
        F.map_from_entries(
            F.collect_list(F.struct("word", "mask"))).alias("__wm")
    ).select(
        F.lit(m_bits).alias("m_bits"),
        F.lit(k).alias("k"),
        F.lit(seed).alias("seed"),
        F.transform(
            F.sequence(F.lit(0), F.lit(n_words - 1)),
            lambda i: F.coalesce(F.try_element_at("__wm", i.cast("long")),
                                 F.lit(0).cast("long")),
        ).alias("words"),
    )


def with_bloom_membership(df: DataFrame, column: str, bloom: DataFrame,
                          out_col: str = "__in_bloom") -> DataFrame:
    """``df`` + boolean ``out_col``: all-k-bits-set membership probe.
    ``bloom`` is crossJoin-broadcast (one row); the probe is pure codegen.
    NULL values probe to NULL (callers treat NULL as not-checked, matching
    exact referential)."""
    params = bloom.select("m_bits", "k", "seed").first()
    m_bits, k, seed = int(params["m_bits"]), int(params["k"]), int(params["seed"])
    probed = df.crossJoin(F.broadcast(bloom.select("words")))
    c = F.col(column)
    staged = probed.withColumns({
        f"__h{i}": _probe_hash(c, m_bits, seed, i) for i in range(k)
    })
    bit_tests = [
        F.expr(
            f"(try_element_at(words, CAST(__h{i} DIV 63 AS INT) + 1) "
            f" & shiftleft(1L, CAST(__h{i} % 63 AS INT))) != 0"
        )
        for i in range(k)
    ]
    member = bit_tests[0]
    for t in bit_tests[1:]:
        member = member & t
    return (
        staged.withColumn(out_col, member)
        .drop("words", *[f"__h{i}" for i in range(k)])
    )


def bloom_non_members(df: DataFrame, column: str, domain: DataFrame,
                      domain_column: str | None = None,
                      m_bits: int = 1 << 20, k: int = 5,
                      seed: int = 7) -> DataFrame:
    """Rows of ``df`` whose non-NULL ``column`` definitely ∉ domain
    (Bloom-certain; misses ≈FPR of the true violations, reports no false
    ones). Build once, probe shuffle-free."""
    dcol = domain_column or domain.columns[0]
    bloom = bloom_build(domain.select(F.col(dcol).alias(column)),
                        column, m_bits=m_bits, k=k, seed=seed)
    probed = with_bloom_membership(
        df.where(F.col(column).isNotNull()), column, bloom)
    return probed.where(~F.col("__in_bloom")).drop("__in_bloom")


def oracle_bloom_sql(domain_select: str, probe_select: str, column: str,
                     m_bits: int = 1 << 20, k: int = 5, seed: int = 7) -> str:
    """DuckDB CTE replaying build + probe: ``bloom_miss`` holds the probe
    rows (all ``probe_select`` output columns) that MISS the filter.
    ``domain_select`` must yield one column named ``val``; ``probe_select``
    must yield the probed ``column`` among its outputs."""
    return f"""
__bloom_probe_ix AS (SELECT CAST(range AS INT) AS i FROM range(0, {k})),
__bloom_pos AS (
  SELECT CAST(('0x' || substr(md5(CAST({seed} AS VARCHAR) || ':' ||
               CAST(i AS VARCHAR) || ':' || CAST(val AS VARCHAR)), 1, 15))
              AS BIGINT) % {m_bits} AS h
  FROM (SELECT DISTINCT val FROM ({domain_select}) WHERE val IS NOT NULL)
  CROSS JOIN __bloom_probe_ix
),
__bloom_words AS (
  SELECT h // 63 AS word, bit_or(1::BIGINT << CAST(h % 63 AS INT)) AS mask
  FROM __bloom_pos GROUP BY 1
),
__bloom_rows AS MATERIALIZED (
  -- MATERIALIZED is load-bearing: this CTE is referenced twice
  -- (__bloom_probes and bloom_miss) and DuckDB inlines CTEs by
  -- default, so the bare row_number() OVER () would be evaluated
  -- independently per reference with nondeterministic row order —
  -- the __rid join-back then misattributes misses to the wrong rows
  SELECT p.*, row_number() OVER () AS __rid
  FROM ({probe_select}) p WHERE p.{column} IS NOT NULL
),
__bloom_probes AS (
  SELECT r.__rid, CAST(('0x' || substr(md5(CAST({seed} AS VARCHAR) || ':' ||
               CAST(i AS VARCHAR) || ':' || CAST(r.{column} AS VARCHAR)), 1, 15))
              AS BIGINT) % {m_bits} AS h
  FROM __bloom_rows r CROSS JOIN __bloom_probe_ix
),
__bloom_miss_ids AS (
  SELECT __rid FROM __bloom_probes pr
  LEFT JOIN __bloom_words w ON w.word = pr.h // 63
  GROUP BY __rid
  HAVING min(CASE WHEN coalesce(w.mask, 0)
                       & (1::BIGINT << CAST(pr.h % 63 AS INT)) != 0
             THEN 1 ELSE 0 END) = 0
),
bloom_miss AS (
  SELECT * EXCLUDE (__rid) FROM __bloom_rows
  WHERE __rid IN (SELECT __rid FROM __bloom_miss_ids)
)"""
