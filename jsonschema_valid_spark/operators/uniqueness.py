"""Cross-row uniqueness — the table-scope lift of ``uniqueItems``
(``/root/reference/src/validators.rs:582-595`` + ``unique.rs``).

The reference inserts type-tagged hashes into an in-memory set
(``unique.rs:61-65``) — fine for one array, impossible for 10^12 rows. At
scale, ``groupBy(key).count()`` is a full shuffle on the key, and a hot key
(the same doc_id duplicated millions of times) funnels into one reducer.

Strategy (SURVEY.md §2.1 #18): **two-phase salted hash aggregate** —

    phase 1:  groupBy(key, salt = pmod(xxhash64(key, RAND_COL), S)).count()
              — wait: salting a *count* by key needs a second independent
              column; for pure duplicate-detection the salt must split rows
              of the SAME key, so we salt by a row-local value
              (monotonically_increasing_id % S).
    phase 2:  groupBy(key).sum(partial_count) — now at most S rows per key
              reach the final reducer.

With AQE on, Spark 3.2+ can also split skewed partitions automatically, but
the two-phase shape guarantees bounded reducer fan-in regardless of AQE
heuristics — at 10^12 rows we don't gamble on heuristics.

Map-side combine in phase 1 means the shuffle carries at most
(#distinct keys × S) rows per map task, not raw rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

DEFAULT_SALT_BUCKETS = 64


def duplicate_keys(df: DataFrame, key, salt_buckets: int = DEFAULT_SALT_BUCKETS) -> DataFrame:
    """Return ``(key..., dup_count)`` for every key (single column or
    composite list) appearing more than once. NULL keys are ignored
    (absence is `required`'s business, not uniqueness's)."""
    keys = [key] if isinstance(key, str) else list(key)
    cond = F.lit(True)
    for k in keys:
        cond = cond & F.col(k).isNotNull()
    # r6 note: a partition-constant salt (spark_partition_id() % S) was
    # prototyped — it maximizes map-side combining for hot keys while
    # keeping the <= S phase-2 fan-in — but measured ~25% SLOWER than the
    # row-local salt on the unique-key regime (alternating A/B, 6 reps
    # each, same session), so the original salt stays. Output is
    # salt-invariant either way (per-key sum of partials).
    phase1 = (
        df.select(*[F.col(k) for k in keys])
        .where(cond)
        .groupBy(
            *[F.col(k) for k in keys],
            (F.pmod(F.monotonically_increasing_id(), F.lit(salt_buckets))).alias("__salt"),
        )
        .agg(F.count(F.lit(1)).alias("__partial"))
    )
    return (
        phase1.groupBy(*keys)
        .agg(F.sum("__partial").alias("dup_count"))
        .where(F.col("dup_count") > 1)
    )


def approx_unique_verdict(df: DataFrame, key: str, rsd: float = 0.01) -> DataFrame:
    """HLL++ pre-filter for the boolean uniqueness verdict at 10^12 rows
    (SURVEY.md §7 'hard parts'): ONE aggregation pass, NO shuffle of keys
    (approx_count_distinct's sketch merges map-side).

    Decision semantics with relative error ε=rsd:
      count − approx > ε·count  ⇒  definitely duplicates (skip nothing,
                                   report fail cheaply)
      otherwise                 ⇒  inconclusive: the exact salted two-phase
                                   pass is still required to PROVE uniqueness
    Returns 1 row: (n_rows, approx_distinct, definitely_dups boolean)."""
    agg = df.where(F.col(key).isNotNull()).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.approx_count_distinct(key, rsd).alias("approx_distinct"),
    )
    return agg.select(
        "n_rows", "approx_distinct",
        ((F.col("n_rows") - F.col("approx_distinct"))
         > F.col("n_rows") * rsd).alias("definitely_dups"),
    )


def uniqueness_violations(df: DataFrame, key, check_id: str,
                          salt_buckets: int = DEFAULT_SALT_BUCKETS) -> DataFrame:
    """Violations DF ``(doc_id, check_id, observed, expected)`` — one row per
    duplicated key value (the reference reports the offending value once,
    validators.rs:589-592). Composite keys render slash-joined."""
    keys = [key] if isinstance(key, str) else list(key)
    dups = duplicate_keys(df, keys, salt_buckets)
    label = (F.col(keys[0]).cast("string") if len(keys) == 1
             else F.concat_ws("/", *[F.col(k).cast("string") for k in keys]))
    return dups.select(
        label.alias("doc_id"),
        F.lit(check_id).alias("check_id"),
        F.concat(F.lit("count="), F.col("dup_count").cast("string")).alias("observed"),
        F.lit("unique").alias("expected"),
    )


def recent_duplicate_violations(
    df: DataFrame,
    column: str,
    check_id: str,
    key: str,
    ts: str,
    within_seconds: float,
    by: str | None = None,
) -> DataFrame:
    """``x-unique {"withinSeconds": W}``: TIME-SCOPED uniqueness — the
    same value may recur, but not within ``W`` seconds of its previous
    occurrence ("the same doc_id posted twice in an hour is a replay /
    double-fire; next week it's a legitimate update").  Global
    uniqueness is the W=∞ limit; this is the form event feeds actually
    need, and it is exact over ARBITRARY horizons — unlike bucketed
    dedup (floor(ts/W) grouping misses pairs straddling a boundary) or
    streaming dropDuplicatesWithinWatermark (bounded by the watermark).

    Implementation: one window per VALUE — partitionBy(column) orderBy
    (ts, key), ``lag`` of the previous occurrence's epoch-micros; a gap
    <= W (exact integer micros, strictly-greater passes at the boundary
    like sessionize) is a violation naming the LATER row.  One Exchange
    on the value column — the same shuffle exact dedup pays, never a
    self-join.  NULL values and NULL timestamps drop out (required/
    x-nullRate police those).  ``by`` additionally scopes recurrence to
    a group (same user re-posting vs anyone re-posting).
    """
    w_us = int(round(float(within_seconds) * 1_000_000))
    if w_us <= 0:
        raise ValueError("withinSeconds must be positive")
    m = F.unix_micros(F.col(ts).cast("timestamp"))
    part = [F.col(column)] + ([F.col(by)] if by else [])
    win = Window.partitionBy(*part).orderBy(m, F.col(key))
    ok_row = F.col(column).isNotNull() & m.isNotNull()
    prev = F.lag(F.when(ok_row, m)).over(win)
    gap = m - prev
    bad = ok_row & prev.isNotNull() & (gap <= F.lit(w_us))
    scope = f" per {by}" if by else ""
    exp_msg = (f"{column} must not recur within {within_seconds:g}s"
               f"{scope}")
    return (
        df.select(
            F.col(key).alias("__key"),
            F.col(column).alias("__val"),
            gap.alias("__gap"),
            bad.alias("__bad"),
        )
        .where(F.col("__bad"))
        .select(
            F.col("__key").cast("string").alias("doc_id"),
            F.lit(check_id).alias("check_id"),
            F.concat(
                F.lit("value="),
                F.col("__val").cast("string"),
                F.lit(",gap_us="),
                F.col("__gap").cast("string"),
            ).alias("observed"),
            F.lit(exp_msg).alias("expected"),
        )
    )
