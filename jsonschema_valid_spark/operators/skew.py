"""Key-skew diagnosis — the pre-flight check before any keyed shuffle.

Every join/groupBy shuffles on its key; one hot key turns a 1000-executor
stage into a single straggler task. The engine's mitigations (salted
two-phase aggregation in ``uniqueness.py``, the document-frequency cap in
``dedup.jaccard_pairs``, AQE skew-join at deploy) all need to know WHICH
keys are hot and HOW hot — this module is that measurement:

* :func:`heavy_keys` — exact top-N keys by row count (one partial+final
  count aggregate, then TakeOrderedAndProject: never a full sort);
* :func:`skew_summary` — one-row distribution profile (distinct keys,
  max/mean per-key count, approx p50/p99, and max/mean — the skew factor
  that decides salting).

Both are single aggregation passes; the heavy-key list is driver-sized by
construction (top-N).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def heavy_keys(df: DataFrame, key: str, top: int = 10) -> DataFrame:
    """Exact top-``top`` keys by row count, ties broken on the key —
    deterministic, SQL-replayable, and the direct input to a salting or
    broadcast-exclusion decision."""
    return (
        df.groupBy(key).agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.col(key))
        .limit(top)
    )


def skew_summary(df: DataFrame, key: str) -> DataFrame:
    """One-row per-key-count profile: n_keys, max/mean count, approx
    p50/p99, and skew_factor = max/mean (≫1 ⇒ salt or AQE-split the
    shuffle). Two aggregation passes (per-key counts → profile), both with
    map-side partial aggregation."""
    counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("cnt"))
    return counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.max("cnt").alias("max_cnt"),
        F.round(F.avg("cnt"), 6).alias("mean_cnt"),
        F.percentile_approx("cnt", 0.5, 10000).alias("p50_cnt"),
        F.percentile_approx("cnt", 0.99, 10000).alias("p99_cnt"),
        F.round(F.max("cnt") / F.avg("cnt"), 6).alias("skew_factor"),
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Hot-key-safe equi-join: left rows scatter across ``salt``
    sub-keys (deterministic hash of the whole row), right rows
    REPLICATE ``salt`` times, and the join runs on (key…, salt) — a hot
    key's rows land on ``salt`` reducers instead of one.

    The mitigation for what :func:`heavy_keys` diagnoses, for the
    regime AQE's skew-join split doesn't cover (it only splits
    oversized partitions of sort-merge joins after materialization;
    salting rebalances the hash join itself and works on any join
    type).  Cost model: the right side is scanned/shuffled ``salt``
    times over — use when the LEFT is huge with hot keys and the right
    is modest (too big to broadcast, small enough to replicate);
    never salt a broadcastable right (broadcast is strictly better).

    ``how`` supports inner/left — the salt assignment is a partition of
    left rows, so per-left-row match semantics are EXACTLY the plain
    join's (result-set equality is the oracle).  Right-outer/full are
    refused: unmatched RIGHT rows would appear once per salt replica.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner'|'left' "
                         "(right/full would duplicate unmatched right "
                         "rows per replica)")
    salt = int(salt)
    if salt < 2:
        raise ValueError("salt must be >= 2")
    lsalt = F.pmod(
        F.xxhash64(F.struct(*[F.col(c) for c in left.columns])),
        F.lit(salt)).cast("int")
    l2 = left.withColumn("__salt", lsalt).alias("__sl")
    r2 = (right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
        .alias("__sr"))
    # plain equality (NOT null-safe): NULL keys never match, exactly
    # like the unsalted join this must be result-equal to
    cond = [F.col(f"__sl.{k}") == F.col(f"__sr.{k}") for k in keys]
    cond.append(F.col("__sl.__salt") == F.col("__sr.__salt"))
    out = l2.join(r2, _conj(cond), how)
    cols = [F.col(f"__sl.{c}") for c in left.columns]
    cols += [F.col(f"__sr.{c}").alias(f"r_{c}" if c in left.columns
                                      else c)
             for c in right.columns if c not in keys]
    return out.select(*cols)


def _conj(conds):
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out
