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
