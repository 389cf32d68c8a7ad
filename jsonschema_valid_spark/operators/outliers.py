"""Statistical outlier validation: values far from their group's mean in
stddev units (``x-outlier``).

The data-aware lift of ``minimum``/``maximum`` (validators.rs literal
numeric bounds): the bound is LEARNED from the data itself — "no reading
may sit more than k sigma from its sensor's mean" — so one global literal
bound (which must be loose enough for the widest group) is replaced by a
per-group envelope. Complements ``x-stats`` (which bounds the group
AGGREGATES; this flags the individual ROWS that stray).

Scale contract (10^12 rows): two passes, NEITHER shuffling row data —
pass 1 is a map-side-combined (mean, stddev, count) aggregate whose output
is #groups rows; pass 2 broadcasts those stats back onto the fact scan as
a BroadcastHashJoin + codegen filter. The fact side is never
hash-partitioned (plan-asserted: no Exchange below the join on the fact
branch) — strictly cheaper than the window formulation, which would
shuffle every row on the group key. Groups must therefore be broadcast-
sized (#groups ≤ ~10^7): that is the natural regime for "per sensor /
per source / per shard" envelopes. NULL group values join null-safely
(their own envelope).

Statistical honesty: stddev is the SAMPLE stddev of a group including the
candidate outlier itself (masking: one extreme value inflates its own
group's sigma). ``min_count`` suppresses verdicts on groups too small for
the envelope to mean anything (default 2 — a 1-row group has no sample
stddev at all); zero-variance groups never violate (any deviation from a
constant column is caught by `const`/`enum`, not z-scores).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def outlier_violations(
    df: DataFrame,
    column: str,
    check_id: str,
    key: str,
    by: str | None = None,
    max_z: float = 3.0,
    min_count: int = 2,
    method: str = "zscore",
    iqr_k: float = 1.5,
) -> DataFrame:
    """``x-outlier`` execution: rows whose ``column`` value deviates from
    their ``by``-group center by more than ``max_z`` spread units, as
    engine violation rows (doc_id, check_id, observed, expected).

    ``method="zscore"`` (default): |value − mean| / sample-stddev.
    ``method="mad"``: the MODIFIED z-score 0.6745·(value − median)/MAD
    (Iglewicz & Hoaglin) — robust to the masking failure of zscore,
    where one extreme value inflates its own group's sigma enough to
    hide itself; median/MAD have a 50% breakdown point, so even a
    heavily polluted group keeps a sane envelope (conventional
    threshold: maxZ=3.5). MAD mode costs a second aggregation pass
    (median must exist before deviations can), and its exact
    ``percentile`` buffers scale with distinct values per group — on
    continuous doubles at 10^12 rows prefer zscore or pre-bucketed
    values; for broadcast-sized group counts both modes keep the FACT
    side unshuffled.

    ``by=None`` computes ONE global envelope (single-row aggregate,
    broadcast cross join). observed = ``v=<decimal(20,4)>,z=<decimal(10,
    2)>`` — decimal renderings so the witness strings are cross-engine
    stable regardless of double formatting.
    """
    if method not in ("zscore", "mad", "iqr"):
        raise ValueError(
            f"method must be 'zscore', 'mad' or 'iqr', got {method!r}")
    max_z = float(max_z)
    min_count = int(min_count)
    if method == "mad":
        return _mad_violations(df, column, check_id, key, by, max_z,
                               min_count)
    if method == "iqr":
        return _iqr_violations(df, column, check_id, key, by,
                               float(iqr_k), min_count)
    val = F.col(column).cast("double")
    if by is not None:
        stats = df.groupBy(F.col(by).alias("__grp")).agg(
            F.avg(val).alias("__mu"),
            F.stddev_samp(val).alias("__sigma"),
            F.count(val).alias("__n"),
        )
        joined = df.join(F.broadcast(stats),
                         F.col(by).eqNullSafe(F.col("__grp")))
    else:
        stats = df.agg(
            F.avg(val).alias("__mu"),
            F.stddev_samp(val).alias("__sigma"),
            F.count(val).alias("__n"),
        )
        joined = df.crossJoin(F.broadcast(stats))
    z = (val - F.col("__mu")) / F.col("__sigma")
    bad = (
        val.isNotNull()
        & F.col("__sigma").isNotNull()
        & (F.col("__sigma") > 0)
        & (F.col("__n") >= min_count)
        & (F.abs(z) > max_z)
    )
    scope = f" per {by}" if by else ""
    exp_msg = (f"abs(({column} - mean) / stddev) <= {max_z}{scope} "
               f"(min_count={min_count})")
    return (
        joined.where(bad)
        .select(
            F.col(key).cast("string").alias("doc_id"),
            F.lit(check_id).alias("check_id"),
            F.concat(
                F.lit("v="),
                val.cast("decimal(20,4)").cast("string"),
                F.lit(",z="),
                F.round(z, 2).cast("decimal(10,2)").cast("string"),
            ).alias("observed"),
            F.lit(exp_msg).alias("expected"),
        )
    )


def _mad_violations(df, column, check_id, key, by, max_z, min_count):
    """MAD-mode x-outlier: 0.6745·(v − median) / median(|v − median|).

    Three-step plan, fact rows never hash-partitioned on the final
    branch: (1) per-group exact median (one aggregate, #groups rows);
    (2) per-group MAD — fact scan joined to the broadcast medians, then
    aggregated on |v − med| (the one pass whose partial percentile
    buffers carry value sketches; column-pruned to (group, deviation));
    (3) medians ⋈ MADs (#groups × #groups, tiny) broadcast back onto the
    fact scan as a codegen filter."""
    val = F.col(column).cast("double")
    if by is not None:
        med = df.groupBy(F.col(by).alias("__grp0")).agg(
            F.percentile(val, F.lit(0.5)).alias("__med0"),
            F.count(val).alias("__n0"),
        )
        dev = df.join(F.broadcast(med),
                      F.col(by).eqNullSafe(F.col("__grp0")))
        # __med0/__n0 are constant within a group: carrying them with
        # first() folds medians + MADs into ONE stats relation — no
        # med⋈mad join, and the median aggregate runs once, not twice
        stats = dev.groupBy(F.col("__grp0").alias("__grp")).agg(
            F.percentile(F.abs(val - F.col("__med0")),
                         F.lit(0.5)).alias("__mad"),
            F.first("__med0").alias("__med"),
            F.first("__n0").alias("__n"),
        )
        joined = df.join(F.broadcast(stats),
                         F.col(by).eqNullSafe(F.col("__grp")))
    else:
        med = df.agg(
            F.percentile(val, F.lit(0.5)).alias("__med0"),
            F.count(val).alias("__n0"),
        )
        stats = (df.crossJoin(F.broadcast(med))
                 .agg(F.percentile(F.abs(val - F.col("__med0")),
                                   F.lit(0.5)).alias("__mad"),
                      F.first("__med0").alias("__med"),
                      F.first("__n0").alias("__n")))
        joined = df.crossJoin(F.broadcast(stats))
    rz = F.lit(0.6745) * (val - F.col("__med")) / F.col("__mad")
    bad = (
        val.isNotNull()
        & F.col("__mad").isNotNull()
        & (F.col("__mad") > 0)
        & (F.col("__n") >= min_count)
        & (F.abs(rz) > max_z)
    )
    scope = f" per {by}" if by else ""
    exp_msg = (f"abs(0.6745*({column} - median) / mad) <= {max_z}{scope} "
               f"(min_count={min_count})")
    return (
        joined.where(bad)
        .select(
            F.col(key).cast("string").alias("doc_id"),
            F.lit(check_id).alias("check_id"),
            F.concat(
                F.lit("v="),
                val.cast("decimal(20,4)").cast("string"),
                F.lit(",z="),
                F.round(rz, 2).cast("decimal(10,2)").cast("string"),
            ).alias("observed"),
            F.lit(exp_msg).alias("expected"),
        )
    )


def _iqr_violations(df, column, check_id, key, by, iqr_k, min_count):
    """IQR-fence mode x-outlier (Tukey): violation when the value falls
    outside [q1 − k·IQR, q3 + k·IQR] (k=1.5 conventional, 3.0 "far
    out").  The box-plot envelope: like MAD it ignores tail pollution
    (quartiles have a 25% breakdown point), unlike z/MAD it is
    ASYMMETRIC — a skewed group gets a skewed fence instead of a
    centered band, which is usually what "this latency is abnormally
    high" means.

    One exact-percentile aggregate (q1, q3, n in a single pass — cheaper
    than MAD's two) broadcast back onto the fact scan as a codegen
    filter; fact rows never hash-partitioned.  Exact ``percentile`` ==
    DuckDB ``quantile_cont`` (both linear-interpolate), so the fences
    replay in the oracle; the distinct-values buffer caveat from MAD
    mode applies equally.  Zero-IQR groups never violate (constant
    middle — `const`/`enum` territory), matching the zero-variance rule
    of the other modes.
    """
    val = F.col(column).cast("double")
    aggs = [
        F.percentile(val, F.lit(0.25)).alias("__q1"),
        F.percentile(val, F.lit(0.75)).alias("__q3"),
        F.count(val).alias("__n"),
    ]
    if by is not None:
        stats = df.groupBy(F.col(by).alias("__grp")).agg(*aggs)
        joined = df.join(F.broadcast(stats),
                         F.col(by).eqNullSafe(F.col("__grp")))
    else:
        stats = df.agg(*aggs)
        joined = df.crossJoin(F.broadcast(stats))
    iqr = F.col("__q3") - F.col("__q1")
    lo = F.col("__q1") - F.lit(iqr_k) * iqr
    hi = F.col("__q3") + F.lit(iqr_k) * iqr
    bad = (
        val.isNotNull()
        & iqr.isNotNull()
        & (iqr > 0)
        & (F.col("__n") >= min_count)
        & ((val < lo) | (val > hi))
    )
    scope = f" per {by}" if by else ""
    exp_msg = (f"{column} within [q1-{iqr_k:g}*iqr, q3+{iqr_k:g}*iqr]"
               f"{scope} (min_count={min_count})")
    return (
        joined.where(bad)
        .select(
            F.col(key).cast("string").alias("doc_id"),
            F.lit(check_id).alias("check_id"),
            F.concat(
                F.lit("v="),
                val.cast("decimal(20,4)").cast("string"),
                F.lit(",lo="),
                F.round(lo, 4).cast("decimal(20,4)").cast("string"),
                F.lit(",hi="),
                F.round(hi, 4).cast("decimal(20,4)").cast("string"),
            ).alias("observed"),
            F.lit(exp_msg).alias("expected"),
        )
    )
